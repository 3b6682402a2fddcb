package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.schema.{Space, SpaceCatalog}
import graft.streaming.StreamingUpsert

class StreamingUpsertSpec extends SparkSpec {
  import spark.implicits._

  test("micro-batches MERGE into the bucketed space; last write wins") {
    val root = Files.createTempDirectory("stream_upsert").toString
    val cat = new SpaceCatalog(spark, root)
    cat.createDb("db1")
    cat.createSpace("db1", Space.fromJson(
      """{"name":"live","fields":[{"name":"n","type":"long"}]}"""))

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val src = mem.toDF().toDF("_id", "n")
    val q = StreamingUpsert.start(src, cat, "db1", "live",
      partitionNum = 4, checkpointPath = s"$root/ckpt", intervalMs = 50L)
    try {
      mem.addData(("a", 1L), ("b", 2L))
      q.processAllAvailable()
      assert(cat.docCount("db1", "live") == 2)

      // second batch: update a, insert c — b untouched
      mem.addData(("a", 10L), ("c", 3L))
      q.processAllAvailable()
      val rows = cat.read("db1", "live").orderBy("_id")
        .as[(String, Long)].collect().toSeq
      assert(rows == Seq(("a", 10L), ("b", 2L), ("c", 3L)))
    } finally q.stop()
  }
}
