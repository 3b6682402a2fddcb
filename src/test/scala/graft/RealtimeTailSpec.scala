package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.RealtimeTail

class RealtimeTailSpec extends SparkSpec {
  import spark.implicits._

  test("stream ingest → unified snapshot → compact folds tail into base") {
    val tmp = Files.createTempDirectory("rtail").toString
    val basePath = s"$tmp/base"; val tailPath = s"$tmp/tail"; val ckpt = s"$tmp/ckpt"

    // seed the base (the "indexed" table)
    Seq((1L, "v1"), (2L, "v2")).toDF("_id", "v").write.parquet(basePath)
    val schema = spark.read.parquet(basePath).schema

    val tail = new RealtimeTail(spark, basePath, tailPath, ckpt, "_id")

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = tail.startIngest(mem.toDF().toDF("_id", "v"), intervalMs = 100L)
    mem.addData((2L, "v2-updated"), (3L, "v3-fresh"))
    q.processAllAvailable()

    // realtime view: base ∪ tail, tail wins on id collision
    val snap = tail.snapshot(schema).orderBy("_id").as[(Long, String)].collect().toSeq
    assert(snap == Seq((1L, "v1"), (2L, "v2-updated"), (3L, "v3-fresh")))

    // fresh rows are searchable pre-compaction (the enable_realtime promise)
    mem.addData((4L, "v4"))
    q.processAllAvailable()
    assert(tail.snapshot(schema).count() == 4)
    q.stop()

    // compaction = the background Indexing loop folding buffer into index
    tail.compact(schema)
    val base2 = spark.read.parquet(basePath).orderBy("_id").as[(Long, String)].collect().toSeq
    assert(base2 == Seq((1L, "v1"), (2L, "v2-updated"), (3L, "v3-fresh"), (4L, "v4")))
    // tail cleared; snapshot still correct
    assert(tail.snapshot(schema).count() == 4)
  }
}
