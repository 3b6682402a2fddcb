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

    // seed the base (the "indexed" table); seq orders same-id tail writes
    Seq((1L, "v1", 0L), (2L, "v2", 0L)).toDF("_id", "v", "seq").write.parquet(basePath)
    val schema = spark.read.parquet(basePath).schema

    val tail = new RealtimeTail(spark, basePath, tailPath, ckpt, "_id",
      orderCol = Some("seq"))

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val q = tail.startIngest(mem.toDF().toDF("_id", "v", "seq"), intervalMs = 100L)
    mem.addData((2L, "v2-stale", 1L), (3L, "v3-fresh", 1L))
    q.processAllAvailable()
    mem.addData((2L, "v2-updated", 2L)) // same id again, later sequence
    q.processAllAvailable()

    // realtime view: base ∪ tail; LAST write per id wins (seq order), not
    // an arbitrary within-tail duplicate
    val snap = tail.snapshot(schema).orderBy("_id")
      .select("_id", "v").as[(Long, String)].collect().toSeq
    assert(snap == Seq((1L, "v1"), (2L, "v2-updated"), (3L, "v3-fresh")))

    // fresh rows are searchable pre-compaction (the enable_realtime promise)
    mem.addData((4L, "v4", 1L))
    q.processAllAvailable()
    assert(tail.snapshot(schema).count() == 4)
    q.stop()

    // compaction = the background Indexing loop folding buffer into index
    tail.compact(schema)
    val base2 = spark.read.parquet(basePath).orderBy("_id")
      .select("_id", "v").as[(Long, String)].collect().toSeq
    assert(base2 == Seq((1L, "v1"), (2L, "v2-updated"), (3L, "v3-fresh"), (4L, "v4")))
    // tail cleared; snapshot still correct
    assert(tail.snapshot(schema).count() == 4)
  }
}
