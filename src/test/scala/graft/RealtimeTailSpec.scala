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

  test("realtime HNSW search: graph base ∪ brute tail, updated docs never stale") {
    val tmp = Files.createTempDirectory("rtail_hnsw").toString
    val basePath = s"$tmp/base"; val tailPath = s"$tmp/tail"; val ckpt = s"$tmp/ckpt"
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id".as("_id"), $"embedding", lit(0L).as("seq"))
      .write.parquet(basePath)
    val schema = spark.read.parquet(basePath).schema
    val q0 = spark.read.parquet(basePath).filter($"_id" === 0)
      .select("embedding").head().getSeq[Float](0)

    val segs = graft.operators.HnswIndex.build(
      spark.read.parquet(basePath), "_id", "embedding",
      graft.operators.HnswIndex.Params(8, 60, "l2", numShards = 3)).cache()
    segs.count()

    val tail = new RealtimeTail(spark, basePath, tailPath, ckpt, "_id",
      orderCol = Some("seq"))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float], Long)]
    val ingest = tail.startIngest(
      mem.toDF().toDF("_id", "embedding", "seq")
        .select($"_id", $"embedding".cast("array<float>"), $"seq"),
      intervalMs = 100L)
    // a fresh doc almost identical to the query, plus an UPDATE moving
    // doc 0 (the base's exact top-1) far away — its stale base ranking
    // must not survive the merge
    mem.addData((900000L, q0.map(_ + 0.001f), 1L), (0L, q0.map(_ + 100f), 1L))
    ingest.processAllAvailable()
    ingest.stop()

    val got = tail.searchHnsw(segs, schema, "embedding", q0, k = 5, ef = 1 << 30)
      .select($"vec_id", $"_score").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = graft.operators.Knn.search(tail.snapshot(schema),
      $"embedding", q0, 5, "l2", tieBreak = Some($"_id"))
      .select($"_id", $"_score").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want) // exact-params realtime search ≡ brute over the live view
    assert(got.head._1 == 900000L)      // fresh tail doc served pre-compaction
    assert(!got.map(_._1).contains(0L)) // updated doc's stale rank is gone

    // delete gate: denied ids surface from NEITHER leg — not from the
    // graph base (allow-functor) nor from a buffered tail write — and
    // the merged top-k still fills from live docs
    val deny = Set(900000L, got(1)._1)
    val gated = tail.searchHnsw(segs, schema, "embedding", q0, k = 5,
      ef = 1 << 30, deny = deny)
      .select($"vec_id").collect().map(_.getLong(0)).toSeq
    assert(gated.size == 5)
    assert(gated.forall(!deny.contains(_)))
    val wantGated = graft.operators.Knn.search(
      tail.snapshot(schema).filter(!$"_id".isin(deny.toSeq: _*)),
      $"embedding", q0, 5, "l2", tieBreak = Some($"_id"))
      .select($"_id").collect().map(_.getLong(0)).toSeq
    assert(gated == wantGated)
  }
}
