package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming coverage beyond the realtime tail: watermarked
  * event-time windows and custom state via flatMapGroupsWithState — the
  * streaming surface a training-data pipeline needs (the reference has no
  * streams at all, SURVEY §2.9).
  */
class StreamingAggSpec extends SparkSpec {
  import spark.implicits._

  test("watermarked tumbling-window aggregation drops late data") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val agg = mem.toDF().toDF("ts", "etype", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "5 minutes"), $"etype")
      .agg(count(lit(1)).as("cnt"), sum($"value").as("v"))
    val q = agg.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("win_agg").start()
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    mem.addData((t(0), "click", 1.0), (t(1), "click", 2.0), (t(6), "view", 5.0))
    q.processAllAvailable()
    // advance watermark far past the first windows so they close
    mem.addData((t(40), "click", 9.0))
    q.processAllAvailable()
    // late event for an already-closed window must be dropped
    mem.addData((t(2), "click", 100.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("win_agg")
      .select($"etype", $"cnt", $"v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows.contains(("click", 2L, 3.0)), s"got $rows") // 1.0+2.0, late 100.0 dropped
    assert(rows.contains(("view", 1L, 5.0)))
  }

  test("StreamingDedup: content dedup within watermark, bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val out = graft.streaming.StreamingDedup.exactWithinWatermark(
      mem.toDF().toDF("ts", "doc_id", "text"), "text", "ts", "10 minutes")
    val q = out.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sdedup_out").start()
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    // same content twice in one batch + once in the next (inside horizon):
    // only the first copy survives; distinct content passes
    mem.addData((t(0), 1L, "same text"), (t(1), 2L, "same text"),
      (t(1), 3L, "other text"))
    q.processAllAvailable()
    mem.addData((t(4), 4L, "same text"))
    q.processAllAvailable()
    val ids = spark.table("sdedup_out").select($"doc_id").as[Long]
      .collect().toSet
    assert(ids == Set(1L, 3L), s"got $ids")
    q.stop()
  }

  test("StreamingDedup.near: simhash-identical jitter copies drop at ingest") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val out = graft.streaming.StreamingDedup.nearWithinWatermark(
      mem.toDF().toDF("ts", "doc_id", "text"), "text", "ts", "10 minutes")
    val q = out.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sneardup_out").start()
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    // doc 2 differs from doc 1 only by whitespace jitter — same token
    // stream, same simhash — while doc 3 is genuinely different content
    mem.addData(
      (t(0), 1L, "the quick brown fox jumps over the lazy dog"),
      (t(1), 2L, "  the quick  brown fox jumps over the lazy dog "),
      (t(1), 3L, "completely different words entirely unrelated here"))
    q.processAllAvailable()
    val ids = spark.table("sneardup_out").select($"doc_id").as[Long]
      .collect().toSet
    assert(ids == Set(1L, 3L), s"got $ids")
    q.stop()
  }

  test("StreamingDedup.banded: bit-flipped re-crawl drops inside the horizon, passes after") {
    implicit val sqlCtx = spark.sqlContext
    // find a variant whose simhash is 1..3 bits from the base — the case
    // Hamming-0 dedup (nearWithinWatermark) misses and the 4-chunk
    // pigeonhole must catch. Derived with the batch kernel so the spec
    // stays deterministic without hardcoding hash internals.
    val base = (0 until 50).map(i => s"tok$i").mkString(" ")
    val cands = (0 until 500).map(i => s"$base extra$i")
    val fps = (base +: cands).toDF("text")
      .select(graft.operators.Dedup.simhash($"text").as("fp"))
      .as[Long].collect()
    val baseFp = fps.head
    val variant = cands.zip(fps.tail)
      .collectFirst { case (t, f)
        if java.lang.Long.bitCount(baseFp ^ f) >= 1 &&
           java.lang.Long.bitCount(baseFp ^ f) <= 3 => t }
      .getOrElse(fail("no 1..3-bit variant among 500 candidates"))
    val unrelated = (0 until 50).map(i => s"other$i").mkString(" ")

    val mem = MemoryStream[(Timestamp, Long, String)]
    val dups = graft.streaming.StreamingDedup.bandedDupsWithinWatermark(
      mem.toDF().toDF("ts", "doc_id", "text"), "doc_id", "text", "ts",
      watermark = "10 minutes", horizonMs = 10 * 60 * 1000L)
    val q = dups.toDF().writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("banded_out").start()
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    // base + unrelated: no dups
    mem.addData((t(0), 1L, base), (t(1), 3L, unrelated))
    q.processAllAvailable()
    // bit-flipped re-crawl inside the horizon: flagged against doc 1
    mem.addData((t(4), 2L, variant))
    q.processAllAvailable()
    // advance the watermark far past the horizon (timeout sweep happens
    // on the batch AFTER the watermark passes); fillers use disjoint
    // token sets — a one-token suffix would itself be a 1-3-bit near-dup
    mem.addData((t(40), 4L, (0 until 50).map(i => s"filler${i}a").mkString(" ")))
    q.processAllAvailable()
    mem.addData((t(42), 5L, (0 until 50).map(i => s"pad${i}b").mkString(" ")))
    q.processAllAvailable()
    // the same re-crawl after horizon expiry is NOT flagged — state gone
    mem.addData((t(43), 6L, variant))
    q.processAllAvailable()
    // state stays bounded by the horizon: ≤ 4 bucket rows per doc still
    // inside it (docs 4/5/6 here), everything older swept by timeout
    val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    assert(stateRows <= 12,
      s"bucket state not horizon-bounded: $stateRows rows")
    q.stop()
    val flagged = spark.table("banded_out")
      .select($"doc_id", $"matched_doc_id").as[(Long, Long)].collect().toSet
    assert(flagged == Set((2L, 1L)),
      s"expected exactly doc 2 flagged against doc 1, got $flagged")
  }

  test("StreamingDedup.banded: a late row neither shrinks the bucket timeout nor rewinds the entry horizon") {
    implicit val sqlCtx = spark.sqlContext
    val base = (0 until 50).map(i => s"late$i").mkString(" ")
    val cands = (0 until 500).map(i => s"$base extra$i")
    val fps = (base +: cands).toDF("text")
      .select(graft.operators.Dedup.simhash($"text").as("fp"))
      .as[Long].collect()
    val baseFp = fps.head
    val variant = cands.zip(fps.tail)
      .collectFirst { case (t, f)
        if java.lang.Long.bitCount(baseFp ^ f) >= 1 &&
           java.lang.Long.bitCount(baseFp ^ f) <= 3 => t }
      .getOrElse(fail("no 1..3-bit variant among 500 candidates"))

    val mem = MemoryStream[(Timestamp, Long, String)]
    val dups = graft.streaming.StreamingDedup.bandedDupsWithinWatermark(
      mem.toDF().toDF("ts", "doc_id", "text"), "doc_id", "text", "ts",
      watermark = "10 minutes", horizonMs = 10 * 60 * 1000L)
    val q = dups.toDF().writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("banded_late_out").start()
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    // doc 1 at 10:08 — its horizon runs to 10:18
    mem.addData((t(8), 1L, base))
    q.processAllAvailable()
    // LATE identical re-crawl at 10:02 (inside the watermark): flagged,
    // and must not pull doc 1's bucket timeout / entry back to 10:12
    mem.addData((t(2), 2L, base))
    q.processAllAvailable()
    // advance the watermark to ~10:14 — past the late row's horizon but
    // inside doc 1's
    mem.addData((t(24), 9L, (0 until 50).map(i => s"spacer${i}x").mkString(" ")))
    q.processAllAvailable()
    // near-dup at 10:15, still inside doc 1's horizon: must be flagged
    mem.addData((t(15), 3L, variant))
    q.processAllAvailable()
    q.stop()
    val flagged = spark.table("banded_late_out")
      .select($"doc_id", $"matched_doc_id").as[(Long, Long)].collect().toSet
    assert(flagged == Set((2L, 1L), (3L, 1L)),
      s"late row corrupted the bucket horizon: $flagged")
  }

  test("StreamingDedup.banded: a pair farther apart than the horizon is not flagged even while its bucket entry awaits eviction") {
    implicit val sqlCtx = spark.sqlContext
    val base = (0 until 50).map(i => s"gap$i").mkString(" ")
    val mem = MemoryStream[(Timestamp, Long, String)]
    val dups = graft.streaming.StreamingDedup.bandedDupsWithinWatermark(
      mem.toDF().toDF("ts", "doc_id", "text"), "doc_id", "text", "ts",
      watermark = "10 minutes", horizonMs = 10 * 60 * 1000L)
    val q = dups.toDF().writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("banded_gap_out").start()
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    // doc 1 at 10:00 — horizon runs to 10:10
    mem.addData((t(0), 1L, base))
    q.processAllAvailable()
    // spacer advances the watermark only to ~10:08 (10-minute delay), so
    // doc 1's entry is NOT yet evicted (eviction needs wm > 10:10)...
    mem.addData((t(18), 9L, (0 until 50).map(i => s"gapspacer${i}y").mkString(" ")))
    q.processAllAvailable()
    // ...but an identical re-crawl at 10:15 is 15 minutes after doc 1 —
    // OUTSIDE the horizon — and must not be flagged against the stale
    // entry (cross-horizon dedup belongs to the batch pass)
    mem.addData((t(15), 2L, base))
    q.processAllAvailable()
    q.stop()
    val flagged = spark.table("banded_gap_out")
      .select($"doc_id", $"matched_doc_id").as[(Long, Long)].collect().toSet
    assert(flagged.isEmpty,
      s"pair outside the horizon flagged via a not-yet-evicted entry: $flagged")
  }

  test("streaming exact dedup: dropDuplicates holds state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val deduped = mem.toDF().toDF("doc_id", "text").dropDuplicates("doc_id")
    val q = deduped.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("dedup_out").start()
    mem.addData((1L, "a"), (2L, "b"), (1L, "a-dup-same-batch"))
    q.processAllAvailable()
    mem.addData((2L, "b-dup-later-batch"), (3L, "c"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dedup_out").select($"doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 2L, 3L)) // each id exactly once, across batches
  }

  test("flatMapGroupsWithState: custom per-key running state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val counted = mem.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (String, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long)], state: GroupState[Long]) =>
          val prev = state.getOption.getOrElse(0L)
          val next = prev + rows.map(_._2).sum
          state.update(next)
          Iterator((key, next))
      }
    val q = counted.toDF("k", "running").writeStream
      .outputMode(OutputMode.Append).format("memory").queryName("state_out").start()
    mem.addData(("a", 1L), ("a", 2L), ("b", 10L))
    q.processAllAvailable()
    mem.addData(("a", 3L))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("state_out").as[(String, Long)].collect().toSet
    assert(out.contains(("a", 3L)) && out.contains(("a", 6L)) && out.contains(("b", 10L)),
      s"got $out") // state persists across micro-batches
  }
}
