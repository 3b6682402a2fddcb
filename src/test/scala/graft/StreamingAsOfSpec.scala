package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingAsOf
import graft.streaming.StreamingAsOf.{In, Out}

class StreamingAsOfSpec extends SparkSpec {
  import spark.implicits._

  test("enriches left events with the latest right state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[In]
    val q = StreamingAsOf.enrich(mem.toDS())
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("asof_out").start()

    // batch 1: a right row, then a left at the same time (inclusive) and
    // one before any right (no match)
    mem.addData(
      In(1L, 10L, isLeft = false, "r10"),
      In(1L, 10L, isLeft = true, "l-at-10"),
      In(1L, 5L, isLeft = true, "l-at-5"))
    q.processAllAvailable()
    // batch 2: newer right replaces state; left in a LATER batch still
    // sees it (state persists); a stale right must not regress state
    mem.addData(In(1L, 20L, isLeft = false, "r20"),
      In(1L, 12L, isLeft = false, "r-stale"))
    q.processAllAvailable()
    mem.addData(In(1L, 30L, isLeft = true, "l-at-30"),
      In(2L, 7L, isLeft = true, "other-key"))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("asof_out").as[Out].collect()
      .map(o => o.payload -> o.rPayload).toMap
    assert(out("l-at-10") == Some("r10"))     // inclusive at equal t
    assert(out("l-at-5") == None)             // nothing at-or-before 5
    assert(out("l-at-30") == Some("r20"))     // cross-batch state, not stale
    assert(out("other-key") == None)          // keys isolated
  }

  test("TTL variant evicts idle keys once the event-time watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[In]
    val q = StreamingAsOf.enrichWithTtl(mem.toDS(), "0 seconds", idleTtlMs = 100)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("asof_ttl").start()
    // two keys get state; one left row is enriched while state is live
    mem.addData(In(1L, 1000L, isLeft = false, "r1"),
      In(2L, 1000L, isLeft = false, "r2"),
      In(1L, 1010L, isLeft = true, "l1"))
    q.processAllAvailable()
    // advance the watermark far past both keys' TTL (1000 + 100)…
    mem.addData(In(9L, 100000L, isLeft = false, "r9"))
    q.processAllAvailable()
    // …and run one more batch so the timed-out groups are swept
    mem.addData(In(9L, 100001L, isLeft = false, "r9b"))
    q.processAllAvailable()
    val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
    assert(stateRows == 1, s"expected only the live key's state row, got $stateRows")
    // enrichment semantics held while the state was live
    val out = spark.table("asof_ttl").as[Out].collect()
      .map(o => o.payload -> o.rPayload).toMap
    assert(out("l1") == Some("r1"))
    // a left row for an EVICTED key starts over: no match from the past
    mem.addData(In(1L, 100100L, isLeft = true, "l-after-evict"))
    q.processAllAvailable()
    val out2 = spark.table("asof_ttl").as[Out].collect()
      .map(o => o.payload -> o.rPayload).toMap
    assert(out2("l-after-evict") == None)
    q.stop()
  }

  test("late left rows never match a right row from their future") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[In]
    val q = StreamingAsOf.enrich(mem.toDS())
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("asof_late").start()
    mem.addData(In(1L, 100L, isLeft = false, "r100"))
    q.processAllAvailable()
    mem.addData(In(1L, 50L, isLeft = true, "late-left"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("asof_late").as[Out].collect()
    assert(out.length == 1 && out.head.rPayload.isEmpty) // no future match
  }
}
