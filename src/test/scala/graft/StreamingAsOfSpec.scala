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
