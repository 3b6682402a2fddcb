package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.Graft
import graft.streaming.StreamingDedup

/** Scaling runner for the STREAMING ingest-dedup family — the evidence
  * the batch tables in BENCH_SCALING.md can't provide: that throughput
  * holds as the stream grows and state stays bounded by the WATERMARK
  * HORIZON, not by stream lifetime (the 100 TB failure mode for
  * streaming dedup is unbounded state, not slow batches).
  *
  * Feeds n deterministic synthetic docs (ScaleFixture's statistical
  * shape: 10–100 tokens, ~5 % near-dup clones of a doc ≤ 200 back, half
  * with 1-token substitution — the shape the banded gate must catch)
  * through [[StreamingDedup.exactWithinWatermark]] and
  * [[StreamingDedup.bandedDupsWithinWatermark]] via MemoryStream
  * micro-batches, event time advancing a fixed `spacingMs` per doc so a
  * "10 minutes" watermark covers a CONSTANT ~6 000-doc horizon at every
  * n. Reports rows/sec and the max state rows observed across the run:
  * growing n 10× should grow total time ~10× (flat rows/sec) while the
  * state plateau stays put — that plateau is the boundedness proof.
  *
  * Usage: runMain graft.tools.StreamScale <nDocs>[ <nDocs>...]
  *   e.g.  runMain graft.tools.StreamScale 10000 100000
  * (each value — space- or comma-separated — is a full experiment at
  * that stream length; micro-batch size is fixed at 5 000 rows)
  */
object StreamScale {

  // splitmix64: deterministic, seedable, no java.util.Random state
  private def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def baseText(id: Long): String = {
    val n = 10 + (math.floorMod(mix(id * 31 + 1), 91)).toInt
    val sb = new StringBuilder
    var j = 0
    while (j < n) {
      if (j > 0) sb.append(' ')
      sb.append('w').append(math.floorMod(mix(id * 131 + j), 5000))
      j += 1
    }
    sb.toString
  }

  /** ~5 % of ids clone a doc ≤ 200 back; half of those substitute the
    * first token (Hamming-small, not identical — the banded gate's case).
    */
  private def text(id: Long): String = {
    val isClone = math.floorMod(mix(id * 7 + 3), 20) == 0 && id >= 200
    if (!isClone) baseText(id)
    else {
      val src = id - (math.floorMod(mix(id * 11 + 5), 200) + 1)
      val t = baseText(src)
      if (math.floorMod(mix(id * 13 + 7), 2) == 0) t
      else "wsub" + math.floorMod(mix(id), 97) + t.dropWhile(_ != ' ')
    }
  }

  private def maxStateRows(q: StreamingQuery): Long =
    q.recentProgress.iterator
      .map(p => p.stateOperators.map(_.numRowsTotal).sum)
      .foldLeft(0L)(math.max)

  def main(args: Array[String]): Unit = {
    val spark = Graft.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val spacingMs = 100L                  // 10 min watermark = 6 000 docs
    val batch = 5000

    args.flatMap(_.split(",")).map(_.trim.toLong).foreach { n =>
      // ── exact gate (dropDuplicatesWithinWatermark on content hash)
      locally {
        val mem = MemoryStream[(Timestamp, Long, String)]
        val out = StreamingDedup.exactWithinWatermark(
          mem.toDF().toDF("ts", "doc_id", "text"), "text", "ts", "10 minutes")
        val q = out.writeStream.outputMode(OutputMode.Append)
          .format("memory").queryName(s"ss_exact_$n").start()
        val t0 = System.nanoTime()
        var i = 0L
        while (i < n) {
          val hi = math.min(i + batch, n)
          mem.addData((i until hi).map(id =>
            (new Timestamp(1700000000000L + id * spacingMs), id, text(id))))
          q.processAllAvailable()
          i = hi
        }
        val sec = (System.nanoTime() - t0) / 1e9
        val kept = spark.table(s"ss_exact_$n").count()
        val st = maxStateRows(q)
        q.stop()
        println(f"[streamscale] op=exact n=$n t=$sec%.2f s rows_per_sec=${n / sec}%.0f kept=$kept dropped=${n - kept} max_state_rows=$st")
      }
      // ── banded near-dup gate (4-chunk pigeonhole, Hamming ≤ 3)
      locally {
        val mem = MemoryStream[(Timestamp, Long, String)]
        val dups = StreamingDedup.bandedDupsWithinWatermark(
          mem.toDF().toDF("ts", "doc_id", "text"), "doc_id", "text", "ts",
          watermark = "10 minutes", horizonMs = 10 * 60 * 1000L)
        val q = dups.toDF().writeStream.outputMode(OutputMode.Append)
          .format("memory").queryName(s"ss_banded_$n").start()
        val t0 = System.nanoTime()
        var i = 0L
        while (i < n) {
          val hi = math.min(i + batch, n)
          mem.addData((i until hi).map(id =>
            (new Timestamp(1700000000000L + id * spacingMs), id, text(id))))
          q.processAllAvailable()
          i = hi
        }
        val sec = (System.nanoTime() - t0) / 1e9
        val flagged = spark.table(s"ss_banded_$n")
          .select("doc_id").distinct().count()
        val st = maxStateRows(q)
        q.stop()
        println(f"[streamscale] op=banded n=$n t=$sec%.2f s rows_per_sec=${n / sec}%.0f flagged_docs=$flagged max_state_rows=$st")
      }
    }
    spark.stop()
  }
}
