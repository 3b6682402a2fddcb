package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact dedup — the ingest-time twin of [[graft.operators.Dedup.exact]]:
  * drop content-identical documents as they arrive, keeping the first-seen
  * copy. Built on `dropDuplicatesWithinWatermark` over the content hash, so
  * per-key state is EVICTED once the watermark passes it — state size is
  * bounded by one watermark horizon of distinct content, not by stream
  * lifetime (a plain `dropDuplicates` on an unbounded stream grows state
  * forever, which is the 100 TB failure mode).
  *
  * Duplicates farther apart than the horizon are not caught here by
  * design — the periodic batch pass ([[graft.operators.Dedup.exact]] /
  * `Dedup.clusters` over the landed table) owns cross-horizon dedup, the
  * same split the reference draws between its realtime buffer and the
  * background indexer (SURVEY §2.8).
  */
object StreamingDedup {

  /** @param stream    streaming DataFrame with an event-time column
    * @param textCol   content column deduped on (hashed, not compared raw)
    * @param tsCol     event-time column the watermark rides on
    * @param watermark horizon, e.g. "10 minutes"
    *
    * NULL-content rows pass through UNDEDUPED: md5(null) is null, and a
    * null dedup key would make every null-content document after the
    * first vanish as a "duplicate" of documents it shares nothing with.
    */
  def exactWithinWatermark(
      stream: DataFrame, textCol: String, tsCol: String,
      watermark: String): DataFrame = {
    val marked = stream.withWatermark(tsCol, watermark)
    val deduped = marked.filter(col(textCol).isNotNull)
      .withColumn("_chash", md5(col(textCol)))
      .dropDuplicatesWithinWatermark("_chash")
      .drop("_chash")
    deduped.unionByName(marked.filter(col(textCol).isNull))
  }

  /** Streaming NEAR-dup gate: dedup on the 64-bit SimHash fingerprint
    * instead of the content hash — token-order-insensitive and robust to
    * the whitespace/markup jitter that defeats exact hashing, so
    * re-crawled copies with trivial differences drop at ingest. Catches
    * fingerprint-IDENTICAL near-dups only (Hamming 0); cross-fingerprint
    * near-dup within the horizon is [[bandedDupsWithinWatermark]], and
    * cross-horizon near-dup stays with the batch pass over the landed
    * table ([[graft.operators.Dedup.simhashPairs]]), the same
    * realtime/batch split as [[exactWithinWatermark]]. State: one
    * fingerprint per watermark horizon, evicted as the watermark passes.
    */
  def nearWithinWatermark(
      stream: DataFrame, textCol: String, tsCol: String,
      watermark: String): DataFrame = {
    val marked = stream.withWatermark(tsCol, watermark)
    val deduped = marked.filter(col(textCol).isNotNull)
      .withColumn("_simhash", graft.operators.Dedup.simhash(col(textCol)))
      .dropDuplicatesWithinWatermark("_simhash")
      .drop("_simhash")
    deduped.unionByName(marked.filter(col(textCol).isNull))
  }

  /** One banded row per (chunk, fingerprint chunk value). */
  case class BandIn(doc_id: Long, fp: Long, ts: java.sql.Timestamp,
      chunk: Int, cval: Long)

  /** A detected in-horizon near-dup: `doc_id` is within `hamming` ≤
    * maxHamming bits of `matched_doc_id`, seen `t_ms − matched_t_ms`
    * millis earlier. A pair agreeing on several chunks is reported once
    * per agreeing chunk — consumers anti-join on `doc_id`, where
    * multiplicity is irrelevant.
    */
  case class BandDup(doc_id: Long, t_ms: Long, matched_doc_id: Long,
      matched_t_ms: Long, hamming: Int)

  /** Per-bucket fingerprint log: (fp, lastSeenMs, docId). Public — the
    * state encoder's generated code constructs it reflectively.
    */
  case class BucketState(entries: List[(Long, Long, Long)])

  /** Streaming BANDED near-dup detection, Hamming ≤ `maxHamming` (≤ 3) —
    * the ingest-time twin of [[graft.operators.Dedup.simhashPairs]]: the
    * 64-bit SimHash splits into 4×16-bit chunks; a pair within distance 3
    * differs in at most 3 chunks, so it AGREES on at least one — keying
    * `flatMapGroupsWithState` on (chunk index, chunk value) routes every
    * such pair through a shared bucket, where the exact 64-bit Hamming
    * check runs against the bucket's in-horizon fingerprint log. Lossless
    * for maxHamming ≤ 3 within the horizon, exact check = no false
    * positives — the streaming shape of the batch pigeonhole equi-join.
    *
    * Output is the DUP LIST (append mode): one [[BandDup]] per detection.
    * Survivor extraction is a per-batch/landed-table anti-join on
    * `doc_id` — an OR over buckets needs no second stateful operator,
    * which Structured Streaming could not chain after this one anyway.
    *
    * State: per (chunk, value) bucket, the fingerprints seen within the
    * watermark horizon — entries older than `horizonMs` behind the
    * watermark are dropped on every bucket visit, idle buckets are
    * removed wholesale by event-time timeout (the timer that works on
    * this build — wall-clock `ProcessingTimeTimeout` livelocks, see
    * [[StreamingAsOf]]). Re-crawled fingerprints refresh their entry's
    * timestamp instead of appending, so a bucket holds at most one entry
    * per distinct in-horizon fingerprint. A detected dup still refreshes
    * its fingerprint — dropping a doc must not reopen the horizon for the
    * next copy of the same content.
    *
    * Scale shape: state shards across (chunk, value) buckets — 4 rows per
    * doc shuffle to buckets whose population concentrates only where
    * near-identical content concentrates (the same hot-bucket profile as
    * the batch pigeonhole, which caps it; here the horizon bounds it).
    */
  def bandedDupsWithinWatermark(
      stream: DataFrame, idCol: String, textCol: String, tsCol: String,
      watermark: String, horizonMs: Long,
      maxHamming: Int = 3): Dataset[BandDup] = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4-chunk pigeonhole supports maxHamming <= 3: $maxHamming")
    require(horizonMs > 0, s"horizonMs must be positive: $horizonMs")
    val spark = stream.sparkSession
    import spark.implicits._
    val banded = stream.filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        graft.operators.Dedup.simhash(col(textCol)).as("fp"),
        col(tsCol).as("ts"))
      .withWatermark("ts", watermark)
      .select(col("doc_id"), col("fp"), col("ts"),
        explode(sequence(lit(0), lit(3))).as("chunk"))
      .withColumn("cval", expr("(fp >> (chunk * 16)) & 65535"))
      .as[BandIn]
    banded.groupByKey(b => (b.chunk, b.cval))
      .flatMapGroupsWithState[BucketState, BandDup](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: (Int, Long), rows: Iterator[BandIn], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val wm = state.getCurrentWatermarkMs
            val rs = rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id))
            var entries = state.getOption.map(_.entries).getOrElse(Nil)
              .filter(_._2 + horizonMs >= wm)
            val out = Seq.newBuilder[BandDup]
            rs.foreach { r =>
              val tMs = r.ts.getTime
              // the pair itself must be within the horizon: bucket pruning
              // alone (`e._2 + horizonMs >= wm`) keeps entries until the
              // WATERMARK passes them, and wm lags max event time by the
              // watermark delay — without this bound a pair up to
              // horizon + delay apart would be reported as in-horizon
              entries.find(e =>
                tMs - e._2 <= horizonMs &&
                java.lang.Long.bitCount(e._1 ^ r.fp) <= maxHamming)
                .foreach { e =>
                  out += BandDup(r.doc_id, tMs, e._3, e._2,
                    java.lang.Long.bitCount(e._1 ^ r.fp))
                }
              // one entry per distinct fingerprint; re-seen fps refresh
              // only FORWARD — a late row must not rewind an entry's
              // timestamp (it would shrink the newer sighting's horizon)
              if (entries.find(_._1 == r.fp).forall(_._2 <= tMs))
                entries = (r.fp, tMs, r.doc_id) ::
                  entries.filterNot(_._1 == r.fp)
            }
            state.update(BucketState(entries))
            // expiry must cover the NEWEST entry in state, not just this
            // batch: a late (in-watermark) row would otherwise shrink the
            // timeout below older entries' horizon and evict them early
            val maxEntryT = entries.iterator.map(_._2).max
            state.setTimeoutTimestamp(math.max(maxEntryT + horizonMs, wm + 1))
            out.result().iterator
          }
      }
  }
}
