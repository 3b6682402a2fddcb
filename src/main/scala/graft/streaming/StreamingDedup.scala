package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    * fingerprint-IDENTICAL near-dups only (Hamming 0): the banded
    * candidate joins that recover Hamming ≤ 3 need a self-join no
    * streaming operator expresses — cross-fingerprint near-dup stays with
    * the batch pass over the landed table ([[graft.operators.Dedup
    * .simhashPairs]]), the same realtime/batch split as
    * [[exactWithinWatermark]]. State: one fingerprint per watermark
    * horizon, evicted as the watermark passes.
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
}
