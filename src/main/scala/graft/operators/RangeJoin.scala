package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join: each point row matches the interval
  * rows with the same key whose `[start, end)` window contains the point
  * — event-to-session attribution, validity-window lookups, IP-to-range
  * joins.
  *
  * Spark plans the naive formulation (`key equality AND start <= t AND
  * t < end`) as an equi-join ONLY on the key: every (point, interval)
  * pair within a key is materialized before the range predicate filters
  * — quadratic in the per-key row counts (and a BroadcastNestedLoopJoin
  * when there is no key at all). This operator BUCKETS time instead:
  * intervals are exploded into the fixed-width buckets they overlap,
  * points map to exactly one bucket, and the join is a plain hash
  * equi-join on (key, bucket) + a residual range check. Each qualifying
  * pair meets in exactly one bucket (the point's), so the output needs
  * no dedup. Cost: interval replication ≈ len/bucketWidth + 1 rows —
  * pick `bucketWidth` near the typical interval length (replication
  * ~2×) rather than far below it; intervals much longer than the width
  * only pay proportional replication, never a per-key cross product.
  *
  * Sentinel / open-ended intervals (e.g. `end = Long.MaxValue` encoding
  * "valid forever") would explode more bucket rows than Spark's max
  * array length and fail the job. Intervals spanning more than
  * `maxBucketsPerInterval` buckets are therefore routed through a
  * SEPARATE broadcast path: they skip the explode entirely and join on
  * the key (plus the residual range check). This assumes long intervals
  * are FEW — the usual shape of sentinel validity rows; if most
  * intervals exceed the cap, `bucketWidth` is misconfigured (raise it).
  */
object RangeJoin {

  /** @param points      point-side rows
    * @param intervals   interval-side rows
    * @param keyCols     equi-key columns present on both sides (may be
    *                    empty: pure time-range join — the bucket becomes
    *                    the only join key, which still beats the BNLJ the
    *                    naive plan degenerates to)
    * @param pointTime   numeric/long point column name (points side)
    * @param startCol    interval start column name, inclusive
    * @param endCol      interval end column name, EXCLUSIVE
    * @param bucketWidth bucket size in the time column's own units
    * @param intervalPrefix prefix applied to interval payload columns in
    *                    the output (collisions with point columns fail loudly)
    * @param maxBucketsPerInterval intervals overlapping more buckets than
    *                    this are broadcast (not exploded) — the guard for
    *                    open-ended sentinel intervals; assumed FEW
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      keyCols: Seq[String],
      pointTime: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long,
      intervalPrefix: String = "",
      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    locally {
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      Seq(points.schema(pointTime), intervals.schema(startCol),
        intervals.schema(endCol)).foreach(f => require(
        Seq(ByteType, ShortType, IntegerType, LongType).contains(f.dataType),
        s"range-join time columns must be integral (got ${f.name}: ${f.dataType}) — " +
          "epoch-scale doubles lose sub-bucket precision past 2^53"))
    }
    val iPayload = intervals.columns.toSeq.filterNot(keyCols.contains)
    val outNames = points.columns.toSeq ++ iPayload.map(intervalPrefix + _)
    require(outNames.distinct.size == outNames.size,
      s"range join output column collision: ${outNames.diff(outNames.distinct).distinct.mkString(", ")} " +
        "— set intervalPrefix to disambiguate interval payload columns")
    // exact integer FLOOR division: `div` truncates toward zero (wrong for
    // negative times), so subtract the non-negative pmod first; the `/`
    // operator routes through double and rounds ns-scale epochs past 2^53,
    // which can misplace boundary points by a whole bucket
    def bucketOf(c: org.apache.spark.sql.Column) = {
      val l = c.cast("long")
      call_function("div", l - pmod(l, lit(bucketWidth)), lit(bucketWidth))
    }
    require(maxBucketsPerInterval >= 1,
      s"maxBucketsPerInterval must be positive: $maxBucketsPerInterval")
    val nonEmpty = col(endCol) > col(startCol)
    val span = bucketOf(col(endCol) - 1) - bucketOf(col(startCol)) + lit(1L)
    val rangeOk = (s: String) => col(s + startCol) <= col(pointTime) &&
      col(pointTime) < col(s + endCol)
    val p = points.withColumn("_bucket", bucketOf(col(pointTime)))
    // an interval [s, e) overlaps buckets floor(s/w) .. floor((e-1)/w);
    // empty intervals (e <= s) match nothing and explode zero buckets
    val i = intervals
      .filter(!nonEmpty || span <= lit(maxBucketsPerInterval.toLong))
      .withColumn("_bucket", explode(when(nonEmpty,
        sequence(bucketOf(col(startCol)), bucketOf(col(endCol) - 1)))
        .otherwise(array().cast("array<long>"))))
      .select((keyCols :+ "_bucket").map(col) ++
        iPayload.map(c => col(c).as(intervalPrefix + c)): _*)
    val viaBuckets = p.join(i, keyCols :+ "_bucket")
      .filter(rangeOk(intervalPrefix))
      .drop("_bucket")
    // sentinel guard: intervals too long to explode join broadcast on the
    // key alone (constant key when keyless, keeping the plan a hash join);
    // a pair meets in exactly one path, so the union needs no dedup
    val iLong = intervals.filter(nonEmpty && span > lit(maxBucketsPerInterval.toLong))
      .select(keyCols.map(col) ++ iPayload.map(c => col(c).as(intervalPrefix + c)): _*)
    val viaBroadcast =
      if (keyCols.nonEmpty) points.join(broadcast(iLong), keyCols)
        .filter(rangeOk(intervalPrefix))
      else points.withColumn("_ck", lit(0))
        .join(broadcast(iLong.withColumn("_ck", lit(0))), Seq("_ck"))
        .filter(rangeOk(intervalPrefix)).drop("_ck")
    viaBuckets.unionByName(viaBroadcast)
  }
}
