package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers. AQE's skew-join handles most runtime skew;
  * these cover the two shapes AQE can't: a single hot GROUP BY key whose
  * partial aggregate still lands on one reducer, and a hot join key
  * against a non-broadcastable side.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy(key, salt) partial →
    * groupBy(key) final. `aggs` must be algebraic (sum/count/min/max —
    * anything where partial results re-aggregate with the same function).
    * For a hot key carried by a large fraction of all rows this turns one
    * overloaded reducer into `salts` evenly-loaded ones.
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[Column],
      salts: Int)(
      partialAggs: Seq[Column],
      finalAggs: Seq[Column]): DataFrame = {
    require(salts > 1, "salts must be > 1")
    // the salt is a SHUFFLE KEY, so it must be a deterministic function of
    // the ROW: spark_partition_id/monotonically_increasing_id change on a
    // stage retry, re-routing rows into salt partitions whose reducers
    // already finished — silent double-counts/losses under fault recovery
    val salted = df.withColumn("_salt",
      pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salts)))
    salted
      .groupBy((keys :+ col("_salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(keys: _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted join for a skewed LEFT side: the hot left keys are salted
    * 0..salts-1 and the (smaller, but not broadcastable) right side is
    * replicated across all salt values — the classic replicate-broadcast
    * salting. `hotKeys` limits replication to the keys that need it;
    * everything else joins unsalted.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      hotKeys: Seq[Any],
      salts: Int): DataFrame = {
    require(salts > 1, "salts must be > 1")
    val spark = left.sparkSession
    import spark.implicits._
    val hotDf = hotKeys.map(k => k.toString).toDF("_hot_key")

    val leftSalted = left.withColumn("_salt",
      when(col(key).cast("string").isin(hotKeys.map(_.toString): _*),
        // deterministic per-row salt (see saltedAgg): retry-safe shuffle key
        pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(salts)))
        .otherwise(lit(0)))
    val saltRange = spark.range(0, salts).select(col("id").cast("int").as("_salt"))
    val rightHot = right
      .join(broadcast(hotDf), col(key).cast("string") === col("_hot_key"), "left_semi")
      .crossJoin(broadcast(saltRange))
    val rightCold = right
      .join(broadcast(hotDf), col(key).cast("string") === col("_hot_key"), "left_anti")
      .withColumn("_salt", lit(0))
    val rightReplicated = rightHot.unionByName(rightCold)
    leftSalted.join(rightReplicated, Seq(key, "_salt")).drop("_salt")
  }
}
