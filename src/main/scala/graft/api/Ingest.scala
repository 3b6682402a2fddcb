package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Graft.F
import graft.operators.Documents
import graft.schema.{FieldKind, Space}

/** Ingest conformance — the router's documentParse duties
  * (internal/router/document/doc_parse.go:56-128): schema check, vector
  * dimension check, normalization-at-ingest for `format: normalization`
  * fields (client.go:359-380), `_id` defaulting (client.go:1197-1221),
  * and the RANGE partition rule (internal/entity/partition.go:128-135,
  * space.go:255-285).
  */
object Ingest {

  /** Validate + conform a batch to a space schema: unknown columns
    * rejected, missing nullable columns filled with null, vector dims
    * checked, normalized vector fields L2-normalized, missing `_id`s
    * assigned deterministically.
    */
  def conform(batch: DataFrame, space: Space): DataFrame = {
    val target = space.toStructType
    val unknown = batch.columns.toSet -- target.fieldNames.toSet
    require(unknown.isEmpty, s"unknown fields: ${unknown.mkString(",")}")

    val withId =
      if (batch.columns.contains("_id")) batch
      else batch.withColumn("_id", lit(null).cast("string"))

    val normalizedNames = space.vectorFields
      .filter(_.vector.exists(_.normalized)).map(_.name).toSet
    val dims = space.vectorFields.map(f => f.name -> f.vector.get.dimension).toMap

    val cols: Seq[Column] = target.fields.toSeq.map { sf =>
      if (!withId.columns.contains(sf.name)) lit(null).cast(sf.dataType).as(sf.name)
      else {
        val c = col(sf.name).cast(sf.dataType)
        dims.get(sf.name) match {
          case Some(dim) =>
            // dimension check at ingest (doc_parse.go:465-515): a wrong-size
            // vector poisons the row rather than the batch → null + assert
            val checked = when(c.isNull || size(c) === dim, c)
            val maybeNorm =
              if (normalizedNames.contains(sf.name)) F.l2Normalize(checked)
              else checked
            maybeNorm.as(sf.name)
          case None => c.as(sf.name)
        }
      }
    }
    Documents.withDefaultIds(withId.select(cols: _*), "_id")
  }

  /** RANGE partition rule: named, strictly-increasing upper bounds on a
    * long (ns-date) field; a row routes to the FIRST range whose bound
    * exceeds its value (space.go:255-285). Out-of-range rows get null —
    * the reference rejects them at write (partition.go:128-135).
    */
  final case class RangeRule(field: String, ranges: Seq[(String, Long)]) {
    require(ranges.nonEmpty, "partition rule needs ranges")
    require(ranges.map(_._2) == ranges.map(_._2).sorted &&
      ranges.map(_._2).distinct.size == ranges.size,
      "range bounds must be strictly increasing") // partition.go:128-135

    def partitionCol: Column = {
      val v = col(field)
      ranges.foldRight(lit(null).cast("string")) { case ((name, bound), acc) =>
        when(v < bound, lit(name)).otherwise(acc)
      }
    }
  }

  /** Apply a range rule → `_partition` column; invalid rows (null
    * partition) are split out for the caller to reject, mirroring the
    * per-item error the reference returns.
    */
  def routeByRange(batch: DataFrame, rule: RangeRule): (DataFrame, DataFrame) = {
    val tagged = batch.withColumn("_partition", rule.partitionCol)
    (tagged.filter(col("_partition").isNotNull), tagged.filter(col("_partition").isNull))
  }

  /** Write a space table laid out by the range rule (partition pruning on
    * the date field = the reference's partition routing at query time).
    */
  def writeRangePartitioned(batch: DataFrame, rule: RangeRule, path: String): Unit = {
    val (ok, bad) = routeByRange(batch, rule)
    require(bad.isEmpty, "rows outside all ranges")
    ok.write.mode("overwrite").partitionBy("_partition").parquet(path)
  }
}
