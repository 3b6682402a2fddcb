package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}

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

  /** Validate + conform a batch to a space schema, splitting out rows the
    * reference would reject per-item (doc_parse.go:465-515's dimension
    * check): returns (conformed-ok, rejected). Ok rows get missing
    * nullable columns filled, normalized vector fields L2-normalized, and
    * missing `_id`s assigned deterministically. Unknown columns reject
    * the whole batch (a schema error, not a row error).
    */
  def conformSplit(batch: DataFrame, space: Space): (DataFrame, DataFrame) = {
    val target = space.toStructType
    val unknown = batch.columns.toSet -- target.fieldNames.toSet
    require(unknown.isEmpty, s"unknown fields: ${unknown.mkString(",")}")

    val withId =
      if (batch.columns.contains("_id")) batch
      else batch.withColumn("_id", lit(null).cast("string"))

    val normalizedNames = space.vectorFields
      .filter(_.vector.exists(_.normalized)).map(_.name).toSet

    // a row is rejected if ANY present vector field has the wrong size —
    // never silently nulled (a nulled vector would just vanish from every
    // KNN result with no signal to the writer). Size semantics follow the
    // value type (doc_query.go:296-301): float = `dimension` elements,
    // binary = dimension/8 packed bytes, int8 = dimension bytes.
    val badVec = space.vectorFields.collect {
      case f if withId.columns.contains(f.name) =>
        val vo = f.vector.get
        vo.valueType match {
          case "binary" =>
            col(f.name).isNotNull && length(col(f.name)) =!= vo.dimension / 8
          case "int8" =>
            col(f.name).isNotNull && length(col(f.name)) =!= vo.dimension
          case _ =>
            // wrong size OR any null element: a vector like [1.0, null,
            // 2.0] passes a size-only check and then silently poisons
            // every distance computation that reads it
            val asFloats = col(f.name).cast(ArrayType(FloatType))
            col(f.name).isNotNull &&
              (size(asFloats) =!= vo.dimension ||
                exists(asFloats, x => x.isNull))
        }
    }
    val isBad = badVec.reduceOption(_ || _).getOrElse(lit(false))
    val rejected = withId.filter(isBad)
    val okRows = withId.filter(!isBad)

    val cols: Seq[Column] = target.fields.toSeq.map { sf =>
      if (!withId.columns.contains(sf.name)) lit(null).cast(sf.dataType).as(sf.name)
      else {
        val c = col(sf.name).cast(sf.dataType)
        if (normalizedNames.contains(sf.name)) F.l2Normalize(c).as(sf.name)
        else c.as(sf.name)
      }
    }
    (Documents.withDefaultIds(okRows.select(cols: _*), "_id"), rejected)
  }

  /** Strict conformance: rejects the batch if any row fails (use
    * [[conformSplit]] for the reference's per-item error semantics).
    * The batch is pinned for the check: the emptiness gate and the
    * returned rows must see the SAME data — a nondeterministic source
    * could otherwise pass the gate and still emit bad rows at write time
    * (ingest batches are bounded, so pinning one is cheap). The pin is
    * released before returning: the ok rows are snapshotted via an eager
    * localCheckpoint (lineage cut, blocks freed on GC by the context
    * cleaner), so repeated ingest batches don't accumulate CacheManager
    * entries for the session lifetime.
    */
  def conform(batch: DataFrame, space: Space): DataFrame = {
    val pinned = batch.cache()
    try {
      val (ok, bad) = conformSplit(pinned, space)
      require(bad.isEmpty, "batch contains rows with wrong-dimension vectors")
      ok.localCheckpoint(eager = true)
    } finally {
      pinned.unpersist(blocking = true)
      ()
    }
  }

  /** JSON-lines bulk ingest — the reference's only wire format
    * (POST /document/upsert carries JSON docs, parsed field-by-field in
    * doc_parse.go:56-128). The space schema DRIVES the read
    * (`spark.read.schema(...)`), so fields arrive typed, unknown keys are
    * dropped by the reader (never silently widen the schema), and rows
    * whose values cannot coerce surface as all-null `_corrupt`-style rows
    * in the rejected split instead of poisoning the table. Returns
    * (conformed-ok, rejected) like [[conformSplit]].
    */
  def fromJsonl(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      space: Space): (DataFrame, DataFrame) = {
    val schema = space.toStructType
    // the WIRE carries every vector as a JSON number array whatever the
    // value_type (doc_parse.go:56-128 parses the feature array once; the
    // engine converts per value type) — so int8/binary fields read as
    // float arrays here and pack AFTER the parse: int8 through the
    // symmetric quantizer, binary through sign-binarization, the same
    // conversions the query side applies to request features
    val packedVecs = space.vectorFields
      .filter(_.vector.exists(v => v.valueType == "int8" || v.valueType == "binary"))
    val wireType = ArrayType(FloatType)
    val wireSchema = org.apache.spark.sql.types.StructType(schema.fields.map(sf =>
      if (packedVecs.exists(_.name == sf.name)) sf.copy(dataType = wireType)
      else sf))
    // PERMISSIVE + a corrupt-record column: a malformed line must become a
    // rejected ROW (the reference returns a per-item error), not an
    // exception killing the batch
    val corrupt = "_graft_corrupt"
    val withCorrupt = org.apache.spark.sql.types.StructType(
      wireSchema.fields :+ org.apache.spark.sql.types.StructField(
        corrupt, org.apache.spark.sql.types.StringType, nullable = true))
    // materialize the parse before splitting: Spark refuses corrupt-column-
    // only queries over a raw JSON source (and the gate + returned rows
    // must see one consistent parse anyway — same argument as conform's pin)
    val raw = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corrupt)
      .json(path)
      .localCheckpoint(eager = true)
    val bad = raw.filter(col(corrupt).isNotNull).drop(corrupt)
    val good = raw.filter(col(corrupt).isNull).drop(corrupt)
    // wire-size check BEFORE packing (conformSplit sees packed bytes and
    // would check the packed length — a wrong-size or null-element float
    // array must reject here, never silently mis-pack)
    val badWire = packedVecs.map { f =>
      val dim = f.vector.get.dimension
      col(f.name).isNotNull &&
        (size(col(f.name)) =!= dim || exists(col(f.name), x => x.isNull))
    }.reduceOption(_ || _).getOrElse(lit(false))
    val goodWire = good.filter(!badWire)
    val packed = packedVecs.foldLeft(goodWire) { (df, f) =>
      val c = col(f.name)
      val packedCol = f.vector.get.valueType match {
        case "int8" => when(c.isNotNull, F.quantizeI8(c))
        case _      => when(c.isNotNull, F.signBits(c))
      }
      df.withColumn(f.name, packedCol)
    }
    val (ok, rejected) = conformSplit(packed, space)
    // rejected rows surface in the STORAGE schema (per-item diagnostics
    // key on _id, not the unparseable payload): un-packable wire vectors
    // null out, corrupt lines stay all-null
    def toStorage(df: DataFrame): DataFrame =
      df.select(rejected.columns.map { n =>
        if (packedVecs.exists(_.name == n) &&
            df.schema(n).dataType != org.apache.spark.sql.types.BinaryType)
          lit(null).cast(org.apache.spark.sql.types.BinaryType).as(n)
        else col(n)
      }.toIndexedSeq: _*)
    (ok, rejected
      .unionByName(toStorage(good.filter(badWire)))
      .unionByName(toStorage(bad)))
  }

  /** Dense-id sidecar for string-PK spaces — the reference maps every
    * string `_id` to an int docid at ingest so the index layers never
    * see strings (engine.cc:730-745; SURVEY §1.1 anticipated
    * `monotonically_increasing_id` for exactly this). Rows whose `_id`
    * already exists in `base` KEEP the base row's docid (an update in
    * place keeps its docid — the generation gates and tail merges then
    * supersede the stale layout entry by that same id); new ids get
    * fresh docids strictly ABOVE the base's max, so docids stay unique
    * across arbitrarily many ingest batches and tail folds. Uniqueness,
    * not density, is the contract — graph node ids and ledger entries
    * are arbitrary longs, and `monotonically_increasing_id`'s
    * partition-striped values avoid any global ordering shuffle.
    */
  def assignDocids(batch: DataFrame, base: Option[DataFrame] = None,
      idCol: String = "_id", docidCol: String = "_docid",
      // explicit mint floor (e.g. a persisted high-water mark) — skips
      // the base max() scan a 100 TB table should never pay per batch
      nextDocid: Option[Long] = None): DataFrame = {
    val cleaned = batch.drop(docidCol)
    val offset: Long = nextDocid.getOrElse(base match {
      case Some(b) =>
        val r = b.agg(max(col(docidCol).cast("long"))).head()
        if (r.isNullAt(0)) 0L else r.getLong(0) + 1L
      case None => 0L
    })
    val withBase = base match {
      case Some(b) =>
        cleaned.join(
          b.select(col(idCol), col(docidCol).cast("long").as("_docid_base")),
          Seq(idCol), "left")
      case None => cleaned.withColumn("_docid_base", lit(null).cast("long"))
    }
    withBase
      .withColumn(docidCol,
        coalesce(col("_docid_base"), monotonically_increasing_id() + offset))
      .drop("_docid_base")
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
    // duplicate NAMES would silently merge two ranges into one partition
    // directory, defeating the distinct named-partition routing
    require(ranges.map(_._1).distinct.size == ranges.size,
      "range names must be distinct")

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
