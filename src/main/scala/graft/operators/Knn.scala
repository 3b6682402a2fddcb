package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Graft.F

/** Brute-force (FLAT) KNN search — the vearch hot path re-expressed as a
  * declarative Spark plan (reference: Engine::Search
  * internal/engine/search/engine.cc:248-408, FLAT scan
  * internal/engine/index/impl/gamma_index_flat.cc).
  *
  * Execution shape at scale: `filter → score → TakeOrderedAndProject`.
  * Spark's TakeOrderedAndProject IS the distributed analog of vearch's
  * per-partition top-k heap + router k-way merge (client.go:1497-1576):
  * each partition keeps a bounded heap of k rows, the driver merges P×k
  * rows. No full sort, no big shuffle — survives 100 TB scans.
  *
  * Scalar filter-first (engine.cc:355-373) is free here: a `filter` before
  * the score is pushed to the parquet scan by Catalyst, so the distance
  * kernel only runs on candidate rows.
  */
object Knn {

  /** Score column for a vearch metric. `ip` and `cosine` are
    * higher-is-better, `l2`/`l2sq` lower-is-better (doc_query.go:1526-1528
    * forces the sort direction from the metric).
    */
  def score(metric: String, vec: Column, query: Column): Column = metric match {
    case "ip"     => F.vecDot(vec, query)
    case "l2"     => F.vecL2(vec, query)
    case "l2sq"   => F.vecL2Sq(vec, query)
    case "cosine" => F.vecCosine(vec, query)
    case other    => throw new IllegalArgumentException(s"unknown metric: $other")
  }

  def ascending(metric: String): Boolean = metric.startsWith("l2")

  def queryLit(q: Seq[Float]): Column = typedLit(q).cast("array<float>")

  /** Single-query top-k. Result = input columns + `_score`, best-first.
    * `filter` = vearch scalar pre-filter; `minScore`/`maxScore` = the
    * score-range gate (doc_query.go:67-78, applied in-scan
    * gamma_common_data.h:94-96).
    */
  def search(
      df: DataFrame,
      vecCol: Column,
      query: Seq[Float],
      k: Int,
      metric: String = "l2",
      filter: Option[Column] = None,
      minScore: Option[Double] = None,
      maxScore: Option[Double] = None,
      tieBreak: Option[Column] = None,
      roundTo: Option[Int] = None): DataFrame = {
    val filtered = filter.map(df.filter).getOrElse(df)
    // null vectors score null; drop them explicitly — `asc` sorts NULLS
    // FIRST in Spark, so they would otherwise head every L2 top-k
    val scored = filtered.withColumn("_score", score(metric, vecCol, queryLit(query)))
      .filter(col("_score").isNotNull)
    val gated = scoreGate(scored, minScore, maxScore)
    // order by the RAW score (bit-stable, matches a sequential oracle);
    // rounding is display-only and must happen AFTER selection — rounding
    // first would flip rank for scores that collide at the rounded
    // precision but differ in raw value.
    val primary = if (ascending(metric)) col("_score").asc else col("_score").desc
    val order = primary +: tieBreak.map(_.asc).toSeq
    val selected = gated.orderBy(order: _*).limit(k)
    roundTo.map(d => selected.withColumn("_score", round(col("_score"), d)))
      .getOrElse(selected)
  }

  /** Score column for int8-encoded (binary) vectors — the INT8 value type
    * (index_model.h:19): integer-accumulate kernels over signed bytes.
    */
  def scoreInt8(metric: String, vec: Column, query: Column): Column = metric match {
    case "ip"   => F.i8Dot(vec, query)
    case "l2"   => F.i8L2(vec, query)
    case "l2sq" => F.i8L2Sq(vec, query)
    case other  => throw new IllegalArgumentException(s"unknown int8 metric: $other")
  }

  /** Brute-force top-k over int8-encoded vectors. Same plan shape as
    * [[search]] (filter → score → TakeOrderedAndProject) with 1/4 the
    * scan bytes per vector.
    */
  def searchInt8(
      df: DataFrame,
      vecCol: Column,
      query: Array[Byte],
      k: Int,
      metric: String = "ip",
      filter: Option[Column] = None,
      minScore: Option[Double] = None,
      maxScore: Option[Double] = None,
      tieBreak: Option[Column] = None,
      roundTo: Option[Int] = None): DataFrame = {
    val filtered = filter.map(df.filter).getOrElse(df)
    val scored = filtered
      .withColumn("_score", scoreInt8(metric, vecCol, lit(query)))
      .filter(col("_score").isNotNull)
    val gated = scoreGate(scored, minScore, maxScore)
    val primary = if (ascending(metric)) col("_score").asc else col("_score").desc
    val order = primary +: tieBreak.map(_.asc).toSeq
    val selected = gated.orderBy(order: _*).limit(k)
    roundTo.map(d => selected.withColumn("_score", round(col("_score"), d)))
      .getOrElse(selected)
  }

  /** The score-range gate (doc_query.go:67-78), shared by every value-type
    * path — gates apply BEFORE top-k selection. Shared with the routed
    * index families: the reference applies the same gate IN-SCAN at heap
    * admission for every index type (gamma_common_data.h:94-96), so the
    * scan-shaped index operators call this on their scored candidates
    * before their bounded top-k — fully distributed, no over-fetch.
    */
  private[graft] def scoreGate(scored: DataFrame,
      minScore: Option[Double], maxScore: Option[Double]): DataFrame =
    (minScore, maxScore) match {
      case (Some(lo), Some(hi)) => scored.filter(col("_score").between(lo, hi))
      case (Some(lo), None)     => scored.filter(col("_score") >= lo)
      case (None, Some(hi))     => scored.filter(col("_score") <= hi)
      case _                    => scored
    }

  /** Brute-force top-k over packed binary codes (value_type=BINARY /
    * BINARYIVF class): Hamming distance, ascending. The stored value IS
    * the code — there are no raw floats to rerank against.
    */
  def searchBinary(
      df: DataFrame,
      vecCol: Column,
      qCode: Array[Byte],
      k: Int,
      filter: Option[Column] = None,
      minScore: Option[Double] = None,
      maxScore: Option[Double] = None,
      tieBreak: Option[Column] = None): DataFrame = {
    val filtered = filter.map(df.filter).getOrElse(df)
    val scored = filtered
      .withColumn("_score", F.hamming(vecCol, lit(qCode)).cast("double"))
      .filter(col("_score").isNotNull)
    val gated = scoreGate(scored, minScore, maxScore)
    val order = col("_score").asc +: tieBreak.map(_.asc).toSeq
    gated.orderBy(order: _*).limit(k)
  }

  /** Batched multi-query KNN (vearch `req_num` query vectors per request,
    * doc_query.go:296-318): the query set is broadcast against the corpus,
    * then a bounded-heap aggregate keeps top-k per query id.
    *
    * Scale: shuffle volume is |queries| × k rows (partial aggregation
    * reduces each partition to k per qid map-side) — independent of corpus
    * size.
    *
    * @param queries small DataFrame with columns (qidCol, qvecCol)
    * @return columns: qid, item struct fields..., _score — best-first per qid
    */
  def searchBatch(
      corpus: DataFrame,
      vecCol: Column,
      payload: Column,
      queries: DataFrame,
      qidCol: String,
      qvecCol: String,
      k: Int,
      metric: String = "l2",
      minScore: Option[Double] = None,
      maxScore: Option[Double] = None,
      offset: Int = 0,
      // value_type dispatch (index_model.h:19): non-float corpora plug
      // their own kernel (int8 integer-accumulate, binary Hamming) —
      // `metric` still drives the sort direction
      scoreFn: Option[(Column, Column) => Column] = None): DataFrame = {
    val q = queries.select(col(qidCol).as("_qid"), col(qvecCol).as("_qvec"))
    val scorer = scoreFn.getOrElse((v: Column, qc: Column) => score(metric, v, qc))
    val scored = corpus.crossJoin(broadcast(q))
      .select(col("_qid"),
        scorer(vecCol, col("_qvec")).as("_score"),
        payload.as("_item"))
      .filter(col("_score").isNotNull)
    // gates apply BEFORE selection — vearch's in-scan score gate
    // (gamma_common_data.h:94-96); gating after top-k would return fewer
    // than k rows even when enough in-range docs exist
    val gated = scoreGate(scored, minScore, maxScore)
    val agged = gated.groupBy(col("_qid"))
      .agg(F.topK(col("_score"), col("_item"), k + offset, ascending(metric)).as("_tk"))
    // per-qid pagination = slicing the already-sorted top array
    val sliced = if (offset > 0) agged.withColumn("_tk", slice(col("_tk"), offset + 1, k))
      else agged
    sliced
      .select(col("_qid"), explode(col("_tk")).as("_e"))
      .select(col("_qid"), col("_e.item").as("_item"), col("_e.score").as("_score"))
  }

  /** Multi-vector conjunctive search (vearch: N vector conditions on
    * different fields; per-field top-k, docid INTERSECTION, combined score
    * = Σ wᵢ·scoreᵢ — vector_manager.cc:859,1024-1087; WeightedRanker
    * doc_query.go:201-216, default weight 1/N).
    *
    * Inner join on the id ≡ their sorted-docid seek-merge intersection.
    */
  def multiVectorSearch(
      df: DataFrame,
      idCol: String,
      fields: Seq[(Column, Seq[Float])], // (vector column, query vector) per field
      perFieldK: Int,
      k: Int,
      metric: String = "l2",
      weights: Option[Seq[Double]] = None): DataFrame =
    multiVectorSearchMetrics(df, idCol,
      fields.map { case (vc, qv) => (vc, qv, metric) }, perFieldK, k, weights)

  /** Per-field metrics variant: the reference scores each vector condition
    * with that FIELD's own metric_type (vector_manager.cc:1024-1087), so a
    * mixed ip/l2 space must not apply the head field's metric everywhere.
    * Each field's top-k uses its own sort direction; the combined
    * WeightedRanker sum orders in the FIRST field's direction
    * (doc_query.go:1526-1528 derives the response direction from the
    * request's lead condition).
    */
  def multiVectorSearchMetrics(
      df: DataFrame,
      idCol: String,
      fields: Seq[(Column, Seq[Float], String)], // (vector col, query, metric)
      perFieldK: Int,
      k: Int,
      weights: Option[Seq[Double]] = None,
      // per-condition min/max score gates (gamma_common_data.h:94-96 —
      // the reference gates EACH condition's results before the docid
      // intersection): applied in-scan, before that field's bounded
      // top-k, same placement as the single-condition scan gate
      gates: Seq[(Option[Double], Option[Double])] = Seq.empty,
      // per-condition score override for non-float value types
      // (index_model.h:19 — a conjunction may mix float, int8 and binary
      // fields; the reference scores each condition with its field's own
      // distance path): Some(col => scoreCol) replaces the float metric
      // kernel for that condition; its query is already bound inside
      scoreFns: Seq[Option[Column => Column]] = Seq.empty): DataFrame = {
    require(fields.nonEmpty)
    require(gates.isEmpty || gates.size == fields.size,
      "gates arity must match vector conditions")
    require(scoreFns.isEmpty || scoreFns.size == fields.size,
      "scoreFns arity must match vector conditions")
    val w = weights.getOrElse(Seq.fill(fields.size)(1.0 / fields.size))
    require(w.size == fields.size)
    val perField = fields.zipWithIndex.map { case ((vc, qv, m), i) =>
      val scoreCol =
        scoreFns.lift(i).flatten.map(fn => fn(vc))
          .getOrElse(score(m, vc, queryLit(qv)))
      val scored = df.select(col(idCol), scoreCol.as(s"_s$i"))
        .filter(col(s"_s$i").isNotNull) // null vectors must not head asc order
      val (gLo, gHi) =
        if (gates.isEmpty) (None, None) else gates(i)
      val gated = (gLo, gHi) match {
        case (Some(lo), Some(hi)) => scored.filter(col(s"_s$i").between(lo, hi))
        case (Some(lo), None)     => scored.filter(col(s"_s$i") >= lo)
        case (None, Some(hi))     => scored.filter(col(s"_s$i") <= hi)
        case _                    => scored
      }
      gated.orderBy(
          if (ascending(m)) col(s"_s$i").asc else col(s"_s$i").desc,
          col(idCol).asc) // deterministic k-boundary on exactly-equal scores
        .limit(perFieldK)
    }
    val joined = perField.reduceLeft((a, b) => a.join(b, Seq(idCol), "inner"))
    val combined = fields.indices
      .map(i => col(s"_s$i") * lit(w(i)))
      .reduceLeft(_ + _)
    val ranked = joined.withColumn("_score", combined)
    val primary =
      if (ascending(fields.head._3)) col("_score").asc else col("_score").desc
    ranked.orderBy(primary, col(idCol).asc).limit(k)
      .select((col(idCol) +: fields.indices.map(i => col(s"_s$i")) :+ col("_score")): _*)
  }
}
