package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.operators.{Documents, IvfIndex, Knn, VearchFilters}
import graft.schema.{FieldKind, Space}

/** Request-level API parity: the vearch REST verbs
  * `POST /document/search` and `POST /document/query` compiled from their
  * request JSON straight to a DataFrame plan (reference parse path:
  * requestToPb internal/router/document/doc_query.go:1402-1584,
  * queryRequestToPb :1254-1400).
  *
  * Covered request surface:
  *  - `vectors`: per-field query vector(s); a flat feature array of
  *    req_num×dim becomes a BATCH of req_num queries (doc_query.go:296-318)
  *  - multi-field vector conditions → docid intersection + WeightedRanker
  *  - `filters` (AND/OR range/term tree) → scalar pre-filter
  *  - `min_score`/`max_score` per vector condition
  *  - `limit` (default 50, doc_query.go:43), `offset` / page_size+page_num
  *  - `fields` projection: default all scalars, `_id` always included,
  *    vectors only when `vector_value:true` (doc_query.go:1416-1459)
  *  - `is_brute_search` accepted (0/1/2 — this FLAT path is always exact)
  *  - normalization of query vectors for fields with format=normalization
  *    (client.go:603-665)
  *  - `document_ids` point lookups preserving request order
  * L2 sorts ascending, IP descending (doc_query.go:1526-1528).
  */
object SearchApi {

  final case class VecCond(
      field: String,
      queries: Seq[Seq[Float]],
      minScore: Option[Double],
      maxScore: Option[Double])

  final case class SearchRequest(
      vectors: Seq[VecCond],
      filter: Option[String],     // raw filters JSON subtree
      fields: Option[Seq[String]],
      vectorValue: Boolean,
      limit: Int,
      offset: Int,
      weights: Option[Seq[Double]],
      isBruteSearch: Int,
      sort: Seq[(String, Boolean)], // (field, ascending) — sortorder/parse.go:24-36
      // search-time index params (doc_query.go:1408-1478: request
      // `index_params` overrides the space's at query time, e.g. nprobe)
      indexParams: Map[String, Int] = Map.empty)

  /** Slow-search classification (doc_query.go:218-234): big topN, deep
    * probing, or many filters → isolate in a separate scheduler pool.
    * Returns the pool name to set via
    * sparkContext.setLocalProperty("spark.scheduler.pool", _).
    */
  def classifyPool(limit: Int, nprobe: Int, ncentroids: Int, nFilters: Int): String =
    classify(limit, nprobe, ncentroids, nFilters, slowMs = 1000L)

  /** Space-aware classification: the per-space `slow_search_time`
    * (space.go:156-164, default 1000 ms) scales the big-topN bar — a space
    * that declares a tighter latency budget isolates sooner.
    */
  def classifyPool(space: Space, limit: Int, nprobe: Int, ncentroids: Int,
      nFilters: Int): String =
    classify(limit, nprobe, ncentroids, nFilters, space.config.slowSearchTimeMs)

  private def classify(limit: Int, nprobe: Int, ncentroids: Int,
      nFilters: Int, slowMs: Long): String = {
    val bigTopN = math.max(1L, 500L * slowMs / 1000L)
    if (limit >= bigTopN || (ncentroids > 0 && nprobe >= ncentroids / 10) ||
        nFilters >= 3) "slow"
    else "default"
  }

  private def doubleOf(v: JValue): Option[Double] = v match {
    case JDouble(d) => Some(d)
    case JInt(i)    => Some(i.toDouble)
    case JDecimal(d) => Some(d.toDouble)
    case _ => None
  }

  def parseSearch(json: String, space: Space): SearchRequest = {
    val j = JsonMethods.parse(json)
    val dims: Map[String, Int] = space.vectorFields
      .map(f => f.name -> f.vector.get.dimension).toMap
    val vecs = (j \ "vectors") match {
      case JArray(vs) => vs.map { v =>
        val field = (v \ "field") match {
          case JString(s) => s
          case _ => throw new IllegalArgumentException("vector condition needs field")
        }
        val dim = dims.getOrElse(field,
          throw new IllegalArgumentException(s"$field is not a vector field"))
        val flat = (v \ "feature") match {
          case JArray(xs) => xs.map {
            case JDouble(d) => d.toFloat
            case JInt(i)    => i.toFloat
            case JDecimal(d) => d.toFloat
            case other => throw new IllegalArgumentException(s"bad feature value $other")
          }
          case _ => throw new IllegalArgumentException("vector condition needs feature")
        }
        // req_num queries ride in one flat array (doc_query.go:296-318)
        if (flat.isEmpty || flat.size % dim != 0)
          throw new IllegalArgumentException(
            s"feature length ${flat.size} not a multiple of dimension $dim")
        VecCond(field, flat.grouped(dim).toSeq,
          doubleOf(v \ "min_score"), doubleOf(v \ "max_score"))
      }
      case _ => Seq.empty
    }
    val filter = (j \ "filters") match {
      case JNothing => None
      case f => Some(JsonMethods.compact(JsonMethods.render(f)))
    }
    val fields = (j \ "fields") match {
      case JArray(fs) => Some(fs.collect { case JString(s) => s })
      case _ => None
    }
    val vectorValue = (j \ "vector_value") match {
      case JBool(b) => b; case _ => false
    }
    val limit = (j \ "limit") match { case JInt(n) => n.toInt; case _ => 50 }
    // page_size/page_num slicing (client.go:888-899) or plain offset
    val offset = ((j \ "page_size"), (j \ "page_num")) match {
      case (JInt(ps), JInt(pn)) if pn.toInt > 0 => ps.toInt * (pn.toInt - 1)
      case _ => (j \ "offset") match { case JInt(o) => o.toInt; case _ => 0 }
    }
    val weights = (j \ "ranker" \ "params" \ "weights") match {
      case JArray(ws) => Some(ws.flatMap(doubleOf))
      case _ => None
    }
    val brute = (j \ "is_brute_search") match { case JInt(b) => b.toInt; case _ => 2 }
    // sort spec (internal/ps/engine/sortorder/parse.go:24-36): an array of
    // bare field names (ascending) or {field: {order: asc|desc}} objects;
    // "_score" is addressable like a field
    val sort: Seq[(String, Boolean)] = (j \ "sort") match {
      case JArray(items) => items.flatMap {
        case JString(f) => Seq((f, true))
        case JObject(fs) => fs.map { case (name, spec) =>
          val asc = (spec \ "order") match {
            case JString(o) => !o.equalsIgnoreCase("desc")
            case _ => true
          }
          (name, asc)
        }
        case _ => Seq.empty
      }
      case _ => Seq.empty
    }
    val reqIndexParams: Map[String, Int] = (j \ "index_params") match {
      case JObject(kvs) => kvs.collect { case (k, JInt(v)) => k -> v.toInt }.toMap
      case _ => Map.empty
    }
    SearchRequest(vecs, filter, fields, vectorValue, limit, offset, weights,
      brute, sort, reqIndexParams)
  }

  private def sortCols(sort: Seq[(String, Boolean)]): Seq[Column] =
    sort.map { case (f, asc) => if (asc) col(f).asc else col(f).desc }

  /** Re-order a (projected) search response by the sort spec, failing
    * LOUD when a sort field is not among the result's columns — a
    * multi-field result carries only (_id, _score), and silently ignoring
    * the spec would differ from the single-field surface.
    */
  private def applySort(df: DataFrame, sort: Seq[(String, Boolean)],
      qid: Option[Column] = None): DataFrame = {
    val missing = sort.map(_._1).filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"sort field(s) ${missing.mkString(", ")} not in result columns " +
        s"[${df.columns.mkString(", ")}]")
    df.orderBy(qid.map(_.asc).toSeq ++ sortCols(sort) :+ col("_id").asc: _*)
  }

  private def arrayFields(space: Space): Set[String] =
    space.fields.filter(_.kind == FieldKind.StringArrayK).map(_.name).toSet

  private def dateFields(space: Space): Set[String] =
    space.fields.filter(_.kind == FieldKind.DateK).map(_.name).toSet

  private def metricOf(space: Space, field: String): String =
    space.vectorFields.find(_.name == field)
      .flatMap(_.vector).map(_.metric).getOrElse("l2")

  private def valueTypeOf(space: Space, field: String): String =
    space.vectorFields.find(_.name == field)
      .flatMap(_.vector).map(_.valueType).getOrElse("float")

  private def maybeNormalize(space: Space, field: String, q: Seq[Float]): Seq[Float] = {
    val normalized = space.vectorFields.find(_.name == field)
      .flatMap(_.vector).exists(_.normalized)
    if (!normalized) q
    else {
      val n = math.sqrt(q.map(x => x.toDouble * x.toDouble).sum)
      if (n == 0.0) q else q.map(x => (x / n).toFloat)
    }
  }

  /** Projection per the reference rules: requested fields (plus `_id`), or
    * all scalar fields; vector columns only when vector_value.
    */
  private def projection(space: Space, req: SearchRequest, extra: Seq[String]): Seq[Column] = {
    val vectorNames = space.vectorFields.map(_.name).toSet
    val base = req.fields match {
      case Some(fs) =>
        val withId = if (fs.contains("_id")) fs else "_id" +: fs
        withId.filterNot(f => vectorNames.contains(f) && !req.vectorValue)
      case None =>
        val scalars = space.fields.filterNot(f => vectorNames.contains(f.name)).map(_.name)
        val all = "_id" +: scalars
        if (req.vectorValue) all ++ space.vectorFields.map(_.name) else all
    }
    (base ++ extra).map(col)
  }

  /** `POST /document/search` → DataFrame. Output carries `_score` (and
    * `_qid` for batched requests).
    */
  def search(corpus: DataFrame, space: Space, requestJson: String): DataFrame = {
    val req = parseSearch(requestJson, space)
    require(req.vectors.nonEmpty, "search request needs at least one vector condition")
    val pred = req.filter.map(
      VearchFilters.parse(_, arrayFields(space), dateFields(space)))

    if (req.vectors.size == 1 && req.vectors.head.queries.size == 1) {
      val vc = req.vectors.head
      val q = maybeNormalize(space, vc.field, vc.queries.head)
      // the field's value_type picks the distance path (index_model.h:19):
      // float → metric kernels; int8 → request floats quantized with the
      // SAME symmetric quantizer as ingest, integer-accumulate kernels;
      // binary → request floats sign-binarized, Hamming ascending
      val result = valueTypeOf(space, vc.field) match {
        case "int8" =>
          val qBytes = graft.functions.VecKernels.quantizeI8(
            new org.apache.spark.sql.catalyst.util.GenericArrayData(q.toArray))
          Knn.searchInt8(corpus, col(vc.field), qBytes,
            req.limit + req.offset, metricOf(space, vc.field),
            filter = pred, minScore = vc.minScore, maxScore = vc.maxScore,
            tieBreak = Some(col("_id")))
        case "binary" =>
          val qCode = graft.functions.VecKernels.signBits(
            new org.apache.spark.sql.catalyst.util.GenericArrayData(q.toArray))
          Knn.searchBinary(corpus, col(vc.field), qCode,
            req.limit + req.offset, filter = pred,
            minScore = vc.minScore, maxScore = vc.maxScore,
            tieBreak = Some(col("_id")))
        case _ =>
          Knn.search(corpus, col(vc.field), q,
            req.limit + req.offset, metricOf(space, vc.field),
            filter = pred, minScore = vc.minScore, maxScore = vc.maxScore,
            tieBreak = Some(col("_id")))
      }
      val sliced = if (req.offset > 0) result.offset(req.offset) else result
      val projected = sliced.select(projection(space, req, Seq("_score")): _*)
      // sort spec re-orders the RESPONSE (selection stays score-driven,
      // the reference's sortorder applies to the result set)
      if (req.sort.nonEmpty) applySort(projected, req.sort)
      else projected
    } else if (req.vectors.size > 1 && req.vectors.head.queries.size == 1) {
      // multi-field conjunctive: per-field top-k, id intersection, weighted;
      // each field scored with its OWN metric_type (vector_manager.cc:1024-1087)
      require(req.vectors.forall(_.queries.size == 1),
        "all vector conditions must carry the same req_num")
      val filtered = pred.map(corpus.filter).getOrElse(corpus)
      // each condition scores through its FIELD's value-type path
      // (index_model.h:19): float → metric kernels; int8 → quantized
      // query + integer kernels; binary → sign code + Hamming (ascending,
      // so the field's direction entry is l2). maybeNormalize is a no-op
      // for non-float fields (normalization validates float-only).
      val fields = req.vectors.map { vc =>
        val m = valueTypeOf(space, vc.field) match {
          case "binary" => "l2"
          case _        => metricOf(space, vc.field)
        }
        (col(vc.field), maybeNormalize(space, vc.field, vc.queries.head), m)
      }
      val scoreFns: Seq[Option[Column => Column]] = req.vectors.map { vc =>
        valueTypeOf(space, vc.field) match {
          case "int8" =>
            val qBytes = graft.functions.VecKernels.quantizeI8(
              new org.apache.spark.sql.catalyst.util.GenericArrayData(
                vc.queries.head.toArray))
            Some((c: Column) =>
              Knn.scoreInt8(metricOf(space, vc.field), c, lit(qBytes)))
          case "binary" =>
            val qCode = graft.functions.VecKernels.signBits(
              new org.apache.spark.sql.catalyst.util.GenericArrayData(
                vc.queries.head.toArray))
            Some((c: Column) =>
              graft.Graft.F.hamming(c, lit(qCode)).cast("double"))
          case _ => None
        }
      }
      // perFieldK scales with limit like the engine's per-index topn;
      // per-condition min/max gates apply in-scan before each field's
      // bounded top-k (gamma_common_data.h:94-96), matching the batched
      // multi-field path's pre-selection gates
      val ranked = Knn.multiVectorSearchMetrics(filtered, "_id", fields,
        perFieldK = math.max(req.limit * 10, 200), k = req.limit + req.offset,
        weights = req.weights,
        gates = req.vectors.map(vc => (vc.minScore, vc.maxScore)),
        scoreFns = scoreFns)
      val sliced = if (req.offset > 0) ranked.offset(req.offset) else ranked
      val projected = sliced.select(col("_id"), col("_score"))
      if (req.sort.nonEmpty) applySort(projected, req.sort)
      else projected
    } else if (req.vectors.size > 1) {
      // batched (req_num > 1) multi-field: per-field BATCH top-k with that
      // field's metric → (qid, id) intersection → WeightedRanker → per-qid
      // top-k. One result block per query id, like the single-field batch.
      val reqNum = req.vectors.head.queries.size
      require(req.vectors.forall(_.queries.size == reqNum),
        "all vector conditions must carry the same req_num")
      val spark = corpus.sparkSession
      import spark.implicits._
      val filtered = pred.map(corpus.filter).getOrElse(corpus)
      val nf = req.vectors.size
      val w = req.weights.getOrElse(Seq.fill(nf)(1.0 / nf))
      require(w.size == nf, "weights arity must match vector conditions")
      val perFieldK = math.max(req.limit * 10, 200)
      // per-condition value-type dispatch like the single-query
      // conjunction (index_model.h:19): int8 legs quantize each query
      // and score with the integer kernels, binary legs sign-binarize
      // and rank by Hamming (ascending ⇒ direction entry l2)
      def legDir(vc: graft.api.SearchApi.VecCond): String =
        valueTypeOf(space, vc.field) match {
          case "binary" => "l2"
          case _        => metricOf(space, vc.field)
        }
      val perField = req.vectors.zipWithIndex.map { case (vc, i) =>
        val m = legDir(vc)
        val (queries, scoreFn):
            (org.apache.spark.sql.DataFrame, Option[(Column, Column) => Column]) =
          valueTypeOf(space, vc.field) match {
            case "int8" =>
              val qd = vc.queries.zipWithIndex.map { case (q, qi) =>
                (qi.toLong, graft.functions.VecKernels.quantizeI8(
                  new org.apache.spark.sql.catalyst.util.GenericArrayData(q.toArray)))
              }.toDF("_qid", "_qv")
              val mm = metricOf(space, vc.field)
              (qd, Some((a: Column, b: Column) => Knn.scoreInt8(mm, a, b)))
            case "binary" =>
              val qd = vc.queries.zipWithIndex.map { case (q, qi) =>
                (qi.toLong, graft.functions.VecKernels.signBits(
                  new org.apache.spark.sql.catalyst.util.GenericArrayData(q.toArray))
                  .asInstanceOf[Array[Byte]])
              }.toDF("_qid", "_qv")
              (qd, Some((v: Column, qc: Column) =>
                graft.Graft.F.hamming(v, qc).cast("double")))
            case _ =>
              (vc.queries.zipWithIndex
                .map { case (q, qi) => (qi.toLong, maybeNormalize(space, vc.field, q)) }
                .toDF("_qid", "_qv")
                .select(col("_qid"), col("_qv").cast("array<float>").as("_qv")),
                None)
          }
        Knn.searchBatch(filtered, col(vc.field), struct(col("_id")), queries,
          "_qid", "_qv", perFieldK, m,
          minScore = vc.minScore, maxScore = vc.maxScore, scoreFn = scoreFn)
          .select(col("_qid"), col("_item._id").as("_id"), col("_score").as(s"_s$i"))
      }
      val joined = perField.reduceLeft((a, b) => a.join(b, Seq("_qid", "_id")))
      val combined = (0 until nf).map(i => col(s"_s$i") * lit(w(i))).reduceLeft(_ + _)
      val headAsc = Knn.ascending(legDir(req.vectors.head))
      val agged = joined.withColumn("_score", combined)
        .groupBy(col("_qid"))
        .agg(graft.Graft.F.topK(col("_score"), struct(col("_id")),
          req.limit + req.offset, headAsc).as("_tk"))
      val sliced =
        if (req.offset > 0) agged.withColumn("_tk", slice(col("_tk"), req.offset + 1, req.limit))
        else agged
      val out = sliced.select(col("_qid"), explode(col("_tk")).as("_e"))
        .select(col("_qid"), col("_e.item._id").as("_id"), col("_e.score").as("_score"))
      // sort spec re-orders rows WITHIN each query's block
      if (req.sort.nonEmpty) applySort(out, req.sort, qid = Some(col("_qid")))
      else out
    } else {
      // one field, req_num > 1 → batch: one result block per query id
      val vc = req.vectors.head
      val metric = metricOf(space, vc.field)
      val spark = corpus.sparkSession
      import spark.implicits._
      // value_type dispatch, like the single-query path: int8 queries
      // quantize with the ingest quantizer and score with the integer
      // kernels; binary queries sign-binarize and rank by Hamming
      val (queries, m, scoreFn):
          (DataFrame, String, Option[(Column, Column) => Column]) =
        valueTypeOf(space, vc.field) match {
          case "int8" =>
            val qd = vc.queries.zipWithIndex.map { case (q, i) =>
              (i.toLong, graft.functions.VecKernels.quantizeI8(
                new org.apache.spark.sql.catalyst.util.GenericArrayData(q.toArray)))
            }.toDF("_qid", "_qv")
            (qd, metric,
              Some((a: Column, b: Column) => Knn.scoreInt8(metric, a, b)))
          case "binary" =>
            val qd = vc.queries.zipWithIndex.map { case (q, i) =>
              (i.toLong, graft.functions.VecKernels.signBits(
                new org.apache.spark.sql.catalyst.util.GenericArrayData(q.toArray))
                .asInstanceOf[Array[Byte]])
            }.toDF("_qid", "_qv")
            ((qd, "l2", // hamming ⇒ asc
              Some((v: Column, qc: Column) =>
                graft.Graft.F.hamming(v, qc).cast("double"))))
          case _ =>
            (vc.queries.zipWithIndex
              .map { case (q, i) => (i.toLong, maybeNormalize(space, vc.field, q)) }
              .toDF("_qid", "_qv")
              .select(col("_qid"), col("_qv").cast("array<float>").as("_qv")),
              metric, None)
        }
      val filtered = pred.map(corpus.filter).getOrElse(corpus)
      val payload = struct(corpus.columns.map(col).toIndexedSeq: _*)
      // gates + pagination inside the batch operator (pre-selection gate,
      // per-qid offset slice) — same semantics as the single-query path
      val res = Knn.searchBatch(filtered, col(vc.field), payload, queries,
        "_qid", "_qv", req.limit, m,
        minScore = vc.minScore, maxScore = vc.maxScore, offset = req.offset,
        scoreFn = scoreFn)
      val flat = res.select(col("_qid"), col("_score"), col("_item.*"))
      val projected = flat.select(projection(space, req, Seq("_qid", "_score")): _*)
      // sort spec re-orders rows WITHIN each query's block
      if (req.sort.nonEmpty) applySort(projected, req.sort, qid = Some(col("_qid")))
      else projected
    }
  }

  /** Index-routed search — the reference's planner switch
    * (is_brute_search 0/2 serve from the declared index when one is READY,
    * 1 forces the brute scan; engine.cc:280-308). Routes a
    * single-condition float search by the field's declared `index.type`:
    *
    *  - HNSW → the graph generation built by
    *    [[IndexLifecycle.rebuildHnsw]], `efSearch` from the space's index
    *    params; scalar filters ride the broadcast allow-set into the walk
    *    (the reference's filter-bitmap functor). Needs an integral id.
    *  - IVFFLAT → the `list_id` generation built by
    *    [[IndexLifecycle.rebuild]]; `nprobe` resolves request
    *    `index_params` → space params → the model default 80
    *    (IVFFlatModelParams, gamma_index_ivfflat.cc:52-54), capped at
    *    ncentroids; scalar filters evaluate inside the probed lists.
    *
    * Everything else — score gates, batched req_num, multi-field
    * conjunctions, a missing/BUILDING generation, is_brute_search=1 —
    * falls back to the exact FLAT path of [[search]], the same degrade
    * the reference performs below training_threshold.
    */
  /** Cap on the broadcast allow-set a filtered HNSW walk may collect to
    * the driver. Above it the planner falls back to filter-first brute
    * force — the reference's broad-filter switch (engine.cc:355-373): a
    * non-selective filter at fleet scale would otherwise collect billions
    * of ids driver-side. ~1M longs ≈ 8 MB broadcast.
    */
  @volatile var maxFilterAllowIds: Int = 1 << 20

  /** Anti-filter a served layout by the delete ledger: tiny ledgers ride
    * a NOT-IN scan predicate (parquet-pushable); bigger ones a broadcast
    * anti-join. The ledger is bounded by one rebuild interval's deletes,
    * never the corpus (IndexLifecycle prunes it at each READY flip).
    */
  private def applyDeny(table: DataFrame, deny: Set[Long],
      ridName: String = "_id"): DataFrame =
    if (deny.isEmpty) table
    else if (deny.size <= 1000) table.filter(!col(ridName).isin(deny.toSeq: _*))
    else {
      val spark = table.sparkSession
      import spark.implicits._
      val denyDf = deny.toSeq.toDF("_deny_id")
        .select(col("_deny_id").cast(table.schema(ridName).dataType))
      table.join(broadcast(denyDf), col(ridName) === col("_deny_id"), "left_anti")
    }

  /** `tail` is the space's realtime buffer (`enable_realtime` — the
    * reference merges the memory buffer into EVERY index type's search,
    * vector_manager.cc:941-1012,1096-1176): when present and non-empty,
    * every routed arm serves base-index ∪ brute-tail — single queries
    * through [[graft.streaming.RealtimeTail.mergeTail]], batched
    * (req_num) requests through the per-qid
    * [[graft.streaming.RealtimeTail.mergeTailBatch]] — payload joins hit
    * the LIVE view (base ∪ tail), and any shape without a tail-aware
    * route (multi-field conjunctions, non-integral ids) falls back to
    * the exact FLAT path over the live view — fresh writes are never
    * invisible, whatever the route.
    */
  def searchAuto(corpus: DataFrame, space: Space, requestJson: String,
      lifecycle: IndexLifecycle,
      tail: Option[graft.streaming.RealtimeTail] = None): DataFrame = {
    val req = parseSearch(requestJson, space)
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val idIntegral = corpus.schema.fields.find(_.name == "_id").exists(f =>
      f.dataType == LongType || f.dataType == IntegerType)
    // ROUTING id — the long column index hits, delete-ledger entries and
    // tail merges reference: the integral PK itself, or the `_docid`
    // sidecar the ingest assigns to string-PK spaces
    // ([[Ingest.assignDocids]] — the reference maps every string `_id`
    // to a dense int docid at ingest so indexes never see strings,
    // engine.cc:730-745, and auto-generates string UUIDs when `_id` is
    // absent, client.go:1197-1221). A string-PK space WITHOUT the
    // sidecar keeps the exact FLAT fallback.
    val rid: Option[String] =
      if (idIntegral) Some("_id")
      else corpus.schema.fields.find(_.name == "_docid")
        .filter(_.dataType == LongType).map(_.name)
    val tailOn = tail.exists(_.hasTail)
    // the view a realtime search answers over: base ∪ buffered tail
    // (id-level last-write-wins) — identical to `corpus` when no tail.
    // The tail leg is delete-gated with the FULL ledger so a doc deleted
    // while buffered never resurfaces through a fallback shape (the
    // routed arms gate with their generation's `deletedSince` — this
    // keeps delete visibility consistent across every query shape).
    val live =
      if (tailOn) tail.get.snapshot(corpus.schema, lifecycle.allDeletes())
      else corpus
    // routed tail merges bridge index hit ids (longs) back to the live
    // view; a space with neither an integral `_id` nor a `_docid`
    // sidecar can't ride them — serve the live view exactly
    if (tailOn && rid.isEmpty) return search(live, space, requestJson)
    // the routing column's name for the arms below; "_id" when no
    // routing column exists (those arms never bridge — and a space
    // without a routing column cannot have recorded deletes, so the
    // `_id`-keyed deny gates stay no-ops there)
    val ridName = rid.getOrElse("_id")
    // a tail constructed with a different routing column would anti-join
    // base hits against the wrong id space — fail loud, not ghost-quietly
    require(!tailOn || tail.get.routingCol == ridName,
      s"realtime tail routes on '${tail.get.routingCol}' but the space " +
        s"routes on '$ridName' — construct the RealtimeTail with " +
        s"ridCol = Some(\"$ridName\")")
    // routable = single-condition search; the batched (req_num > 1)
    // variant routes too — the reference flattens req_num queries into
    // one index request (doc_query.go:296-318), and brute-forcing the
    // batch is the shape that falls over first at scale. Score gates
    // (min_score/max_score) ride every routed arm, single AND batched:
    // scan-shaped families (IVF/BinaryIVF/RaBitQ/PQ/SCANN) apply them
    // IN-SCAN before their bounded top-k — the reference's exact shape
    // (gamma_common_data.h:94-96) — and the beam-limited graph families
    // (HNSW/Vamana) over-fetch through the driver-bounded gate loops
    // below.
    val routable = req.isBruteSearch != 1 && req.vectors.size == 1
    val gatesEmpty = req.vectors.forall(v =>
      v.minScore.isEmpty && v.maxScore.isEmpty)
    // the single-condition request's score gate, threaded into every
    // scan-family search and brute tail leg (None for multi-field
    // requests — gated conjunctions keep the FLAT fallback)
    val (gMin, gMax): (Option[Double], Option[Double]) =
      if (req.vectors.size == 1)
        (req.vectors.head.minScore, req.vectors.head.maxScore)
      else (None, None)
    val vopts = if (req.vectors.size == 1)
      space.vectorFields.find(_.name == req.vectors.head.field).flatMap(_.vector)
    else None
    val floatField = vopts.exists(_.valueType == "float")
    val single = routable && floatField && req.vectors.head.queries.size == 1
    val batched = routable && floatField &&
      req.vectors.head.queries.size > 1

    def pred = req.filter.map(
      VearchFilters.parse(_, arrayFields(space), dateFields(space)))
    def finish(hits: DataFrame, metric: String): DataFrame = {
      val primary =
        if (Knn.ascending(metric)) col("_score").asc else col("_score").desc
      val ordered = hits.orderBy(primary, col("_id"))
      val sliced = if (req.offset > 0) ordered.offset(req.offset) else ordered
      val projected = sliced.select(projection(space, req, Seq("_score")): _*)
      if (req.sort.nonEmpty) applySort(projected, req.sort) else projected
    }
    // per-qid finish for the batched routes: offset slices WITHIN each
    // query's block (row_number over ≤ req_num·(k+offset) hit rows — tiny)
    def finishBatch(hits: DataFrame, metric: String): DataFrame = {
      val primary =
        if (Knn.ascending(metric)) col("_score").asc else col("_score").desc
      val sliced =
        if (req.offset > 0) {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("_qid")).orderBy(primary, col("_id").asc)
          hits.withColumn("_rn", row_number().over(w))
            .filter(col("_rn") > req.offset).drop("_rn")
        } else hits
      val projected = sliced
        .orderBy(col("_qid").asc, primary, col("_id").asc)
        .select(projection(space, req, Seq("_qid", "_score")): _*)
      if (req.sort.nonEmpty) applySort(projected, req.sort, qid = Some(col("_qid")))
      else projected
    }
    // score-gated GRAPH serving (min_score/max_score per vector
    // condition, doc_query.go:67-78): the beam-limited walk families
    // (HNSW/Vamana) can't gate exactly in-walk — instead the arm
    // over-fetches (depth doubling from 4k) and gates DISTRIBUTEDLY: each
    // probe runs ONE action aggregating (total candidate count, gated
    // top-k) through the bounded TopKAgg heap, so the driver receives one
    // count plus ≤ k (vec_id, _score) pairs per probe — never a
    // depth-or-corpus-sized collect, whatever the gate's selectivity.
    // Exactness: k gated survivors inside the ungated top-depth dominate
    // every candidate beyond it; a candidate count SHORTER than depth
    // proves every admissible candidate was already seen — either way the
    // gated top-k equals the FLAT path's gate-before-select. Ungated
    // requests bypass the loop entirely (hitsAt(k), zero extra actions).
    // Scan-shaped families never come here: they gate IN-SCAN
    // (gamma_common_data.h:94-96) inside their operators.
    def gateLoop(k: Int, metric: String)(hitsAt: Int => DataFrame): DataFrame = {
      val vc = req.vectors.head
      gateLoopGates(k, metric, vc.minScore, vc.maxScore)(hitsAt)
    }
    // gate-parameterized core: the single-condition arm passes the
    // request's gate; the multi-field conjunctive legs pass EACH
    // CONDITION's own gate (the reference gates per condition before the
    // docid intersection, gamma_common_data.h:94-96)
    def gateLoopGates(k: Int, metric: String, minScore: Option[Double],
        maxScore: Option[Double])(hitsAt: Int => DataFrame): DataFrame = {
      if (minScore.isEmpty && maxScore.isEmpty) return hitsAt(k)
      val spark = corpus.sparkSession
      import spark.implicits._
      val lo = minScore.getOrElse(Double.NegativeInfinity)
      val hi = maxScore.getOrElse(Double.PositiveInfinity)
      val asc = Knn.ascending(metric)
      var depth = math.max(4 * k, 64)
      var result: Option[Seq[(Long, Double)]] = None
      while (result.isEmpty) {
        // ONE bounded action: TopKAgg skips null scores, so the `when`
        // drops out-of-gate candidates before the k-bounded heap
        val row = hitsAt(depth)
          .select(col("vec_id").cast("long").as("vec_id"), col("_score"))
          .agg(count(lit(1)).as("_n"),
            graft.Graft.F.topK(
              when(col("_score").between(lo, hi), col("_score")),
              col("vec_id"), k, asc).as("_tk"))
          .head()
        val n = row.getLong(0)
        val gated = row.getSeq[org.apache.spark.sql.Row](1)
          .map(e => (e.getLong(1), e.getDouble(0)))
        if (gated.size >= k || n < depth || depth >= Int.MaxValue / 2)
          result = Some(gated)
        else depth *= 2
      }
      result.get.toDF("vec_id", "_score")
    }
    // batched variant (req_num queries share the condition's gate —
    // doc_query.go:296-318 flattens them into one request): hitsAt(d)
    // returns per-qid top-d (_qid, vec_id, _score); each probe's single
    // action aggregates per-qid (count, gated top-k) — ≤ req_num rows of
    // ≤ k entries on the driver. The loop continues until EVERY query
    // has k gated survivors or is exhausted; queries already satisfied
    // at a lower depth stay exact at higher depths (more candidates
    // never change the gated top-k once it dominates).
    def gateBatchLoop(k: Int, metric: String)(hitsAt: Int => DataFrame): DataFrame = {
      val vc = req.vectors.head
      gateBatchLoopGates(k, metric, vc.minScore, vc.maxScore)(hitsAt)
    }
    // gate-parameterized core (see [[gateLoopGates]]): the batched
    // multi-field conjunctive legs pass each CONDITION's own gate
    def gateBatchLoopGates(k: Int, metric: String, minScore: Option[Double],
        maxScore: Option[Double])(hitsAt: Int => DataFrame): DataFrame = {
      if (minScore.isEmpty && maxScore.isEmpty) return hitsAt(k)
      val spark = corpus.sparkSession
      import spark.implicits._
      val lo = minScore.getOrElse(Double.NegativeInfinity)
      val hi = maxScore.getOrElse(Double.PositiveInfinity)
      val asc = Knn.ascending(metric)
      var depth = math.max(4 * k, 64)
      var result: Option[Seq[(Long, Long, Double)]] = None
      while (result.isEmpty) {
        val rows = hitsAt(depth)
          .select(col("_qid").cast("long").as("_qid"),
            col("vec_id").cast("long").as("vec_id"), col("_score"))
          .groupBy(col("_qid"))
          .agg(count(lit(1)).as("_n"),
            graft.Graft.F.topK(
              when(col("_score").between(lo, hi), col("_score")),
              col("vec_id"), k, asc).as("_tk"))
          .collect()
        val done = rows.forall { r =>
          r.getSeq[org.apache.spark.sql.Row](2).size >= k || r.getLong(1) < depth
        } || depth >= Int.MaxValue / 2
        if (done)
          result = Some(rows.toSeq.flatMap { r =>
            val qid = r.getLong(0)
            r.getSeq[org.apache.spark.sql.Row](2)
              .map(e => (qid, e.getLong(1), e.getDouble(0)))
          })
        else depth *= 2
      }
      result.get.toDF("_qid", "vec_id", "_score")
    }
    // the walk returns (id, score); scalar payloads come from ONE
    // broadcast join of the ≤req_num·k hits back onto the LIVE view (a
    // tail hit's payload lives in the buffer, not the base table). The
    // join keys on the ROUTING column — for a string-PK space that is
    // the `_docid` sidecar, and the joined row carries the string `_id`
    // the projection serves (the reference's docid→PK bridge).
    def joinBack(hits: DataFrame, extra: Seq[Column] = Seq.empty): DataFrame = {
      val idT = corpus.schema(ridName).dataType
      live.join(broadcast(hits.select(
        Seq(col("vec_id").cast(idT).as(ridName), col("_score")) ++ extra: _*)),
        ridName)
    }
    // realtime union for a routed single-query arm: `baseSearch(kBase)`
    // must return (vec_id, _score) hits from the index at the
    // over-fetched depth; `tailSearch` brute-scores the deduped,
    // delete-gated tail. No tail ⇒ the plain index route, unchanged.
    def tailMergeWith(k: Int, metric: String, deny: Set[Long])(
        tailSearch: DataFrame => DataFrame)(
        baseSearch: Int => DataFrame): DataFrame =
      if (!tailOn) baseSearch(k)
      else tail.get.mergeTail(corpus.schema, k, metric, deny)(tailSearch)(baseSearch)
    // float-vector tail leg: exact metric scoring of the buffer (the
    // reference's memory-buffer FLAT scan), scalar pre-filter included.
    // `gated = true` (the scan-family arms) applies the request's score
    // gate in the tail scan too, so both legs feed the merge pre-gated
    // and the merged top-k IS the gated top-k; the graph arms pass
    // `gated = false` and gate post-merge inside the gate loops.
    def tailMerge(k: Int, metric: String, field: String, q: Seq[Float],
        deny: Set[Long], gated: Boolean = false)(
        baseSearch: Int => DataFrame): DataFrame =
      tailMergeWith(k, metric, deny) { td =>
        Knn.search(td, col(field), q, k, metric, filter = pred,
          minScore = if (gated) gMin else None,
          maxScore = if (gated) gMax else None,
          tieBreak = Some(col("_id")))
          .select(col(ridName).cast("long").as("vec_id"), col("_score"))
      }(baseSearch)
    // batched (req_num) realtime union: per-qid merge through
    // RealtimeTail.mergeTailBatch; baseSearch must return
    // (_qid, vec_id, _score)
    def tailMergeBatchWith(k: Int, metric: String, deny: Set[Long])(
        tailSearch: DataFrame => DataFrame)(
        baseSearch: Int => DataFrame): DataFrame =
      if (!tailOn) baseSearch(k)
      else tail.get.mergeTailBatch(corpus.schema, k, metric, deny)(tailSearch)(baseSearch)
    // float tail leg for batches: ONE Knn.searchBatch pass over the
    // (bounded) buffer serves every query; `gated` as in [[tailMerge]]
    def tailMergeBatch(k: Int, metric: String, field: String,
        queries: Seq[(Long, Seq[Float])], deny: Set[Long],
        gated: Boolean = false)(
        baseSearch: Int => DataFrame): DataFrame =
      tailMergeBatchWith(k, metric, deny) { td =>
        val spark = corpus.sparkSession
        import spark.implicits._
        val qDf = queries.toDF("_qid", "_qv")
          .select(col("_qid"), col("_qv").cast("array<float>").as("_qv"))
        val filtered = pred.map(td.filter).getOrElse(td)
        Knn.searchBatch(filtered, col(field), struct(col(ridName)), qDf,
          "_qid", "_qv", k, metric,
          minScore = if (gated) gMin else None,
          maxScore = if (gated) gMax else None)
          .select(col("_qid"),
            col(s"_item.$ridName").cast("long").as("vec_id"), col("_score"))
      }(baseSearch)
    // delete gate (the reference's deleted-bitmap check, engine.cc:869-899,
    // IsValid = candidate ∧ ¬deleted — gamma_common_data.h:94-105): ids
    // deleted SINCE the serving generation was built may still sit in its
    // layout — the ledger becomes the HNSW walk's allow-functor / the IVF
    // scan's anti-filter, so responses carry k LIVE docs: no ghosts, no
    // under-filled top-k
    def hnswDeny = lifecycle.hnswDeleteBaseline()
      .map(lifecycle.deletedSince).getOrElse(Set.empty)
    def ivfDeny = lifecycle.readyGen()
      .map(lifecycle.deletedSince).getOrElse(Set.empty)
    // request index_params override the space's at query time
    // (doc_query.go:1475-1522) — same resolution chain as nprobe
    def efOf(k: Int): Int = math.max(
      param("efSearch", vopts.get)
        .getOrElse(64), k)
    // one precedence chain for every index param: request index_params
    // override the field's space params (doc_query.go:1475-1522) — the
    // callers supply the default (and any cap) at the use site
    def param(name: String,
        opts: graft.schema.VectorOptions): Option[Int] =
      req.indexParams.get(name).filter(_ > 0)
        .orElse(opts.indexParams.get(name).filter(_ > 0))
    def nprobeOf(model: IvfIndex.Model): Int = math.min(
      param("nprobe", vopts.get)
        .getOrElse(80),
      model.ncentroids)
    // shared scaffold of the INT8 GRAPH arms (HNSW and Vamana differ
    // only in walk operators and depth params): quantize the request
    // ONCE, walk as the code values (the generations store the raw code
    // values widened to float, so walk distances equal the integer
    // kernels bit-for-bit — [[IndexLifecycle.rebuildHnswInt8]]), tail
    // legs in integer kernels, scalar filters through the one-take
    // selectivity switch, score gates through the driver-bounded loops.
    def i8GraphServe(deny: Set[Long])(
        walk: (Seq[Float], Int) => DataFrame)(
        walkBc: (Seq[Float], Int,
          org.apache.spark.broadcast.Broadcast[Set[Long]]) => DataFrame)(
        walkBatch: (Seq[(Long, Seq[Float])], Int,
          Option[Set[Long]]) => DataFrame): Option[DataFrame] = {
      val vc = req.vectors.head
      val metric = metricOf(space, vc.field)
      val k = req.limit + req.offset
      def qb(q: Seq[Float]): Array[Byte] =
        graft.functions.VecKernels.quantizeI8(
          new org.apache.spark.sql.catalyst.util.GenericArrayData(q.toArray))
      if (vc.queries.size == 1) {
        val qBytes = qb(vc.queries.head)
        val qWalk: Seq[Float] = qBytes.toSeq.map(_.toFloat)
        // int8 tail leg: integer kernels over the buffer, same quantized
        // query; ungated — the graph arms gate post-merge in the loop
        def tailLeg(d: Int)(td: DataFrame): DataFrame =
          Knn.searchInt8(td, col(vc.field), qBytes, d, metric,
            filter = pred, tieBreak = Some(col("_id")))
            .select(col(ridName).cast("long").as("vec_id"), col("_score"))
        val hits: Option[DataFrame] = pred match {
          case Some(p) =>
            // one bounded take() = selectivity probe + allow-set
            // collect; broad filters keep the filter-first FLAT
            // fallback (the planner switch, engine.cc:355-373)
            val probed = live.filter(p).select(col(ridName).cast("long"))
              .take(maxFilterAllowIds + 1)
            if (probed.length > maxFilterAllowIds) None
            else {
              val allowBc = corpus.sparkSession.sparkContext
                .broadcast(probed.map(_.getLong(0)).toSet -- deny)
              Some(gateLoop(k, metric)(d =>
                tailMergeWith(d, metric, deny)(tailLeg(d))(kb =>
                  walkBc(qWalk, kb, allowBc))))
            }
          case None =>
            Some(gateLoop(k, metric)(d =>
              tailMergeWith(d, metric, deny)(tailLeg(d))(kb =>
                walk(qWalk, kb))))
        }
        hits.map(h => finish(joinBack(h), metric))
      } else {
        val queries = vc.queries.zipWithIndex.map { case (q, i) =>
          (i.toLong, qb(q)) }
        val walkQs: Seq[(Long, Seq[Float])] = queries.map {
          case (qid, code) => (qid, code.toSeq.map(_.toFloat)) }
        val allow: Option[Option[Set[Long]]] = pred match {
          case Some(p) =>
            val probed = live.filter(p).select(col(ridName).cast("long"))
              .take(maxFilterAllowIds + 1)
            if (probed.length > maxFilterAllowIds) None
            else Some(Some(probed.map(_.getLong(0)).toSet))
          case None => Some(None)
        }
        allow.map { allowIds =>
          val hits = gateBatchLoop(k, metric)(d =>
            tailMergeBatchWith(d, metric, deny) { td =>
              val spark = corpus.sparkSession
              import spark.implicits._
              val qDf = queries.toDF("_qid", "_qb")
              val filtered = pred.map(td.filter).getOrElse(td)
              filtered
                .select(col(ridName).cast("long").as("vec_id"),
                  col(vc.field).as("_c"))
                .crossJoin(broadcast(qDf))
                .select(col("_qid"),
                  Knn.scoreInt8(metric, col("_c"), col("_qb")).as("_score"),
                  col("vec_id"))
                .filter(col("_score").isNotNull)
            } { kb => walkBatch(walkQs, kb, allowIds) })
          finishBatch(joinBack(hits, Seq(col("_qid"))), metric)
        }
      }
    }

    // ── multi-field conjunctive ROUTING (the reference searches each
    // field's OWN index and intersects docids, vector_manager.cc:859,
    // 1024-1087; with a live buffer it merges the buffer into the
    // PER-FIELD searches before the intersection, :1096-1176): routable
    // when every condition is a single-query float field. Scalar filters
    // ride each leg (in-scan for scan families, allow-functor for graph
    // families — the reference's hybrid path) and per-condition
    // min/max-score gates apply per leg before the intersection
    // (in-scan / gate loop, gamma_common_data.h:94-96). Each leg serves
    // through its field's OWN READY generation KIND — the
    // (vec_id, _score) intersection join is family-agnostic, so mixed
    // HNSW + IVF + Vamana conjunctions route too (the reference
    // intersects per-field results for any family combination). Per-field
    // generations live under the lifecycle's field scope
    // ([[IndexLifecycle.scoped]]); any field without a READY generation
    // (or with a family that has no per-field route) degrades the WHOLE
    // request to FLAT (a partial intersection of one indexed and one
    // brute leg would be no cheaper and harder to bound).
    val multiRouted: Option[DataFrame] =
      if (req.isBruteSearch != 1 && req.vectors.size > 1 &&
          req.vectors.forall(_.queries.size == 1) &&
          rid.isDefined &&
          // the reference intersects per-field results whatever each
          // field's value type AND family (index_model.h:19,
          // vector_manager.cc:1024-1087): float and binary legs route for
          // every family; INT8 legs route when the field's metric has an
          // integer kernel
          req.vectors.forall(vc => space.vectorFields.find(_.name == vc.field)
            .flatMap(_.vector).exists(v => v.valueType == "float" ||
              v.valueType == "binary" ||
              (v.valueType == "int8" &&
                Set("ip", "l2", "l2sq").contains(metricOf(space, vc.field)))))) {
        val perFieldK = math.max(req.limit * 10, 200)
        // scalar-FILTERED conjunctions route too (the reference's hybrid
        // path applies the filter bitmap inside EACH field's search,
        // vector_manager.cc:1024-1087 composed with the broad-filter
        // planner switch, engine.cc:355-373): scan-shaped legs (IVFFLAT)
        // evaluate the predicate IN-SCAN inside their probed lists; graph
        // legs (HNSW/Vamana) take it as an allow-functor, so ONE bounded
        // take probes selectivity AND collects the allow-set — shared by
        // every graph leg of the request. A broad filter
        // (> maxFilterAllowIds survivors) degrades the whole request to
        // filter-first brute FLAT, the same switch as the
        // single-condition arms. Probed from the LIVE view so fresh tail
        // rows matching the filter are admitted in every leg.
        val graphLegs = req.vectors.exists(vc =>
          space.vectorFields.find(_.name == vc.field).flatMap(_.vector)
            .map(_.indexType)
            .exists(t => t == "HNSW" || t == "DISKANN_STATIC" || t == "SSG"))
        val allowForGraph: Option[Option[Set[Long]]] = pred match {
          case Some(p) if graphLegs =>
            val probed = live.filter(p).select(col(ridName).cast("long"))
              .take(maxFilterAllowIds + 1)
            if (probed.length > maxFilterAllowIds) None
            else Some(Some(probed.map(_.getLong(0)).toSet))
          case _ => Some(None)
        }
        allowForGraph.flatMap { allow =>
        val legs: Seq[Option[DataFrame]] = req.vectors.map { vc =>
          val lcF = lifecycle.scoped(vc.field)
          val fOpts = space.vectorFields.find(_.name == vc.field)
            .flatMap(_.vector).get
          val q = maybeNormalize(space, vc.field, vc.queries.head)
          // binary legs rank by Hamming (ascending ⇒ direction entry l2,
          // like the FLAT conjunction's legDir)
          val isBin = fOpts.valueType == "binary"
          val metric = if (isBin) "l2" else metricOf(space, vc.field)
          // INT8 legs (index_model.h:19): the quantized query's code
          // values walk the raw-code-domain graph generations and the
          // integer kernels score the tail; the IVF leg probes with the
          // FLOAT query (centroids live in the de-quantized domain,
          // rebuildInt8) and scores in-scan with the integer kernels
          val isI8 = fOpts.valueType == "int8"
          val qBytes: Array[Byte] =
            if (isI8) graft.functions.VecKernels.quantizeI8(
              new org.apache.spark.sql.catalyst.util.GenericArrayData(q.toArray))
            else Array.emptyByteArray
          val qCode: Array[Byte] =
            if (isBin) graft.functions.VecKernels.signBits(
              new org.apache.spark.sql.catalyst.util.GenericArrayData(q.toArray))
              .asInstanceOf[Array[Byte]]
            else Array.emptyByteArray
          val qWalk: Seq[Float] = if (isI8) qBytes.toSeq.map(_.toFloat) else q
          // this field's buffer-over-index union BEFORE the docid
          // intersection — fresh writes compete in every leg. The scalar
          // filter and this CONDITION's score gate apply to the tail leg
          // in-scan; the graph legs' gate loop re-gates the merged
          // stream, a no-op for already-gated tail rows. `kArg` lets the
          // gate loop deepen the whole merged stream, not just the base.
          def withTail(deny: Set[Long], kArg: Int)(
              base: Int => DataFrame): DataFrame =
            if (!tailOn) base(kArg)
            else tail.get.mergeTail(corpus.schema, kArg, metric, deny) { td =>
              (if (isBin)
                Knn.searchBinary(td, col(vc.field), qCode, kArg,
                  filter = pred, minScore = vc.minScore,
                  maxScore = vc.maxScore, tieBreak = Some(col("_id")))
              else if (isI8)
                Knn.searchInt8(td, col(vc.field), qBytes, kArg, metric,
                  filter = pred, minScore = vc.minScore,
                  maxScore = vc.maxScore, tieBreak = Some(col("_id")))
              else
                Knn.search(td, col(vc.field), q, kArg, metric,
                  filter = pred, minScore = vc.minScore,
                  maxScore = vc.maxScore, tieBreak = Some(col("_id"))))
                .select(col(ridName).cast("long").as("vec_id"), col("_score"))
            }(base)
          fOpts.indexType match {
            case "HNSW" =>
              lcF.readyHnswSegments().map { segs =>
                val deny = lcF.hnswDeleteBaseline()
                  .map(lcF.deletedSince).getOrElse(Set.empty[Long])
                val ef = math.max(
                  param("efSearch", fOpts)
                    .getOrElse(64), perFieldK)
                // ONE allow broadcast per leg, hoisted out of the gate
                // loop's depth probes
                val allowBc = allow.map(a =>
                  corpus.sparkSession.sparkContext.broadcast(a -- deny))
                gateLoopGates(perFieldK, metric, vc.minScore, vc.maxScore)(
                  d => withTail(deny, d)(kb => allowBc match {
                    case Some(bc) =>
                      graft.operators.HnswIndex.searchFilteredBc(
                        segs, qWalk, kb, math.max(ef, kb), metric, bc)
                    case None =>
                      graft.operators.HnswIndex.search(segs, qWalk, kb,
                        math.max(ef, kb), metric, deny = deny)
                  }))
              }
            case "IVFFLAT" | "GPU_IVFFLAT" =>
              for (table <- lcF.readyIndex(); model <- lcF.loadModel(metric))
                yield {
                  val deny = lcF.readyGen()
                    .map(lcF.deletedSince).getOrElse(Set.empty[Long])
                  val served = applyDeny(table, deny, ridName)
                  val nprobe = math.min(
                    param("nprobe", fOpts)
                      .getOrElse(80),
                    model.ncentroids)
                  // scan leg: the predicate AND this condition's gate
                  // apply IN-SCAN inside the probed lists — zero
                  // over-fetch, no gate loop needed
                  withTail(deny, perFieldK)(kb =>
                    (if (isI8)
                      IvfIndex.searchInt8(served, col(vc.field), model, q,
                        qBytes, kb, nprobe, filter = pred,
                        minScore = vc.minScore, maxScore = vc.maxScore,
                        tieBreak = Some(col("_id")))
                    else
                      IvfIndex.search(served, col(vc.field), model, q, kb,
                        nprobe, filter = pred, minScore = vc.minScore,
                        maxScore = vc.maxScore, tieBreak = Some(col("_id"))))
                      .select(col(ridName).cast("long").as("vec_id"),
                        col("_score")))
                }
            case "DISKANN_STATIC" | "SSG" =>
              lcF.readyVamanaSegments().map { segs =>
                val deny = lcF.readyVamanaGen()
                  .map(lcF.deletedSince).getOrElse(Set.empty[Long])
                val l = math.max(
                  req.indexParams.get("l_search").filter(_ > 0)
                    .orElse(fOpts.indexParams.get("L").filter(_ > 0))
                    .getOrElse(100), perFieldK)
                val bw = param("beam_width", fOpts)
                  .getOrElse(4)
                val allowBc = allow.map(a =>
                  corpus.sparkSession.sparkContext.broadcast(a -- deny))
                gateLoopGates(perFieldK, metric, vc.minScore, vc.maxScore)(
                  d => withTail(deny, d)(kb => allowBc match {
                    case Some(bc) =>
                      graft.operators.VamanaIndex.searchFilteredBc(
                        segs, qWalk, kb, math.max(l, kb), bw, metric, bc)
                    case None =>
                      graft.operators.VamanaIndex.search(segs, qWalk, kb,
                        math.max(l, kb), bw, metric, deny = deny)
                  }))
              }
            // compressed scan legs (IVFPQ/SCANN): ADC shortlist inside
            // the probed lists, recall_num exact rerank — the predicate
            // and this condition's gate apply at the rerank heap, so no
            // gate loop. INT8 legs shortlist in the raw-code domain and
            // rerank with the integer kernels.
            case "IVFPQ" | "GPU_IVFPQ" | "IVFPQ_RELAYOUT" | "SCANN" =>
              val isScann = fOpts.indexType == "SCANN"
              val ready =
                if (isScann) lcF.readyScann(metric) else lcF.readyIvfPq(metric)
              ready.map { case (table, ivf, pq) =>
                val deny =
                  (if (isScann) lcF.readyScannGen() else lcF.readyPqGen())
                    .map(lcF.deletedSince).getOrElse(Set.empty[Long])
                val served0 = applyDeny(table, deny, ridName)
                val served = pred.map(served0.filter).getOrElse(served0)
                val nprobe = math.min(
                  param("nprobe", fOpts)
                    .getOrElse(80),
                  ivf.ncentroids)
                val recallNum = math.max(
                  param("recall_num", fOpts)
                    .getOrElse(if (isScann) math.max(10 * perFieldK, 100)
                    else perFieldK), perFieldK)
                withTail(deny, perFieldK)(kb =>
                  graft.operators.PqIndex.searchIvfResidual(served,
                    col(vc.field), ivf, pq, qWalk, kb, nprobe,
                    math.max(recallNum, kb), idCol = col("_id"),
                    minScore = vc.minScore, maxScore = vc.maxScore,
                    rerankInt8 = if (isI8) Some(qBytes) else None)
                    .select(col(ridName).cast("long").as("vec_id"),
                      col("_score")))
              }
            case "IVFRABITQ" =>
              lcF.readyIvfRabitq(metric).map { case (table, ivf) =>
                val deny = lcF.readyRbGen()
                  .map(lcF.deletedSince).getOrElse(Set.empty[Long])
                val served0 = applyDeny(table, deny, ridName)
                val served = pred.map(served0.filter).getOrElse(served0)
                val nprobe = math.min(
                  param("nprobe", fOpts)
                    .getOrElse(80),
                  ivf.ncentroids)
                val shortlist = math.max(
                  param("recall_num", fOpts)
                    .getOrElse(math.max(10 * perFieldK, 100)), perFieldK)
                val qbBits = req.indexParams.get("qb")
                  .orElse(fOpts.indexParams.get("qb"))
                  .filter(v => v >= 0 && v <= 8).getOrElse(4)
                withTail(deny, perFieldK)(kb =>
                  graft.operators.BinaryIndex.searchIvfResidual(served,
                    col(vc.field), ivf, qWalk, kb, nprobe,
                    math.max(shortlist, kb), idCol = col("_id"),
                    metric = metric, qb = qbBits, minScore = vc.minScore,
                    maxScore = vc.maxScore,
                    rerankInt8 = if (isI8) Some(qBytes) else None)
                    .select(col(ridName).cast("long").as("vec_id"),
                      col("_score")))
              }
            // binary legs: probe the Hamming-nearest lists, rank by code
            // Hamming — the score IS final, gates in-scan
            case "BINARYIVF" if isBin =>
              lcF.readyBinaryIvf().map { case (table, cents) =>
                val deny = lcF.readyBivfGen()
                  .map(lcF.deletedSince).getOrElse(Set.empty[Long])
                val served = applyDeny(table, deny, ridName)
                val nprobe = math.min(
                  param("nprobe", fOpts)
                    .getOrElse(80),
                  cents.length)
                withTail(deny, perFieldK)(kb =>
                  graft.operators.BinaryIndex.searchBinaryIvf(served,
                    vc.field, cents, qCode, kb, nprobe, filter = pred,
                    minScore = vc.minScore, maxScore = vc.maxScore,
                    tieBreak = Some(col("_id")))
                    .select(col(ridName).cast("long").as("vec_id"),
                      col("_score")))
              }
            case _ => None // no per-field route for this family → FLAT
          }
        }
        if (legs.exists(_.isEmpty)) None
        else {
          val nf = legs.size
          val w = req.weights.getOrElse(Seq.fill(nf)(1.0 / nf))
          require(w.size == nf, "weights arity must match vector conditions")
          val joined = legs.flatten.zipWithIndex
            .map { case (df, i) =>
              df.select(col("vec_id"), col("_score").as(s"_s$i")) }
            .reduceLeft((a, b) => a.join(b, "vec_id"))
          // lead condition sets the response direction
          // (doc_query.go:1526-1528); a binary lead ranks ascending
          val headMetric =
            if (valueTypeOf(space, req.vectors.head.field) == "binary") "l2"
            else metricOf(space, req.vectors.head.field)
          val combined = (0 until nf)
            .map(i => col(s"_s$i") * lit(w(i))).reduceLeft(_ + _)
          val primary = if (Knn.ascending(headMetric)) col("_score").asc
            else col("_score").desc
          val scored = joined.withColumn("_score", combined)
            .orderBy(primary, col("vec_id").asc)
            .limit(req.limit + req.offset)
          val ordered = joinBack(scored).orderBy(primary, col("_id"))
          val sliced = if (req.offset > 0) ordered.offset(req.offset) else ordered
          // conjunctive results carry (_id, _score), like the FLAT path
          val projected = sliced.select(col("_id"), col("_score"))
          Some(if (req.sort.nonEmpty) applySort(projected, req.sort)
            else projected)
        }
        } // allowForGraph.flatMap
      } else None
    if (multiRouted.isDefined) return multiRouted.get

    // ── BATCHED multi-field conjunctive ROUTING (req_num > 1 on every
    // condition): the reference flattens req_num into one request per
    // field and intersects per (query, docid) (doc_query.go:296-318 ∘
    // vector_manager.cc:1024-1087). Each field's batch serves through
    // its OWN READY generation in ONE pass (the per-family batch
    // operators amortize segment reads / probe scans across the whole
    // batch); filters and per-condition gates ride each leg exactly as
    // in the single-query conjunction above. Unroutable shapes keep the
    // FLAT per-field batch fallback.
    val multiBatchRouted: Option[DataFrame] = {
      val reqNum = req.vectors.headOption.map(_.queries.size).getOrElse(0)
      if (req.isBruteSearch != 1 && req.vectors.size > 1 && reqNum > 1 &&
          req.vectors.forall(_.queries.size == reqNum) &&
          rid.isDefined &&
          // every value type routes its batch legs: float for every
          // family, binary through BINARYIVF, int8 when the field's
          // metric has an integer kernel (index_model.h:19)
          req.vectors.forall(vc => space.vectorFields.find(_.name == vc.field)
            .flatMap(_.vector).exists(v =>
              v.valueType == "float" || v.valueType == "binary" ||
                (v.valueType == "int8" && Set("ip", "l2", "l2sq")
                  .contains(metricOf(space, vc.field)))))) {
        val perFieldK = math.max(req.limit * 10, 200)
        val graphLegs = req.vectors.exists(vc =>
          space.vectorFields.find(_.name == vc.field).flatMap(_.vector)
            .map(_.indexType)
            .exists(t => t == "HNSW" || t == "DISKANN_STATIC" || t == "SSG"))
        // one bounded take probes + collects the graph legs' allow-set,
        // shared across the batch AND across fields (engine.cc:355-373)
        val allowForGraph: Option[Option[Set[Long]]] = pred match {
          case Some(p) if graphLegs =>
            val probed = live.filter(p).select(col(ridName).cast("long"))
              .take(maxFilterAllowIds + 1)
            if (probed.length > maxFilterAllowIds) None
            else Some(Some(probed.map(_.getLong(0)).toSet))
          case _ => Some(None)
        }
        allowForGraph.flatMap { allow =>
        val legs: Seq[Option[DataFrame]] = req.vectors.map { vc =>
          val lcF = lifecycle.scoped(vc.field)
          val fOpts = space.vectorFields.find(_.name == vc.field)
            .flatMap(_.vector).get
          val isBin = fOpts.valueType == "binary"
          val isI8 = fOpts.valueType == "int8"
          val metric = if (isBin) "l2" else metricOf(space, vc.field)
          val queries0 = vc.queries.zipWithIndex.map { case (q, i) =>
            (i.toLong, maybeNormalize(space, vc.field, q)) }
          // binary legs sign-binarize each request query once
          val qCodes: Seq[(Long, Array[Byte])] =
            if (isBin) queries0.map { case (qid, q) =>
              (qid, graft.functions.VecKernels.signBits(
                new org.apache.spark.sql.catalyst.util.GenericArrayData(q.toArray))
                .asInstanceOf[Array[Byte]])
            } else Seq.empty
          // int8 legs quantize once; graph/ADC legs walk the raw-code
          // float domain, reranks/tails use the integer kernels
          val qbCodes: Seq[(Long, Array[Byte])] =
            if (isI8) queries0.map { case (qid, q) =>
              (qid, graft.functions.VecKernels.quantizeI8(
                new org.apache.spark.sql.catalyst.util.GenericArrayData(q.toArray)))
            } else Seq.empty
          // the per-leg walk/ADC queries: code values as floats for int8
          val queries: Seq[(Long, Seq[Float])] =
            if (isI8) qbCodes.map { case (qid, code) =>
              (qid, code.toSeq.map(_.toFloat)) }
            else queries0
          // per-field buffer union before the (qid, docid) intersection;
          // tail leg applies the filter and this condition's gate in-scan
          def withTailB(deny: Set[Long], kArg: Int)(
              base: Int => DataFrame): DataFrame =
            if (!tailOn) base(kArg)
            else tail.get.mergeTailBatch(corpus.schema, kArg, metric, deny) { td =>
              val spark = corpus.sparkSession
              import spark.implicits._
              val filteredTd = pred.map(td.filter).getOrElse(td)
              if (isBin)
                Knn.scoreGate(filteredTd
                  .select(col(ridName).cast("long").as("vec_id"),
                    col(vc.field).as("_c"))
                  .crossJoin(broadcast(qCodes.toDF("_qid", "_qcode")))
                  .select(col("_qid"),
                    graft.Graft.F.hamming(col("_c"), col("_qcode"))
                      .cast("double").as("_score"),
                    col("vec_id"))
                  .filter(col("_score").isNotNull),
                  vc.minScore, vc.maxScore)
              else if (isI8)
                Knn.scoreGate(filteredTd
                  .select(col(ridName).cast("long").as("vec_id"),
                    col(vc.field).as("_c"))
                  .crossJoin(broadcast(qbCodes.toDF("_qid", "_qb")))
                  .select(col("_qid"),
                    Knn.scoreInt8(metric, col("_c"), col("_qb")).as("_score"),
                    col("vec_id"))
                  .filter(col("_score").isNotNull),
                  vc.minScore, vc.maxScore)
              else {
                val qDf = queries.toDF("_qid", "_qv")
                  .select(col("_qid"), col("_qv").cast("array<float>").as("_qv"))
                Knn.searchBatch(filteredTd, col(vc.field), struct(col(ridName)),
                  qDf, "_qid", "_qv", kArg, metric,
                  minScore = vc.minScore, maxScore = vc.maxScore)
                  .select(col("_qid"),
                    col(s"_item.$ridName").cast("long").as("vec_id"),
                    col("_score"))
              }
            }(base)
          fOpts.indexType match {
            case "HNSW" =>
              lcF.readyHnswSegments().map { segs =>
                val deny = lcF.hnswDeleteBaseline()
                  .map(lcF.deletedSince).getOrElse(Set.empty[Long])
                val ef = math.max(
                  param("efSearch", fOpts)
                    .getOrElse(64), perFieldK)
                gateBatchLoopGates(perFieldK, metric, vc.minScore,
                  vc.maxScore)(d => withTailB(deny, d)(kb =>
                    graft.operators.HnswIndex.searchBatch(segs, queries, kb,
                      math.max(ef, kb), metric, deny = deny,
                      allowIds = allow)))
              }
            case "IVFFLAT" | "GPU_IVFFLAT" =>
              for (table <- lcF.readyIndex(); model <- lcF.loadModel(metric))
                yield {
                  val deny = lcF.readyGen()
                    .map(lcF.deletedSince).getOrElse(Set.empty[Long])
                  val served0 = applyDeny(table, deny, ridName)
                  // scan leg: predicate + gate in-scan, one probe-union
                  // pass serves the whole batch
                  val served = pred.map(served0.filter).getOrElse(served0)
                  val nprobe = math.min(
                    param("nprobe", fOpts)
                      .getOrElse(80),
                    model.ncentroids)
                  withTailB(deny, perFieldK)(kb =>
                    (if (isI8)
                      // probe with the FLOAT query (centroids live in the
                      // de-quantized domain), score with integer kernels
                      IvfIndex.searchBatchInt8(served, col(vc.field),
                        struct(col(ridName)),
                        queries0.zip(qbCodes).map { case ((qid, q), (_, code)) =>
                          (qid, q, code) },
                        model, kb, nprobe,
                        minScore = vc.minScore, maxScore = vc.maxScore)
                    else
                      IvfIndex.searchBatch(served, col(vc.field),
                        struct(col(ridName)), queries, model, kb, nprobe,
                        minScore = vc.minScore, maxScore = vc.maxScore))
                      .select(col("_qid"),
                        col(s"_item.$ridName").cast("long").as("vec_id"),
                        col("_score")))
                }
            case "DISKANN_STATIC" | "SSG" =>
              lcF.readyVamanaSegments().map { segs =>
                val deny = lcF.readyVamanaGen()
                  .map(lcF.deletedSince).getOrElse(Set.empty[Long])
                val l = math.max(
                  req.indexParams.get("l_search").filter(_ > 0)
                    .orElse(fOpts.indexParams.get("L").filter(_ > 0))
                    .getOrElse(100), perFieldK)
                val bw = param("beam_width", fOpts)
                  .getOrElse(4)
                gateBatchLoopGates(perFieldK, metric, vc.minScore,
                  vc.maxScore)(d => withTailB(deny, d)(kb =>
                    graft.operators.VamanaIndex.searchBatch(segs, queries,
                      kb, math.max(l, kb), bw, metric, deny = deny,
                      allowIds = allow)))
              }
            // compressed batch legs: one ADC/estimator pass over the
            // probed-list union serves every query, recall_num exact
            // rerank; gates + predicate in-scan like the single legs
            case "IVFPQ" | "GPU_IVFPQ" | "IVFPQ_RELAYOUT" | "SCANN" =>
              val isScann = fOpts.indexType == "SCANN"
              val ready =
                if (isScann) lcF.readyScann(metric) else lcF.readyIvfPq(metric)
              ready.map { case (table, ivf, pq) =>
                val deny =
                  (if (isScann) lcF.readyScannGen() else lcF.readyPqGen())
                    .map(lcF.deletedSince).getOrElse(Set.empty[Long])
                val served0 = applyDeny(table, deny, ridName)
                val served = pred.map(served0.filter).getOrElse(served0)
                val nprobe = math.min(
                  param("nprobe", fOpts)
                    .getOrElse(80),
                  ivf.ncentroids)
                val recallNum = math.max(
                  param("recall_num", fOpts)
                    .getOrElse(if (isScann) math.max(10 * perFieldK, 100)
                    else perFieldK), perFieldK)
                withTailB(deny, perFieldK)(kb =>
                  graft.operators.PqIndex.searchBatchIvfResidual(served,
                    col(vc.field), ivf, pq, queries, kb, nprobe,
                    math.max(recallNum, kb), idCol = col(ridName),
                    minScore = vc.minScore, maxScore = vc.maxScore,
                    rerankInt8 = if (isI8) Some(qbCodes) else None)
                    .select(col("_qid"), col("_id").cast("long").as("vec_id"),
                      col("_score")))
              }
            case "IVFRABITQ" =>
              lcF.readyIvfRabitq(metric).map { case (table, ivf) =>
                val deny = lcF.readyRbGen()
                  .map(lcF.deletedSince).getOrElse(Set.empty[Long])
                val served0 = applyDeny(table, deny, ridName)
                val served = pred.map(served0.filter).getOrElse(served0)
                val nprobe = math.min(
                  param("nprobe", fOpts)
                    .getOrElse(80),
                  ivf.ncentroids)
                val shortlist = math.max(
                  param("recall_num", fOpts)
                    .getOrElse(math.max(10 * perFieldK, 100)), perFieldK)
                val qbBits = req.indexParams.get("qb")
                  .orElse(fOpts.indexParams.get("qb"))
                  .filter(v => v >= 0 && v <= 8).getOrElse(4)
                withTailB(deny, perFieldK)(kb =>
                  graft.operators.BinaryIndex.searchBatchIvfResidual(served,
                    col(vc.field), ivf, queries, kb, nprobe,
                    math.max(shortlist, kb), idCol = col(ridName),
                    metric = metric, qb = qbBits, minScore = vc.minScore,
                    maxScore = vc.maxScore,
                    rerankInt8 = if (isI8) Some(qbCodes) else None)
                    .select(col("_qid"), col("_id").cast("long").as("vec_id"),
                      col("_score")))
              }
            case "BINARYIVF" if isBin =>
              lcF.readyBinaryIvf().map { case (table, cents) =>
                val deny = lcF.readyBivfGen()
                  .map(lcF.deletedSince).getOrElse(Set.empty[Long])
                val served0 = applyDeny(table, deny, ridName)
                val served = pred.map(served0.filter).getOrElse(served0)
                val nprobe = math.min(
                  param("nprobe", fOpts)
                    .getOrElse(80),
                  cents.length)
                withTailB(deny, perFieldK)(kb =>
                  graft.operators.BinaryIndex.searchBatchBinaryIvf(served,
                    vc.field, cents, qCodes, kb, nprobe,
                    idCol = col(ridName), minScore = vc.minScore,
                    maxScore = vc.maxScore)
                    .select(col("_qid"), col("_id").cast("long").as("vec_id"),
                      col("_score")))
              }
            case _ => None // no per-field batch route for this family
          }
        }
        if (legs.exists(_.isEmpty)) None
        else {
          val nf = legs.size
          val w = req.weights.getOrElse(Seq.fill(nf)(1.0 / nf))
          require(w.size == nf, "weights arity must match vector conditions")
          val joined = legs.flatten.zipWithIndex
            .map { case (df, i) =>
              df.select(col("_qid"), col("vec_id"),
                col("_score").as(s"_s$i")) }
            .reduceLeft((a, b) => a.join(b, Seq("_qid", "vec_id")))
          // binary lead ⇒ ascending, like the FLAT twin's legDir
          val headAsc = Knn.ascending(
            if (valueTypeOf(space, req.vectors.head.field) == "binary") "l2"
            else metricOf(space, req.vectors.head.field))
          val combined = (0 until nf)
            .map(i => col(s"_s$i") * lit(w(i))).reduceLeft(_ + _)
          // per-qid bounded top-k + offset slice, the FLAT batched
          // conjunction's exact shape
          val agged = joined.withColumn("_score", combined)
            .groupBy(col("_qid"))
            .agg(graft.Graft.F.topK(col("_score"), struct(col("vec_id")),
              req.limit + req.offset, headAsc).as("_tk"))
          val sliced =
            if (req.offset > 0)
              agged.withColumn("_tk", slice(col("_tk"), req.offset + 1, req.limit))
            else agged
          val hits = sliced.select(col("_qid"), explode(col("_tk")).as("_e"))
            .select(col("_qid"), col("_e.item.vec_id").as("vec_id"),
              col("_e.score").as("_score"))
          val primary = if (headAsc) col("_score").asc else col("_score").desc
          val out = joinBack(hits, Seq(col("_qid")))
            .orderBy(col("_qid").asc, primary, col("_id").asc)
            .select(col("_qid"), col("_id"), col("_score"))
          Some(if (req.sort.nonEmpty)
            applySort(out, req.sort, qid = Some(col("_qid")))
          else out)
        }
        } // allowForGraph.flatMap
      } else None
    }
    if (multiBatchRouted.isDefined) return multiBatchRouted.get

    val routed: Option[DataFrame] = vopts.map(_.indexType) match {
      case Some("HNSW") if single && rid.isDefined =>
        lifecycle.readyHnswSegments().flatMap { segments0 =>
          val vc = req.vectors.head
          val q = maybeNormalize(space, vc.field, vc.queries.head)
          val metric = metricOf(space, vc.field)
          val k = req.limit + req.offset
          // SPANN-clustered generation: route to nprobe shards — the
          // shard_id filter is parquet PARTITION PRUNING over the
          // partitionBy(shard_id) layout, so the pruned segments' IO
          // never happens. Default nprobe = ncentroids (exact serving);
          // requests/spaces narrow it via index_params.
          val segments = lifecycle.hnswRoutedModel(metric) match {
            case Some(model) =>
              val nprobe = math.min(
                param("nprobe", vopts.get)
                  .getOrElse(model.ncentroids),
                model.ncentroids)
              segments0.filter(col("shard_id")
                .isin(model.nearestCentroids(q, nprobe): _*))
            case None => segments0
          }
          val hits: Option[DataFrame] = pred match {
            case Some(p) =>
              // selectivity guard (the reference's planner switch,
              // engine.cc:355-373): ONE bounded take() both probes the
              // selectivity and collects the allow-set — a broad
              // filter's ids never reach the driver past the cap, and a
              // selective filter pays a single action, not a count plus
              // a re-collect. The allow-set comes from the LIVE view so
              // fresh tail rows that match the filter are admitted too.
              val probed = live.filter(p).select(col(ridName).cast("long"))
                .take(maxFilterAllowIds + 1)
              if (probed.length > maxFilterAllowIds) None
              else {
                // ONE broadcast for the whole request — the gate loop's
                // depth-doubling retries reuse it instead of re-shipping
                // the allow-set every probe
                val allowBc = corpus.sparkSession.sparkContext
                  .broadcast(probed.map(_.getLong(0)).toSet -- hnswDeny)
                Some(gateLoop(k, metric)(d =>
                  tailMerge(d, metric, vc.field, q, hnswDeny)(kb =>
                    graft.operators.HnswIndex.searchFilteredBc(
                      segments, q, kb, efOf(kb), metric, allowBc))))
              }
            case None =>
              Some(gateLoop(k, metric)(d =>
                tailMerge(d, metric, vc.field, q, hnswDeny)(kb =>
                  graft.operators.HnswIndex.search(segments, q, kb, efOf(kb),
                    metric, deny = hnswDeny))))
          }
          hits.map(h => finish(joinBack(h), metric))
        }
      case Some("HNSW") if batched && rid.isDefined =>
        // batch route: ONE pass over each segment serves all req_num
        // queries (HnswIndex.searchBatch amortizes the deserialization);
        // a scalar filter's allow-set is collected ONCE (selectivity
        // guard first) and broadcast into every query's walk — the
        // collect amortizes across the batch like the segment read
        lifecycle.readyHnswSegments().flatMap { segments0 =>
          val vc = req.vectors.head
          val metric = metricOf(space, vc.field)
          val k = req.limit + req.offset
          val queries = vc.queries.zipWithIndex.map { case (q, i) =>
            (i.toLong, maybeNormalize(space, vc.field, q)) }
          // clustered generation: prune to the UNION of every query's
          // nprobe route (still partition pruning; each query's walk
          // over a not-its-own shard just returns its per-shard top-k
          // into the per-qid merge — correctness unchanged)
          val segments = lifecycle.hnswRoutedModel(metric) match {
            case Some(model) =>
              val nprobe = math.min(
                param("nprobe", vopts.get)
                  .getOrElse(model.ncentroids),
                model.ncentroids)
              val lists = queries.flatMap(qq =>
                model.nearestCentroids(qq._2, nprobe)).distinct
              segments0.filter(col("shard_id").isin(lists: _*))
            case None => segments0
          }
          val allow: Option[Option[Set[Long]]] = pred match {
            case Some(p) =>
              // one take() = probe + collect (see the single-query arm)
              val probed = live.filter(p).select(col(ridName).cast("long"))
                .take(maxFilterAllowIds + 1)
              if (probed.length > maxFilterAllowIds)
                None // broad filter → brute fallback (planner switch)
              else Some(Some(probed.map(_.getLong(0)).toSet))
            case None => Some(None)
          }
          allow.map { allowIds =>
            val hits = gateBatchLoop(k, metric)(d =>
              tailMergeBatch(d, metric, vc.field, queries, hnswDeny)(
                kb => graft.operators.HnswIndex.searchBatch(
                  segments, queries, kb, efOf(kb), metric, deny = hnswDeny,
                  allowIds = allowIds)))
            finishBatch(joinBack(hits, Seq(col("_qid"))), metric)
          }
        }
      case Some("DISKANN_STATIC" | "SSG") if single && rid.isDefined =>
        // Vamana route (the reference's DiskANN-static class,
        // gamma_index_diskann_static.cc): search params resolve request
        // `l_search`/`beam_width` over the space's `L`/`beam_width`
        // (diskann_static_params.h:27-38); the delete ledger rides the
        // walk's allow-functor. A scalar filter rides the SAME functor —
        // the reference gates every index family through one
        // filter-bitmap (gamma_common_data.h:94-105, wired
        // engine.cc:355-373), the DiskANN class included: the one-take
        // selectivity probe collects the allow-set, and a broad filter
        // (> maxFilterAllowIds survivors) falls back to filter-first
        // brute FLAT, the same planner switch as the HNSW arm.
        // SSG — the reference's other flat-graph RNG-family index
        // (wrapped third-party, impl/ssg/) — aliases to the Vamana
        // generation the way GPU_* alias to the CPU layouts: same
        // capability class, served from a real graph rather than the
        // FLAT fallback.
        lifecycle.readyVamanaSegments().flatMap { segments0 =>
          val vc = req.vectors.head
          val q = maybeNormalize(space, vc.field, vc.queries.head)
          val metric = metricOf(space, vc.field)
          val k = req.limit + req.offset
          // CLUSTERED generation: route to nprobe shards — the shard_id
          // filter is parquet PARTITION PRUNING over the
          // partitionBy(shard_id) layout (the storage-resident family is
          // the one that needs pruned IO most). Default nprobe =
          // ncentroids (exact serving); requests/spaces narrow it.
          val segments = lifecycle.vamanaRoutedModel(metric) match {
            case Some(model) =>
              val nprobe = math.min(
                param("nprobe", vopts.get)
                  .getOrElse(model.ncentroids),
                model.ncentroids)
              segments0.filter(col("shard_id")
                .isin(model.nearestCentroids(q, nprobe): _*))
            case None => segments0
          }
          val l = math.max(
            req.indexParams.get("l_search").filter(_ > 0)
              .orElse(vopts.get.indexParams.get("L").filter(_ > 0))
              .getOrElse(100), k)
          val bw = param("beam_width", vopts.get)
            .getOrElse(4)
          val deny = lifecycle.readyVamanaGen()
            .map(lifecycle.deletedSince).getOrElse(Set.empty[Long])
          val hits: Option[DataFrame] = pred match {
            case Some(p) =>
              // one bounded take() = selectivity probe + allow-set
              // collect (the planner switch, engine.cc:355-373) — same
              // contract as the HNSW arm; the probe runs over the LIVE
              // view so filter-matching tail rows are admitted too
              val probed = live.filter(p).select(col(ridName).cast("long"))
                .take(maxFilterAllowIds + 1)
              if (probed.length > maxFilterAllowIds) None
              else {
                // one broadcast per request, reused across gate-loop
                // retries (see the HNSW arm)
                val allowBc = corpus.sparkSession.sparkContext
                  .broadcast(probed.map(_.getLong(0)).toSet -- deny)
                Some(gateLoop(k, metric)(d =>
                  tailMerge(d, metric, vc.field, q, deny)(kb =>
                    graft.operators.VamanaIndex.searchFilteredBc(segments, q,
                      kb, math.max(l, kb), bw, metric, allowBc))))
              }
            case None =>
              Some(gateLoop(k, metric)(d =>
                tailMerge(d, metric, vc.field, q, deny)(kb =>
                  graft.operators.VamanaIndex.search(segments, q, kb,
                    math.max(l, kb), bw, metric, deny = deny))))
          }
          hits.map(h => finish(joinBack(h), metric))
        }
      case Some("DISKANN_STATIC" | "SSG") if batched && rid.isDefined =>
        // batched graph route (the reference flattens req_num into ONE
        // index request for every type, doc_query.go:296-318): every
        // query walks each Vamana segment in the same task pass — one
        // segment deserialization amortized across the batch — instead
        // of degrading to per-query brute FLAT. A clustered generation
        // prunes to the UNION of every query's nprobe route (still
        // partition pruning; extra shards only add candidates to the
        // per-qid merge — correctness unchanged). A scalar filter's
        // allow-set is collected ONCE and broadcast into every query's
        // walk, like the batched HNSW arm.
        lifecycle.readyVamanaSegments().flatMap { segments0 =>
          val vc = req.vectors.head
          val metric = metricOf(space, vc.field)
          val k = req.limit + req.offset
          val queries = vc.queries.zipWithIndex.map { case (q, i) =>
            (i.toLong, maybeNormalize(space, vc.field, q)) }
          val segments = lifecycle.vamanaRoutedModel(metric) match {
            case Some(model) =>
              val nprobe = math.min(
                param("nprobe", vopts.get)
                  .getOrElse(model.ncentroids),
                model.ncentroids)
              val lists = queries.flatMap(qq =>
                model.nearestCentroids(qq._2, nprobe)).distinct
              segments0.filter(col("shard_id").isin(lists: _*))
            case None => segments0
          }
          val l = math.max(
            req.indexParams.get("l_search").filter(_ > 0)
              .orElse(vopts.get.indexParams.get("L").filter(_ > 0))
              .getOrElse(100), k)
          val bw = param("beam_width", vopts.get)
            .getOrElse(4)
          val deny = lifecycle.readyVamanaGen()
            .map(lifecycle.deletedSince).getOrElse(Set.empty[Long])
          val allow: Option[Option[Set[Long]]] = pred match {
            case Some(p) =>
              val probed = live.filter(p).select(col(ridName).cast("long"))
                .take(maxFilterAllowIds + 1)
              if (probed.length > maxFilterAllowIds)
                None // broad filter → brute fallback (planner switch)
              else Some(Some(probed.map(_.getLong(0)).toSet))
            case None => Some(None)
          }
          allow.map { allowIds =>
            val hits = gateBatchLoop(k, metric)(d =>
              tailMergeBatch(d, metric, vc.field, queries, deny)(kb =>
                graft.operators.VamanaIndex.searchBatch(segments, queries, kb,
                  math.max(l, kb), bw, metric, deny = deny,
                  allowIds = allowIds)))
            finishBatch(joinBack(hits, Seq(col("_qid"))), metric)
          }
        }
      // GPU_* spaces execute on CUDA in the reference; here they serve
      // from the equivalent CPU layout — same semantics, a space JSON
      // written for the GPU classes keeps index-serving after a switch
      case Some("IVFFLAT" | "GPU_IVFFLAT") if single =>
        val metric = metricOf(space, req.vectors.head.field)
        for (table <- lifecycle.readyIndex(); model <- lifecycle.loadModel(metric))
          yield {
            val vc = req.vectors.head
            val q = maybeNormalize(space, vc.field, vc.queries.head)
            val k = req.limit + req.offset
            val served = applyDeny(table, ivfDeny, ridName)
            // score gates ride IN-SCAN (gamma_common_data.h:94-96): the
            // probed-list scan computes every candidate's score anyway, so
            // gating before the bounded top-k is exact-within-probe with
            // zero over-fetch — no loop, no extra actions
            if (!tailOn)
              finish(IvfIndex.search(served, col(vc.field), model, q, k,
                nprobeOf(model), filter = pred, minScore = gMin,
                maxScore = gMax, tieBreak = Some(col("_id"))),
                metric)
            else {
              val hits = tailMerge(k, metric, vc.field, q, ivfDeny,
                gated = true)(kb =>
                IvfIndex.search(served, col(vc.field), model, q, kb,
                  nprobeOf(model), filter = pred, minScore = gMin,
                  maxScore = gMax, tieBreak = Some(col("_id")))
                  .select(col(ridName).cast("long").as("vec_id"), col("_score")))
              finish(joinBack(hits), metric)
            }
          }
      case Some("BINARYIVF")
          if routable && req.vectors.head.queries.size == 1 &&
            vopts.exists(_.valueType == "binary") =>
        // binary value_type: the stored column IS the packed code; the
        // request's float features sign-binarize exactly like the FLAT
        // binary path, then route = probe nprobe Hamming-nearest lists
        // (partition pruning), rank by code Hamming — the reference's
        // IndexBinaryIVF semantics (gamma_index_binary_ivf.cc)
        lifecycle.readyBinaryIvf().map { case (table, cents) =>
          val vc = req.vectors.head
          val qCode = graft.functions.VecKernels.signBits(
            new org.apache.spark.sql.catalyst.util.GenericArrayData(
              vc.queries.head.toArray)).asInstanceOf[Array[Byte]]
          val k = req.limit + req.offset
          val nprobe = math.min(
            param("nprobe", vopts.get)
              .getOrElse(80),
            cents.length)
          val deny = lifecycle.readyBivfGen()
            .map(lifecycle.deletedSince).getOrElse(Set.empty[Long])
          val served = applyDeny(table, deny, ridName)
          // score gates apply IN-SCAN: Hamming IS the final score for the
          // binary family, so both the probed lists and the tail scan
          // gate before their bounded top-k (gamma_common_data.h:94-96)
          if (!tailOn)
            finish(graft.operators.BinaryIndex.searchBinaryIvf(served,
              vc.field, cents, qCode, k, nprobe, filter = pred,
              minScore = gMin, maxScore = gMax,
              tieBreak = Some(col("_id"))), metric = "l2") // hamming ⇒ asc
          else {
            // tail leg: the buffered column IS the packed code — the
            // brute scan ranks by code Hamming, same as the base lists
            val hits = tailMergeWith(k, "l2", deny) { td =>
                Knn.searchBinary(td, col(vc.field), qCode, k, filter = pred,
                  minScore = gMin, maxScore = gMax,
                  tieBreak = Some(col("_id")))
                  .select(col(ridName).cast("long").as("vec_id"), col("_score"))
              } { kb =>
                graft.operators.BinaryIndex.searchBinaryIvf(served, vc.field,
                  cents, qCode, kb, nprobe, filter = pred,
                  minScore = gMin, maxScore = gMax,
                  tieBreak = Some(col("_id")))
                  .select(col(ridName).cast("long").as("vec_id"), col("_score"))
              }
            finish(joinBack(hits), metric = "l2")
          }
        }
      case Some("IVFRABITQ") if single =>
        // RaBitQ class: coarse probe ∘ residual sign-code estimator
        // (qb ∈ [0,8]) ∘ `recall_num`-deep exact rerank
        // (gamma_index_ivfrabitq.cc:105,214-223)
        val metric = metricOf(space, req.vectors.head.field)
        lifecycle.readyIvfRabitq(metric).map { case (table, ivf) =>
          val vc = req.vectors.head
          val q = maybeNormalize(space, vc.field, vc.queries.head)
          val k = req.limit + req.offset
          val shortlist = math.max(
            param("recall_num", vopts.get)
              .getOrElse(math.max(10 * k, 100)), k)
          val qb = req.indexParams.get("qb")
            .orElse(vopts.get.indexParams.get("qb"))
            .filter(v => v >= 0 && v <= 8).getOrElse(4)
          val deny = lifecycle.readyRbGen()
            .map(lifecycle.deletedSince).getOrElse(Set.empty[Long])
          val served0 = applyDeny(table, deny, ridName)
          val served = pred.map(served0.filter).getOrElse(served0)
          // score gates apply at the exact-rerank heap (in-scan for the
          // stage the final score exists at — gamma_common_data.h:94-96);
          // recall_num deepens the gated pool like it deepens recall
          if (!tailOn)
            finish(graft.operators.BinaryIndex.searchIvfResidual(served,
              col(vc.field), ivf, q, k, nprobeOf(ivf), shortlist,
              idCol = col("_id"), metric = metric, qb = qb,
              minScore = gMin, maxScore = gMax), metric)
          else {
            val hits = tailMerge(k, metric, vc.field, q, deny,
              gated = true)(kb =>
              graft.operators.BinaryIndex.searchIvfResidual(served,
                col(vc.field), ivf, q, kb, nprobeOf(ivf),
                math.max(shortlist, kb), idCol = col("_id"), metric = metric,
                qb = qb, minScore = gMin, maxScore = gMax)
                .select(col(ridName).cast("long").as("vec_id"), col("_score")))
            finish(joinBack(hits), metric)
          }
        }
      case Some("IVFPQ" | "GPU_IVFPQ" | "IVFPQ_RELAYOUT") if single =>
        // the reference's default compressed index: ADC over residual
        // codes inside nprobe lists, then a `recall_num`-deep exact
        // rerank (gamma_index_ivfpq.cc:765-768 — recall_num caps at
        // max(recall_num, k), absent = k). Scalar filter + delete gate
        // pre-compose into the scan both stages run over.
        val metric = metricOf(space, req.vectors.head.field)
        lifecycle.readyIvfPq(metric).map { case (table, ivf, pq) =>
          val vc = req.vectors.head
          val q = maybeNormalize(space, vc.field, vc.queries.head)
          val k = req.limit + req.offset
          val recallNum = math.max(
            param("recall_num", vopts.get)
              .getOrElse(k), k)
          val deny = lifecycle.readyPqGen()
            .map(lifecycle.deletedSince).getOrElse(Set.empty[Long])
          val served0 = applyDeny(table, deny, ridName)
          val served = pred.map(served0.filter).getOrElse(served0)
          // score gates apply at the exact-rerank heap — the reference's
          // in-scan admission point (gamma_common_data.h:94-96)
          if (!tailOn)
            finish(graft.operators.PqIndex.searchIvfResidual(served,
              col(vc.field), ivf, pq, q, k, nprobeOf(ivf), recallNum,
              idCol = col("_id"), minScore = gMin, maxScore = gMax), metric)
          else {
            val hits = tailMerge(k, metric, vc.field, q, deny,
              gated = true)(kb =>
              graft.operators.PqIndex.searchIvfResidual(served,
                col(vc.field), ivf, pq, q, kb, nprobeOf(ivf),
                math.max(recallNum, kb), idCol = col("_id"),
                minScore = gMin, maxScore = gMax)
                .select(col(ridName).cast("long").as("vec_id"), col("_score")))
            finish(joinBack(hits), metric)
          }
        }
      case Some("SCANN") if single =>
        // native SCANN class (anisotropic / score-aware quantization,
        // Guo et al. ICML 2020 — the algorithm the reference wraps as
        // third-party, impl/scann/): same serving composition as IVFPQ
        // (coarse probe ∘ ADC shortlist ∘ recall_num exact rerank), over
        // codebooks trained and codes assigned under the anisotropic
        // loss. No READY generation → exact FLAT fallback, as before.
        val metric = metricOf(space, req.vectors.head.field)
        lifecycle.readyScann(metric).map { case (table, ivf, pq) =>
          val vc = req.vectors.head
          val q = maybeNormalize(space, vc.field, vc.queries.head)
          val k = req.limit + req.offset
          val recallNum = math.max(
            param("recall_num", vopts.get)
              .getOrElse(math.max(10 * k, 100)), k)
          val deny = lifecycle.readyScannGen()
            .map(lifecycle.deletedSince).getOrElse(Set.empty[Long])
          val served0 = applyDeny(table, deny, ridName)
          val served = pred.map(served0.filter).getOrElse(served0)
          // score gates at the exact-rerank heap, like the IVFPQ arm
          if (!tailOn)
            finish(graft.operators.PqIndex.searchIvfResidual(served,
              col(vc.field), ivf, pq, q, k, nprobeOf(ivf), recallNum,
              idCol = col("_id"), minScore = gMin, maxScore = gMax), metric)
          else {
            val hits = tailMerge(k, metric, vc.field, q, deny,
              gated = true)(kb =>
              graft.operators.PqIndex.searchIvfResidual(served,
                col(vc.field), ivf, pq, q, kb, nprobeOf(ivf),
                math.max(recallNum, kb), idCol = col("_id"),
                minScore = gMin, maxScore = gMax)
                .select(col(ridName).cast("long").as("vec_id"), col("_score")))
            finish(joinBack(hits), metric)
          }
        }
      case Some("SCANN") if batched =>
        val metric = metricOf(space, req.vectors.head.field)
        lifecycle.readyScann(metric).map { case (table, ivf, pq) =>
          val vc = req.vectors.head
          val k = req.limit + req.offset
          val recallNum = math.max(
            param("recall_num", vopts.get)
              .getOrElse(math.max(10 * k, 100)), k)
          val deny = lifecycle.readyScannGen()
            .map(lifecycle.deletedSince).getOrElse(Set.empty[Long])
          val served0 = applyDeny(table, deny, ridName)
          val served = pred.map(served0.filter).getOrElse(served0)
          val queries = vc.queries.zipWithIndex.map { case (q, i) =>
            (i.toLong, maybeNormalize(space, vc.field, q)) }
          val hits = tailMergeBatch(k, metric, vc.field, queries, deny,
            gated = true)(
            kb => graft.operators.PqIndex.searchBatchIvfResidual(served,
              col(vc.field), ivf, pq, queries, kb, nprobeOf(ivf),
              math.max(recallNum, kb), idCol = col(ridName),
              minScore = gMin, maxScore = gMax)
              .select(col("_qid"), col("_id").cast("long").as("vec_id"),
                col("_score")))
          finishBatch(joinBack(hits, Seq(col("_qid"))), metric)
        }
      case Some("IVFFLAT" | "GPU_IVFFLAT") if batched =>
        val metric = metricOf(space, req.vectors.head.field)
        for (table <- lifecycle.readyIndex(); model <- lifecycle.loadModel(metric))
          yield {
            val vc = req.vectors.head
            val k = req.limit + req.offset
            val queries = vc.queries.zipWithIndex.map { case (q, i) =>
              (i.toLong, maybeNormalize(space, vc.field, q)) }
            // scalar pre-filter + delete gate compose into the scan the
            // probe join runs over (both evaluate inside probed lists)
            val served0 = applyDeny(table, ivfDeny, ridName)
            val served = pred.map(served0.filter).getOrElse(served0)
            val hits = tailMergeBatch(k, metric, vc.field, queries, ivfDeny,
              gated = true)(
              kb => IvfIndex.searchBatch(served, col(vc.field),
                struct(col(ridName)), queries, model, kb, nprobeOf(model),
                minScore = gMin, maxScore = gMax)
                .select(col("_qid"),
                  col(s"_item.$ridName").cast("long").as("vec_id"),
                  col("_score")))
            finishBatch(joinBack(hits, Seq(col("_qid"))), metric)
          }
      case Some("IVFPQ" | "GPU_IVFPQ" | "IVFPQ_RELAYOUT") if batched =>
        // batched compressed route (the reference flattens req_num into
        // ONE index request for every type, doc_query.go:296-318): one
        // scan of the union of probed lists scores every query's ADC LUT,
        // then one shared rerank — no per-query degrade to brute FLAT
        val metric = metricOf(space, req.vectors.head.field)
        lifecycle.readyIvfPq(metric).map { case (table, ivf, pq) =>
          val vc = req.vectors.head
          val k = req.limit + req.offset
          val recallNum = math.max(
            param("recall_num", vopts.get)
              .getOrElse(k), k)
          val deny = lifecycle.readyPqGen()
            .map(lifecycle.deletedSince).getOrElse(Set.empty[Long])
          val served0 = applyDeny(table, deny, ridName)
          val served = pred.map(served0.filter).getOrElse(served0)
          val queries = vc.queries.zipWithIndex.map { case (q, i) =>
            (i.toLong, maybeNormalize(space, vc.field, q)) }
          val hits = tailMergeBatch(k, metric, vc.field, queries, deny,
            gated = true)(
            kb => graft.operators.PqIndex.searchBatchIvfResidual(served,
              col(vc.field), ivf, pq, queries, kb, nprobeOf(ivf),
              math.max(recallNum, kb), idCol = col(ridName),
              minScore = gMin, maxScore = gMax)
              .select(col("_qid"), col("_id").cast("long").as("vec_id"),
                col("_score")))
          finishBatch(joinBack(hits, Seq(col("_qid"))), metric)
        }
      case Some("IVFRABITQ") if batched =>
        val metric = metricOf(space, req.vectors.head.field)
        lifecycle.readyIvfRabitq(metric).map { case (table, ivf) =>
          val vc = req.vectors.head
          val k = req.limit + req.offset
          val shortlist = math.max(
            param("recall_num", vopts.get)
              .getOrElse(math.max(10 * k, 100)), k)
          val qb = req.indexParams.get("qb")
            .orElse(vopts.get.indexParams.get("qb"))
            .filter(v => v >= 0 && v <= 8).getOrElse(4)
          val deny = lifecycle.readyRbGen()
            .map(lifecycle.deletedSince).getOrElse(Set.empty[Long])
          val served0 = applyDeny(table, deny, ridName)
          val served = pred.map(served0.filter).getOrElse(served0)
          val queries = vc.queries.zipWithIndex.map { case (q, i) =>
            (i.toLong, maybeNormalize(space, vc.field, q)) }
          val hits = tailMergeBatch(k, metric, vc.field, queries, deny,
            gated = true)(
            kb => graft.operators.BinaryIndex.searchBatchIvfResidual(served,
              col(vc.field), ivf, queries, kb, nprobeOf(ivf),
              math.max(shortlist, kb), idCol = col(ridName), metric = metric,
              qb = qb, minScore = gMin, maxScore = gMax)
              .select(col("_qid"), col("_id").cast("long").as("vec_id"),
                col("_score")))
          finishBatch(joinBack(hits, Seq(col("_qid"))), metric)
        }
      case Some("BINARYIVF")
          if routable && req.vectors.head.queries.size > 1 &&
            vopts.exists(_.valueType == "binary") =>
        // batched Hamming route: each query's float features
        // sign-binarize, per-query probe routes join on list_id equality,
        // one scan of the probed-list union ranks by code Hamming
        lifecycle.readyBinaryIvf().map { case (table, cents) =>
          val vc = req.vectors.head
          val k = req.limit + req.offset
          val nprobe = math.min(
            param("nprobe", vopts.get)
              .getOrElse(80),
            cents.length)
          val deny = lifecycle.readyBivfGen()
            .map(lifecycle.deletedSince).getOrElse(Set.empty[Long])
          val served0 = applyDeny(table, deny, ridName)
          val served = pred.map(served0.filter).getOrElse(served0)
          val queries = vc.queries.zipWithIndex.map { case (q, i) =>
            (i.toLong, graft.functions.VecKernels.signBits(
              new org.apache.spark.sql.catalyst.util.GenericArrayData(
                q.toArray)).asInstanceOf[Array[Byte]]) }
          // tail leg: every buffered code scores against every query's
          // code (the buffer is bounded — one refresh interval); the
          // per-qid merge in mergeTailBatch bounds the output. Score
          // gates apply in-scan on BOTH legs (Hamming IS the final
          // score), so the merged per-qid top-k is the gated top-k.
          val hits = tailMergeBatchWith(k, "l2", deny) { td =>
            val spark = corpus.sparkSession
            import spark.implicits._
            val qDf = queries.toDF("_qid", "_qcode")
            val filtered = pred.map(td.filter).getOrElse(td)
            Knn.scoreGate(filtered
              .select(col(ridName).cast("long").as("vec_id"),
                col(vc.field).as("_c"))
              .crossJoin(broadcast(qDf))
              .select(col("_qid"),
                graft.Graft.F.hamming(col("_c"), col("_qcode"))
                  .cast("double").as("_score"),
                col("vec_id"))
              .filter(col("_score").isNotNull), gMin, gMax)
          } { kb =>
            graft.operators.BinaryIndex.searchBatchBinaryIvf(served,
              vc.field, cents, queries, kb, nprobe, idCol = col(ridName),
              minScore = gMin, maxScore = gMax)
              .select(col("_qid"), col("_id").cast("long").as("vec_id"),
                col("_score"))
          }
          finishBatch(joinBack(hits, Seq(col("_qid"))), metric = "l2")
        }
      // INT8 value_type rides the GRAPH route too (the reference builds
      // every index family over INT8, index_model.h:19): the generation
      // stores the RAW code values widened to float
      // ([[IndexLifecycle.rebuildHnswInt8]]) — small integers are exact
      // in float, so the walk's Double-accumulated distances equal the
      // integer kernels bit-for-bit and the route stays oracle-exact at
      // ef ≥ |shard| like the float arm. The query quantizes ONCE (the
      // same symmetric quantizer as ingest) and walks as its code
      // values; the realtime tail leg brute-scores the buffer with the
      // integer kernels; score gates ride the driver-bounded gate loops
      // and scalar filters the walk's allow-functor, both exactly as the
      // float graph arms. Cosine int8 spaces keep the FLAT fallback (the
      // integer kernels are ip/l2 — matching [[Knn.searchInt8]]).
      case Some("HNSW")
          if routable && rid.isDefined &&
            vopts.exists(_.valueType == "int8") &&
            Set("ip", "l2", "l2sq")
              .contains(metricOf(space, req.vectors.head.field)) =>
        lifecycle.readyHnswSegments().flatMap { segments =>
          val metric = metricOf(space, req.vectors.head.field)
          val deny = hnswDeny
          i8GraphServe(deny) {
            (qw, kb) => graft.operators.HnswIndex.search(segments, qw, kb,
              efOf(kb), metric, deny = deny)
          } {
            (qw, kb, bc) => graft.operators.HnswIndex.searchFilteredBc(
              segments, qw, kb, efOf(kb), metric, bc)
          } {
            (qs, kb, allowIds) => graft.operators.HnswIndex.searchBatch(
              segments, qs, kb, efOf(kb), metric, deny = deny,
              allowIds = allowIds)
          }
        }
      // INT8 over the DiskANN-static family — same raw-code float
      // domain as the HNSW arm above ([[IndexLifecycle.rebuildVamanaInt8]]):
      // the beam walk's Double-accumulated distances equal the integer
      // kernels bit-for-bit, so the route is oracle-exact at
      // l ≥ |shard|. SSG aliases to the Vamana generation as in the
      // float arm.
      case Some("DISKANN_STATIC" | "SSG")
          if routable && rid.isDefined &&
            vopts.exists(_.valueType == "int8") &&
            Set("ip", "l2", "l2sq")
              .contains(metricOf(space, req.vectors.head.field)) =>
        lifecycle.readyVamanaSegments().flatMap { segments =>
          val vc0 = req.vectors.head
          val metric = metricOf(space, vc0.field)
          val k = req.limit + req.offset
          val l = math.max(
            req.indexParams.get("l_search").filter(_ > 0)
              .orElse(vopts.get.indexParams.get("L").filter(_ > 0))
              .getOrElse(100), k)
          val bw = param("beam_width", vopts.get)
            .getOrElse(4)
          val deny = lifecycle.readyVamanaGen()
            .map(lifecycle.deletedSince).getOrElse(Set.empty[Long])
          i8GraphServe(deny) {
            (qw, kb) => graft.operators.VamanaIndex.search(segments, qw, kb,
              math.max(l, kb), bw, metric, deny = deny)
          } {
            (qw, kb, bc) => graft.operators.VamanaIndex.searchFilteredBc(
              segments, qw, kb, math.max(l, kb), bw, metric, bc)
          } {
            (qs, kb, allowIds) => graft.operators.VamanaIndex.searchBatch(
              segments, qs, kb, math.max(l, kb), bw, metric, deny = deny,
              allowIds = allowIds)
          }
        }
      // INT8 over the RaBitQ class ([[IndexLifecycle.rebuildIvfRabitqInt8]]):
      // quantizer + residual sign codes in the raw-code float domain,
      // estimator shortlist with the quantized query's code values as
      // floats, recall_num exact rerank with the INTEGER kernels — full
      // probe + corpus-deep shortlist stays exact. Gates at the rerank
      // heap; int8 tail legs.
      case Some("IVFRABITQ")
          if routable && vopts.exists(_.valueType == "int8") &&
            Set("ip", "l2", "l2sq")
              .contains(metricOf(space, req.vectors.head.field)) =>
        val metric = metricOf(space, req.vectors.head.field)
        lifecycle.readyIvfRabitq(metric).map { case (table, ivf) =>
          val vc = req.vectors.head
          val k = req.limit + req.offset
          val shortlist = math.max(
            param("recall_num", vopts.get)
              .getOrElse(math.max(10 * k, 100)), k)
          val qbBits = req.indexParams.get("qb")
            .orElse(vopts.get.indexParams.get("qb"))
            .filter(v => v >= 0 && v <= 8).getOrElse(4)
          val deny = lifecycle.readyRbGen()
            .map(lifecycle.deletedSince).getOrElse(Set.empty[Long])
          val served0 = applyDeny(table, deny, ridName)
          val served = pred.map(served0.filter).getOrElse(served0)
          def qb(q: Seq[Float]): Array[Byte] =
            graft.functions.VecKernels.quantizeI8(
              new org.apache.spark.sql.catalyst.util.GenericArrayData(q.toArray))
          if (vc.queries.size == 1) {
            val qBytes = qb(vc.queries.head)
            val qWalk: Seq[Float] = qBytes.toSeq.map(_.toFloat)
            if (!tailOn)
              finish(graft.operators.BinaryIndex.searchIvfResidual(served,
                col(vc.field), ivf, qWalk, k, nprobeOf(ivf), shortlist,
                idCol = col("_id"), metric = metric, qb = qbBits,
                minScore = gMin, maxScore = gMax,
                rerankInt8 = Some(qBytes)), metric)
            else {
              val hits = tailMergeWith(k, metric, deny) { td =>
                Knn.searchInt8(td, col(vc.field), qBytes, k, metric,
                  filter = pred, minScore = gMin, maxScore = gMax,
                  tieBreak = Some(col("_id")))
                  .select(col(ridName).cast("long").as("vec_id"), col("_score"))
              } { kb =>
                graft.operators.BinaryIndex.searchIvfResidual(served,
                  col(vc.field), ivf, qWalk, kb, nprobeOf(ivf),
                  math.max(shortlist, kb), idCol = col("_id"),
                  metric = metric, qb = qbBits, minScore = gMin,
                  maxScore = gMax, rerankInt8 = Some(qBytes))
                  .select(col(ridName).cast("long").as("vec_id"), col("_score"))
              }
              finish(joinBack(hits), metric)
            }
          } else {
            val queries = vc.queries.zipWithIndex.map { case (q, i) =>
              (i.toLong, qb(q)) }
            val walkQs: Seq[(Long, Seq[Float])] = queries.map {
              case (qid, code) => (qid, code.toSeq.map(_.toFloat)) }
            val hits = tailMergeBatchWith(k, metric, deny) { td =>
              val spark = corpus.sparkSession
              import spark.implicits._
              val qDf = queries.toDF("_qid", "_qb")
              val filtered = pred.map(td.filter).getOrElse(td)
              Knn.scoreGate(filtered
                .select(col(ridName).cast("long").as("vec_id"),
                  col(vc.field).as("_c"))
                .crossJoin(broadcast(qDf))
                .select(col("_qid"), Knn.scoreInt8(metric, col("_c"), col("_qb")).as("_score"),
                  col("vec_id"))
                .filter(col("_score").isNotNull), gMin, gMax)
            } { kb =>
              graft.operators.BinaryIndex.searchBatchIvfResidual(served,
                col(vc.field), ivf, walkQs, kb, nprobeOf(ivf),
                math.max(shortlist, kb), idCol = col(ridName),
                metric = metric, qb = qbBits, minScore = gMin,
                maxScore = gMax, rerankInt8 = Some(queries))
                .select(col("_qid"), col("_id").cast("long").as("vec_id"),
                  col("_score"))
            }
            finishBatch(joinBack(hits, Seq(col("_qid"))), metric)
          }
        }
      // INT8 over the compressed families
      // ([[IndexLifecycle.rebuildIvfPqInt8]] / [[IndexLifecycle.rebuildScannInt8]]
      // — SCANN shares the serving composition, only its codebook
      // training loss and recall default differ): codebooks live in the
      // raw-code float domain, the ADC shortlist probes/scores with the
      // quantized query's code values as floats, and the recallNum exact
      // rerank runs the INTEGER kernels over the stored int8 column —
      // full probe + deep recall stays exact. Gates apply at the rerank
      // heap (in-scan, gamma_common_data.h:94-96); tail legs brute-score
      // the buffer with the integer kernels.
      case Some("IVFPQ" | "GPU_IVFPQ" | "IVFPQ_RELAYOUT" | "SCANN")
          if routable && vopts.exists(_.valueType == "int8") &&
            Set("ip", "l2", "l2sq")
              .contains(metricOf(space, req.vectors.head.field)) =>
        val metric = metricOf(space, req.vectors.head.field)
        val isScann = vopts.exists(_.indexType == "SCANN")
        val ready =
          if (isScann) lifecycle.readyScann(metric)
          else lifecycle.readyIvfPq(metric)
        ready.map { case (table, ivf, pq) =>
          val vc = req.vectors.head
          val k = req.limit + req.offset
          val recallNum = math.max(
            param("recall_num", vopts.get)
              .getOrElse(if (isScann) math.max(10 * k, 100) else k), k)
          val deny =
            (if (isScann) lifecycle.readyScannGen() else lifecycle.readyPqGen())
              .map(lifecycle.deletedSince).getOrElse(Set.empty[Long])
          val served0 = applyDeny(table, deny, ridName)
          val served = pred.map(served0.filter).getOrElse(served0)
          def qb(q: Seq[Float]): Array[Byte] =
            graft.functions.VecKernels.quantizeI8(
              new org.apache.spark.sql.catalyst.util.GenericArrayData(q.toArray))
          if (vc.queries.size == 1) {
            val qBytes = qb(vc.queries.head)
            val qWalk: Seq[Float] = qBytes.toSeq.map(_.toFloat)
            if (!tailOn)
              finish(graft.operators.PqIndex.searchIvfResidual(served,
                col(vc.field), ivf, pq, qWalk, k, nprobeOf(ivf), recallNum,
                idCol = col("_id"), minScore = gMin, maxScore = gMax,
                rerankInt8 = Some(qBytes)), metric)
            else {
              val hits = tailMergeWith(k, metric, deny) { td =>
                Knn.searchInt8(td, col(vc.field), qBytes, k, metric,
                  filter = pred, minScore = gMin, maxScore = gMax,
                  tieBreak = Some(col("_id")))
                  .select(col(ridName).cast("long").as("vec_id"), col("_score"))
              } { kb =>
                graft.operators.PqIndex.searchIvfResidual(served,
                  col(vc.field), ivf, pq, qWalk, kb, nprobeOf(ivf),
                  math.max(recallNum, kb), idCol = col("_id"),
                  minScore = gMin, maxScore = gMax, rerankInt8 = Some(qBytes))
                  .select(col(ridName).cast("long").as("vec_id"), col("_score"))
              }
              finish(joinBack(hits), metric)
            }
          } else {
            val queries = vc.queries.zipWithIndex.map { case (q, i) =>
              (i.toLong, qb(q)) }
            val walkQs: Seq[(Long, Seq[Float])] = queries.map {
              case (qid, code) => (qid, code.toSeq.map(_.toFloat)) }
            val hits = tailMergeBatchWith(k, metric, deny) { td =>
              val spark = corpus.sparkSession
              import spark.implicits._
              val qDf = queries.toDF("_qid", "_qb")
              val filtered = pred.map(td.filter).getOrElse(td)
              Knn.scoreGate(filtered
                .select(col(ridName).cast("long").as("vec_id"),
                  col(vc.field).as("_c"))
                .crossJoin(broadcast(qDf))
                .select(col("_qid"), Knn.scoreInt8(metric, col("_c"), col("_qb")).as("_score"),
                  col("vec_id"))
                .filter(col("_score").isNotNull), gMin, gMax)
            } { kb =>
              graft.operators.PqIndex.searchBatchIvfResidual(served,
                col(vc.field), ivf, pq, walkQs, kb, nprobeOf(ivf),
                math.max(recallNum, kb), idCol = col(ridName),
                minScore = gMin, maxScore = gMax, rerankInt8 = Some(queries))
                .select(col("_qid"), col("_id").cast("long").as("vec_id"),
                  col("_score"))
            }
            finishBatch(joinBack(hits, Seq(col("_qid"))), metric)
          }
        }
      // INT8 value_type rides the IVF route (the reference serves INT8
      // through every family, index_model.h:19): the coarse quantizer
      // probes with the FLOAT query (centroids live in the de-quantized
      // b/127 domain, [[IndexLifecycle.rebuildInt8]]), probed lists score
      // with the integer-accumulate kernels against the symmetric-
      // quantized query — same quantizer as ingest, so routed ≡ the
      // brute INT8 scan within the probe. Single and batched; gates
      // in-scan like the float arm.
      case Some("IVFFLAT" | "GPU_IVFFLAT")
          if routable && vopts.exists(_.valueType == "int8") =>
        val metric = metricOf(space, req.vectors.head.field)
        for (table <- lifecycle.readyIndex(); model <- lifecycle.loadModel(metric))
          yield {
            val vc = req.vectors.head
            val k = req.limit + req.offset
            val served = applyDeny(table, ivfDeny, ridName)
            def qb(q: Seq[Float]): Array[Byte] =
              graft.functions.VecKernels.quantizeI8(
                new org.apache.spark.sql.catalyst.util.GenericArrayData(q.toArray))
            if (vc.queries.size == 1) {
              val qf = vc.queries.head
              val qBytes = qb(qf)
              if (!tailOn)
                finish(IvfIndex.searchInt8(served, col(vc.field), model, qf,
                  qBytes, k, nprobeOf(model), filter = pred, minScore = gMin,
                  maxScore = gMax, tieBreak = Some(col("_id"))), metric)
              else {
                // int8 tail leg: integer kernels over the buffer, same
                // quantized query — both legs gate in-scan
                val hits = tailMergeWith(k, metric, ivfDeny) { td =>
                  Knn.searchInt8(td, col(vc.field), qBytes, k, metric,
                    filter = pred, minScore = gMin, maxScore = gMax,
                    tieBreak = Some(col("_id")))
                    .select(col(ridName).cast("long").as("vec_id"), col("_score"))
                } { kb =>
                  IvfIndex.searchInt8(served, col(vc.field), model, qf,
                    qBytes, kb, nprobeOf(model), filter = pred,
                    minScore = gMin, maxScore = gMax,
                    tieBreak = Some(col("_id")))
                    .select(col(ridName).cast("long").as("vec_id"), col("_score"))
                }
                finish(joinBack(hits), metric)
              }
            } else {
              val queries = vc.queries.zipWithIndex.map { case (q, i) =>
                (i.toLong, q, qb(q)) }
              val hits = tailMergeBatchWith(k, metric, ivfDeny) { td =>
                val spark = corpus.sparkSession
                import spark.implicits._
                val qDf = queries.map { case (qid, _, code) => (qid, code) }
                  .toDF("_qid", "_qb")
                val filtered = pred.map(td.filter).getOrElse(td)
                Knn.scoreGate(filtered
                  .select(col(ridName).cast("long").as("vec_id"),
                    col(vc.field).as("_c"))
                  .crossJoin(broadcast(qDf))
                  .select(col("_qid"), Knn.scoreInt8(metric, col("_c"), col("_qb")).as("_score"),
                    col("vec_id"))
                  .filter(col("_score").isNotNull), gMin, gMax)
              } { kb =>
                val servedF = pred.map(served.filter).getOrElse(served)
                IvfIndex.searchBatchInt8(servedF, col(vc.field),
                  struct(col(ridName)), queries, model, kb, nprobeOf(model),
                  minScore = gMin, maxScore = gMax)
                  .select(col("_qid"),
                    col(s"_item.$ridName").cast("long").as("vec_id"),
                    col("_score"))
              }
              finishBatch(joinBack(hits, Seq(col("_qid"))), metric)
            }
          }
      case _ => None
    }
    routed.getOrElse(search(live, space, requestJson))
  }

  /** `POST /document/query` → DataFrame: document_ids path (request order)
    * or filtered scan with limit/offset. No scoring, no defined global
    * order beyond the reference's (we sort by `_id` for determinism only
    * when neither ids nor filters demand an order).
    */
  def query(corpus: DataFrame, space: Space, requestJson: String): DataFrame = {
    val j = JsonMethods.parse(requestJson)
    val req = parseSearch(
      JsonMethods.compact(JsonMethods.render(j removeField {
        case ("document_ids", _) => true; case _ => false })), space)
    (j \ "document_ids") match {
      case JArray(ids) if ids.nonEmpty =>
        val idSeq = ids.collect { case JString(s) => s }
        val spark = corpus.sparkSession
        import spark.implicits._
        val reqDf = idSeq.zipWithIndex.map { case (id, i) => (i, id) }.toDF("_ord", "_id")
        corpus.join(broadcast(reqDf), Seq("_id")).orderBy(col("_ord"))
          .limit(req.limit)
          .select(projection(space, req, Seq.empty): _*)
      case _ =>
        val pred = req.filter.map(
      VearchFilters.parse(_, arrayFields(space), dateFields(space)))
        val filtered = pred.map(corpus.filter).getOrElse(corpus)
        // sort spec defines the scan order (sortorder/parse.go); `_id`
        // appended keeps the page boundary deterministic on ties
        val ordered =
          if (req.sort.nonEmpty) filtered.orderBy(sortCols(req.sort) :+ col("_id").asc: _*)
          else filtered.orderBy(col("_id"))
        val sliced = if (req.offset > 0) ordered.offset(req.offset) else ordered
        sliced.limit(req.limit).select(projection(space, req, Seq.empty): _*)
    }
  }
}
