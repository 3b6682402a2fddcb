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
      maxScore: Option[Double],
      // per-condition `index_type` override (doc_query.go:277-283: the
      // request's type wins over the space's declared one); "FLAT"
      // forces the exact brute scan for THIS condition
      indexType: Option[String] = None)

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

  /** The unservable-shape error for graph families over a space with no
    * long routing-id space — shared by [[legFor]]'s noDocidRoute and the
    * realtime-tail early return so the fail-loud contract is identical
    * with and without a tail.
    */
  private def noDocidMsg(spaceName: String, field: String,
      family: String): String =
    s"space '$spaceName' has no docid mapping: graph index " +
      s"family $family on field '$field' routes by long " +
      "vec_id, but the corpus has neither an integral `_id` nor " +
      "a `_docid` sidecar. Ingest through the catalog path " +
      "(Ingest.assignDocids mints `_docid` for string-PK " +
      "spaces), declare a scan family instead, or force the " +
      "exact scan with index_type=FLAT / is_brute_search=1"

  /** Integral wire slot (the reference's SearchDocumentRequest int32
    * fields, search_doc.go:71-92): PRESENT but non-integer JSON is the
    * reference's unmarshal PARAM_ERROR — never a silent default. The
    * score-filter bug's siblings died here (r20).
    */
  private def intField(j: JValue, name: String): Option[Int] =
    (j \ name) match {
      case JNothing | JNull => None
      // BigInt.toInt WRAPS silently — out-of-int32 is the reference's
      // "out of range" unmarshal error, not a truncated value
      case JInt(n) if n.isValidInt => Some(n.toInt)
      case other => throw new IllegalArgumentException(
        s"unmarshal err: [$name] must be an int32, got " +
          s"[${JsonMethods.compact(JsonMethods.render(other))}]")
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
        // `symbol`+`value` is the score filter's other wire form
        // (doc_query.go:72-73): ">"/">=" set min_score, "<"/"<=" set
        // max_score (applied :1220-1232, overriding an explicit
        // min_score/max_score on that side); any other symbol with a
        // value is the reference's parse error (:1240). A `value`
        // without a symbol falls into the same error (TrimSpace("") is
        // not a known symbol).
        var minS = doubleOf(v \ "min_score")
        var maxS = doubleOf(v \ "max_score")
        // a PRESENT but non-numeric `value` is the reference's JSON
        // unmarshal error (doc_query.go:72 — float64 field): failing
        // loud here keeps a client typo from silently running ungated
        (v \ "value") match {
          case JNothing | JNull => ()
          case numeric if doubleOf(numeric).isDefined => ()
          case other => throw new IllegalArgumentException(
            s"score filter value must be numeric, got [$other]")
        }
        doubleOf(v \ "value").foreach { vv =>
          ((v \ "symbol") match {
            case JString(s) => s.trim; case _ => ""
          }) match {
            case ">" | ">=" => minS = Some(vv)
            case "<" | "<=" => maxS = Some(vv)
            case other => throw new IllegalArgumentException(
              s"symbol value unknow:[$other]")
          }
        }
        // per-condition index_type (doc_query.go:277-283): empty falls
        // back to the declared type; "FLAT" is the per-condition brute
        // override (the decode switch :296-301 treats it as a plain
        // float request); anything else must name the field's declared
        // index — this engine has no per-field side indexes beyond the
        // declaration, so an unservable type fails loud, not silently
        val idxType = (v \ "index_type") match {
          case JString(s) if s.trim.nonEmpty => Some(s.trim)
          case _ => None
        }
        idxType.foreach { t =>
          val declared = space.vectorFields.find(_.name == field)
            .flatMap(_.vector).map(_.indexType)
          // aliases that serve from the identical layout are accepted
          // both ways (GPU_* execute on CUDA in the reference, CPU
          // layout here; SSG shares the Vamana generation) — rejecting
          // e.g. index_type IVFFLAT against a declared GPU_IVFFLAT
          // would fail a request the engine can serve exactly
          def canon(x: String) = x match {
            case "GPU_IVFFLAT" => "IVFFLAT"
            case "GPU_IVFPQ" | "IVFPQ_RELAYOUT" => "IVFPQ"
            case "SSG" => "DISKANN_STATIC"
            case other => other
          }
          require(t == "FLAT" || declared.map(canon).contains(canon(t)),
            s"index_type [$t] does not match field [$field] declared " +
              s"index type [${declared.getOrElse("")}]")
        }
        // per-condition `format` is VALIDATE-ONLY in the reference
        // (doc_query.go:321-327, skipped for BINARYIVF): the known
        // names pass through — normalization itself rides the SPACE
        // declaration (client.go:603-665) — and an unknown name is the
        // reference's parse error
        val effType = idxType.orElse(space.vectorFields.find(_.name == field)
          .flatMap(_.vector).map(_.indexType)).getOrElse("")
        (v \ "format") match {
          case JString(f) if f.nonEmpty && effType != "BINARYIVF" &&
              !Set("normalization", "normal", "no").contains(f) =>
            throw new IllegalArgumentException(
              s"unknow vector process format:[$f]")
          case _ => ()
        }
        VecCond(field, flat.grouped(dim).toSeq, minS, maxS, idxType)
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
    // limit 0 = absent = the reference's DefaultSize 50
    // (doc_query.go:1412-1415); a negative topN has no defined serving
    // order — fail loud, not a Spark limit() error three stages later
    val limit = intField(j, "limit").filter(_ != 0).getOrElse(50)
    if (limit < 0) throw new IllegalArgumentException(
      s"limit should be a positive integer, got [$limit]")
    // page_size/page_num slicing (client.go:888-899) or plain offset;
    // the product is computed in Long — Int math would wrap
    // (65536 * 65537 → page 1 served silently)
    val offset = (intField(j, "page_size"), intField(j, "page_num")) match {
      case (Some(ps), Some(pn)) if pn > 0 =>
        val off = ps.toLong * (pn - 1)
        if (off > Int.MaxValue) throw new IllegalArgumentException(
          s"page_size*page_num out of range: $ps * $pn")
        off.toInt
      case _ => intField(j, "offset").getOrElse(0)
    }
    if (offset < 0) throw new IllegalArgumentException(
      s"offset should not be negative, got [$offset]")
    // only WeightedRanker exists (doc_query.go:44,208-209): a ranker
    // object naming any other type is the reference's parse error
    (j \ "ranker" \ "type") match {
      case JString(t) if t != "WeightedRanker" =>
        throw new IllegalArgumentException(
          s"unsupport ranker type: $t, now only support WeightedRanker")
      case _ => ()
    }
    val weights = (j \ "ranker" \ "params" \ "weights") match {
      case JArray(ws) => Some(ws.flatMap(doubleOf))
      case _ => None
    }
    val brute = intField(j, "is_brute_search").getOrElse(2)
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
    // index_params unmarshals into a typed struct in the reference
    // (entity.IndexParams, space.go:76-85 + the engine-side keys): a
    // known INT key with a non-integer value is the unmarshal
    // PARAM_ERROR (doc_query.go:1475-1478), `metric_type` must name a
    // supported metric (space.go:334-336 — validated here, the DECLARED
    // metric still governs scoring), and unknown keys are ignored like
    // Go's json.Unmarshal ignores unknown fields
    val intParamKeys = Set("nprobe", "efSearch", "efConstruction",
      "nlinks", "ncentroids", "nsubvector", "training_threshold",
      "recall_num", "l_search", "L", "beam_width", "qb", "parallel_on_queries")
    val reqIndexParams: Map[String, Int] = (j \ "index_params") match {
      case JObject(kvs) =>
        kvs.foreach {
          // JSON null = "no value" in Go's unmarshal — accepted, ignored
          case (_, JNull) => ()
          case (k, v) if intParamKeys.contains(k) &&
              !v.isInstanceOf[JInt] =>
            throw new IllegalArgumentException(
              s"unmarshal err: index_params [$k] must be an integer, got " +
                s"[${JsonMethods.compact(JsonMethods.render(v))}]")
          case (k, JInt(v)) if intParamKeys.contains(k) && !v.isValidInt =>
            throw new IllegalArgumentException(
              s"unmarshal err: index_params [$k] out of int32 range: $v")
          case ("metric_type", JString(m))
              if m != "L2" && m != "InnerProduct" =>
            throw new IllegalArgumentException(
              s"index params metric_type not support: $m, should be L2 " +
                "or InnerProduct")
          case ("metric_type", v) if !v.isInstanceOf[JString] =>
            throw new IllegalArgumentException(
              "unmarshal err: index_params [metric_type] must be a string, " +
                s"got [${JsonMethods.compact(JsonMethods.render(v))}]")
          case _ => ()
        }
        kvs.collect { case (k, JInt(v)) if v.isValidInt => k -> v.toInt }.toMap
      case JNothing | JNull => Map.empty
      case other => throw new IllegalArgumentException(
        s"unmarshal err: index_params must be an object, got " +
          s"[${JsonMethods.compact(JsonMethods.render(other))}]")
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

  /** The graph-family-servable predicate (round 21, shared contract with
    * [[searchAuto]]'s legFor): Some(effective index type) when this
    * condition would enter a graph arm — HNSW/DISKANN_STATIC/SSG under
    * legFor's value-type guards (binary never routes to a graph; int8
    * only with an ip/l2 metric — those shapes fall to the exact FLAT
    * serve instead). The rid-free fail-loud gates must fire exactly for
    * these shapes, tail or no tail; gating on the index type alone made
    * a binary HNSW field error once a RealtimeTail was attached while
    * serving fine without one.
    */
  private def graphRoute(space: Space, vc: VecCond): Option[String] = {
    val eff = vc.indexType.orElse(space.vectorFields
      .find(_.name == vc.field).flatMap(_.vector).map(_.indexType))
      .getOrElse("")
    val vt = valueTypeOf(space, vc.field)
    val i8Metric = Set("ip", "l2", "l2sq").contains(metricOf(space, vc.field))
    val isGraph = eff == "HNSW" || eff == "DISKANN_STATIC" || eff == "SSG"
    if (isGraph && vt != "binary" && (vt != "int8" || i8Metric)) Some(eff)
    else None
  }

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

  // ---- FLAT-path value-type dispatch (index_model.h:19), shared by
  // every brute shape — the brute twins of searchAuto's legFor dispatch:
  // int8 conditions quantize each query with the ingest quantizer and
  // score with the integer kernels; binary conditions sign-binarize and
  // rank by code Hamming (ascending ⇒ direction entry l2); float keeps
  // the metric kernels over the (possibly normalized) request floats.

  /** Ranking direction entry for a condition's field. */
  private def flatDir(space: Space, field: String): String =
    if (valueTypeOf(space, field) == "binary") "l2" else metricOf(space, field)

  /** Batch queries table (_qid, _qv) in the condition's value domain,
    * plus the matching (vector, query) score column — None = the shared
    * metric kernels of [[Knn.searchBatch]].
    */
  private def flatBatchQueries(space: Space, vc: VecCond,
      spark: org.apache.spark.sql.SparkSession)
      : (DataFrame, Option[(Column, Column) => Column]) = {
    import spark.implicits._
    valueTypeOf(space, vc.field) match {
      case "int8" =>
        val m = metricOf(space, vc.field)
        (vc.queries.zipWithIndex.map { case (q, i) =>
          (i.toLong, graft.functions.VecKernels.quantizeI8(
            new org.apache.spark.sql.catalyst.util.GenericArrayData(q.toArray)))
        }.toDF("_qid", "_qv"),
          Some((a: Column, b: Column) => Knn.scoreInt8(m, a, b)))
      case "binary" =>
        (vc.queries.zipWithIndex.map { case (q, i) =>
          (i.toLong, graft.functions.VecKernels.signBits(
            new org.apache.spark.sql.catalyst.util.GenericArrayData(q.toArray))
            .asInstanceOf[Array[Byte]])
        }.toDF("_qid", "_qv"),
          Some((v: Column, qc: Column) =>
            graft.Graft.F.hamming(v, qc).cast("double")))
      case _ =>
        (vc.queries.zipWithIndex
          .map { case (q, i) => (i.toLong, maybeNormalize(space, vc.field, q)) }
          .toDF("_qid", "_qv")
          .select(col("_qid"), col("_qv").cast("array<float>").as("_qv")),
          None)
    }
  }

  /** Single-query score column for a condition (the conjunction's
    * per-field scorer) — None = the metric kernels.
    */
  private def flatScoreFn(space: Space, vc: VecCond): Option[Column => Column] =
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
        (col(vc.field), maybeNormalize(space, vc.field, vc.queries.head),
          flatDir(space, vc.field))
      }
      val scoreFns: Seq[Option[Column => Column]] =
        req.vectors.map(flatScoreFn(space, _))
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
      // per-condition value-type dispatch shared with the single-query
      // conjunction ([[flatBatchQueries]])
      val perField = req.vectors.zipWithIndex.map { case (vc, i) =>
        val (queries, scoreFn) = flatBatchQueries(space, vc, spark)
        Knn.searchBatch(filtered, col(vc.field), struct(col("_id")), queries,
          "_qid", "_qv", perFieldK, flatDir(space, vc.field),
          minScore = vc.minScore, maxScore = vc.maxScore, scoreFn = scoreFn)
          .select(col("_qid"), col("_item._id").as("_id"), col("_score").as(s"_s$i"))
      }
      val joined = perField.reduceLeft((a, b) => a.join(b, Seq("_qid", "_id")))
      val combined = (0 until nf).map(i => col(s"_s$i") * lit(w(i))).reduceLeft(_ + _)
      val headAsc = Knn.ascending(flatDir(space, req.vectors.head.field))
      val agged = joined.withColumn("_score", combined)
        .groupBy(col("_qid"))
        .agg(graft.Graft.F.topK(col("_score"), struct(col("_id")),
          req.limit + req.offset, headAsc).as("_tk"))
      val sliced =
        if (req.offset > 0) agged.withColumn("_tk", slice(col("_tk"), req.offset + 1, req.limit))
        else agged
      // blocks in REQUEST order (the reference's response shape), rows
      // by score within each block — the same contract as the routed
      // finishBatch (the r20 parity sweep caught the unordered gap)
      val primaryB = if (headAsc) col("_score").asc else col("_score").desc
      val out = sliced.select(col("_qid"), explode(col("_tk")).as("_e"))
        .select(col("_qid"), col("_e.item._id").as("_id"), col("_e.score").as("_score"))
        .orderBy(col("_qid").asc, primaryB, col("_id").asc)
      // sort spec re-orders rows WITHIN each query's block
      if (req.sort.nonEmpty) applySort(out, req.sort, qid = Some(col("_qid")))
      else out
    } else {
      // one field, req_num > 1 → batch: one result block per query id;
      // value-type dispatch through [[flatBatchQueries]]
      val vc = req.vectors.head
      val spark = corpus.sparkSession
      val (queries, scoreFn) = flatBatchQueries(space, vc, spark)
      val m = flatDir(space, vc.field)
      val filtered = pred.map(corpus.filter).getOrElse(corpus)
      val payload = struct(corpus.columns.map(col).toIndexedSeq: _*)
      // gates + pagination inside the batch operator (pre-selection gate,
      // per-qid offset slice) — same semantics as the single-query path
      val res = Knn.searchBatch(filtered, col(vc.field), payload, queries,
        "_qid", "_qv", req.limit, m,
        minScore = vc.minScore, maxScore = vc.maxScore, offset = req.offset,
        scoreFn = scoreFn)
      val flat = res.select(col("_qid"), col("_score"), col("_item.*"))
      // blocks in REQUEST order, rows by score within each block — the
      // routed finishBatch contract (r20 parity sweep caught the gap)
      val primaryB =
        if (Knn.ascending(m)) col("_score").asc else col("_score").desc
      val projected = flat
        .select(projection(space, req, Seq("_qid", "_score")): _*)
        .orderBy(col("_qid").asc, primaryB, col("_id").asc)
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

  /** Driver-side twin of the catalog layout's `_bucket = pmod(hash(_id),
    * nb)` (SpaceCatalog.withBucket) for ANY PK type (the canonical
    * `_id` is a string): Spark's `hash()` is Murmur3 with seed 42 over
    * the column's NATIVE type, so an IntegerType PK must hash as Int.
    * `Literal.create` runs the same Catalyst type conversion the column
    * hash sees, so string ids hash as UTF8String exactly like the layout
    * writer's `hash(col("_id"))`.
    */
  private def bucketOfAny(id: Any, nb: Int,
      idT: org.apache.spark.sql.types.DataType): Int = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}
    val h = new Murmur3Hash(Seq(Literal.create(id, idT)))
      .eval(null).asInstanceOf[Int]
    ((h % nb) + nb) % nb
  }

  /** Score-gated GRAPH serving (min_score/max_score per vector
    * condition, doc_query.go:67-78), the driver-bounded depth loop: each
    * probe runs ONE action aggregating (candidate count, gated top-k)
    * through the bounded TopKAgg heap, so the driver receives one count
    * plus <= k (vec_id, _score) pairs per probe - never a depth-or-
    * corpus-sized collect, whatever the gate's selectivity. Exactness: k
    * gated survivors inside the returned top-depth dominate every
    * candidate beyond it; a candidate count SHORTER than depth proves
    * every admissible candidate was already seen - either way the gated
    * top-k equals the FLAT path's gate-before-select. Ungated requests
    * bypass the loop entirely (hitsAt(k), zero extra actions).
    *
    * The graph walks now thread the band into their RESULT heaps
    * ([[graft.operators.HnswIndex.searchSegment]]'s band contract), so
    * hitsAt(d) returns the GATED ranking's own prefix and the first
    * probe converges (gated.size >= k, or n < depth at exhaustion) - one
    * walk instead of re-paying segment IO per doubling. The doubling
    * loop remains as the exactness backstop for any hitsAt that does not
    * gate in-walk. Scan-shaped families never come here: they gate
    * IN-SCAN (gamma_common_data.h:94-96) inside their operators. The
    * multi-field conjunctive legs pass EACH CONDITION's own gate (the
    * reference gates per condition before the docid intersection).
    */
  private[graft] def gateLoop(spark: org.apache.spark.sql.SparkSession,
      k: Int, metric: String, minScore: Option[Double],
      maxScore: Option[Double])(hitsAt: Int => DataFrame): DataFrame = {
    if (minScore.isEmpty && maxScore.isEmpty) return hitsAt(k)
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

  /** Batched [[gateLoop]] (req_num queries share the condition's gate -
    * doc_query.go:296-318 flattens them into one request): hitsAt(d)
    * returns per-qid top-d (_qid, vec_id, _score); each probe's single
    * action aggregates per-qid (count, gated top-k) - <= req_num rows of
    * <= k entries on the driver. The loop continues until EVERY query
    * has k gated survivors or is exhausted; queries already satisfied
    * at a lower depth stay exact at higher depths (more candidates
    * never change the gated top-k once it dominates).
    */
  private[graft] def gateBatchLoop(spark: org.apache.spark.sql.SparkSession,
      k: Int, metric: String, minScore: Option[Double],
      maxScore: Option[Double])(hitsAt: Int => DataFrame): DataFrame = {
    if (minScore.isEmpty && maxScore.isEmpty) return hitsAt(k)
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
    *
    * EXECUTION CONTRACT (r18): a routed request runs its index legs as
    * ONE bounded action at construction — the ≤ req_num·(k+offset) hits
    * materialize so their ids can prune the payload scan (id-IN +
    * `_bucket IN`, the reference's O(k) docid point reads) — and the
    * returned frame is the pruned payload fetch over those local hits.
    * A search request is meant to execute (the reference's handler does
    * exactly this), so construction-time work IS request work; only the
    * FLAT fallback stays a fully lazy plan.
    */
  def searchAuto(corpus0: DataFrame, space: Space, requestJson: String,
      lifecycle: IndexLifecycle,
      tail: Option[graft.streaming.RealtimeTail] = None): DataFrame = {
    val req = parseSearch(requestJson, space)
    import org.apache.spark.sql.types.{IntegerType, LongType}
    // a corpus still carrying the catalog's physical `_bucket` partition
    // column (the id-hash layout, `_bucket = pmod(hash(_id), nb)`) keeps
    // it INTERNAL — dropped before any serving logic sees the frame —
    // but the bucketed original stays available so the payload fetch in
    // [[joinBack]] can PARTITION-PRUNE to the hit ids' buckets, the
    // Spark shape of the reference's O(k) docid point reads
    // (engine.cc:902-911). `_graft_buckets` (the layout's bucket count)
    // rides the space dir; without it the id-IN pushdown still prunes
    // row groups on any plain-parquet space.
    val bucketedCorpus: Option[DataFrame] =
      if (corpus0.columns.contains("_bucket")) Some(corpus0) else None
    val corpus = bucketedCorpus.map(_.drop("_bucket")).getOrElse(corpus0)
    lazy val bucketNb: Option[Int] = bucketedCorpus.flatMap { _ =>
      val p = s"${lifecycle.path}/_graft_buckets"
      if (graft.sources.SidecarIO.exists(p))
        scala.util.Try(graft.sources.SidecarIO.readString(p).trim.toInt)
          .toOption.filter(_ > 0)
      else None
    }
    val idIntegral = corpus.schema.fields.find(_.name == "_id").exists(f =>
      f.dataType == LongType || f.dataType == IntegerType)
    // ROUTING id — the long column index hits, delete-ledger entries and
    // tail merges reference: the integral PK itself, or the `_docid`
    // sidecar the ingest assigns to string-PK spaces
    // ([[Ingest.assignDocids]] — the reference maps every string `_id`
    // to a dense int docid at ingest so indexes never see strings,
    // engine.cc:730-745, and auto-generates string UUIDs when `_id` is
    // absent, client.go:1197-1221). A string-PK space WITHOUT the
    // sidecar still serves the SCAN families (their layouts carry the
    // PK, see [[legFor]]'s asVecId contract); graph families need the
    // long id space and FAIL LOUD (legFor's noDocidRoute — the exact
    // FLAT escape stays explicit via index_type=FLAT/is_brute_search),
    // and the realtime tail keeps the documented FLAT fallback below.
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
    // sidecar can't ride them — SCAN families serve the live view
    // exactly (the documented tail degradation), but a GRAPH family
    // stays structurally unservable here too: the SAME fail-loud
    // contract as [[legFor]]'s noDocidRoute, tail or no tail — a
    // request must not silently change from error to O(corpus) brute
    // because a RealtimeTail was attached (explicit index_type=FLAT
    // and is_brute_search=1 escapes pass through, as everywhere)
    if (tailOn && rid.isEmpty) {
      if (req.isBruteSearch != 1)
        req.vectors.foreach { vc =>
          // same servability predicate as legFor's noDocidRoute (shared
          // helper): value types that never enter a graph arm must not
          // fail-loud here either — tail and no-tail behavior agree
          graphRoute(space, vc).foreach(eff =>
            throw new IllegalArgumentException(
              noDocidMsg(space.name, vc.field, eff)))
        }
      return search(live, space, requestJson)
    }
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
    // routable shapes: single-condition requests (single query or the
    // req_num batch the reference flattens into one index request,
    // doc_query.go:296-318) and multi-field conjunctions route through
    // [[legFor]]; is_brute_search=1 forces the exact FLAT scan
    // (engine.cc:280-308).
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
    // query's block (row_number over <= req_num*(k+offset) hit rows - tiny)
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
    // score-gated GRAPH serving: see [[gateLoop]]/[[gateBatchLoop]] on
    // the object — the walks thread the band into their RESULT heaps, so
    // the loop's first probe already returns the gated ranking's prefix
    // and convergence is immediate; the loop stays as the exactness
    // backstop for any hitsAt that does NOT gate in-walk.
    // the walk returns (id, score); scalar payloads come from ONE
    // broadcast join of the <= req_num*(k+offset) hits back onto a
    // PRUNED slice of the LIVE view (a tail hit's payload lives in the
    // buffer, not the base table). The hits are bounded, so ONE tiny
    // action materializes them (free for the gate loops - their hits are
    // already local rows) and their ids push INTO the payload scan:
    // `rid IN (ids)` always (parquet row-group skipping), plus
    // `_bucket IN (pmod(hash(id), nb))` partition pruning on a
    // catalog-bucketed space - the reference's O(k) docid point reads
    // (engine.cc:902-911), never a full corpus read per query. The join
    // keys on the ROUTING column - for a string-PK space that is the
    // `_docid` sidecar (bucket derivation needs the PK hash, so those
    // spaces prune by id-IN only), and the joined row carries the string
    // `_id` the projection serves (the reference's docid->PK bridge).
    def joinBack(hits: DataFrame, extra: Seq[Column] = Seq.empty): DataFrame = {
      val idT = corpus.schema(ridName).dataType
      // hits carry the routing id as `vec_id`: a LONG for every routed
      // family, the PK itself (native type) on the rid-free scan serve —
      // casting to the routing column's type at collect time keeps the
      // local frame, the id-IN filter and the bucket hash all in the
      // column's own domain (long→int narrows, string stays string)
      val sel = hits.select(
        Seq(col("vec_id").cast(idT).as("vec_id"),
          col("_score").cast("double").as("_score")) ++ extra: _*)
      val rows = sel.collect()
      val spark = corpus.sparkSession
      val local = spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), sel.schema)
      val idVals: Seq[Any] = rows.map(_.get(0)).distinct.toSeq
      val idFilter =
        if (idVals.isEmpty) lit(false) else col(ridName).isin(idVals: _*)
      // exactness of pruning BEFORE the tail upsert: it only applies
      // when the routing column IS the PK (`_id`), so every version of
      // a document shares its routing id - a superseded base row and
      // its buffered update filter identically
      val pruned = (bucketedCorpus, bucketNb) match {
        case (Some(b), Some(nb)) if ridName == "_id" && idVals.nonEmpty =>
          val bks = idVals.map(bucketOfAny(_, nb, idT)).distinct
          val baseP =
            b.filter(col("_bucket").isin(bks: _*) && idFilter).drop("_bucket")
          if (tailOn)
            graft.operators.Documents.upsert(baseP,
              tail.get.buffered(corpus.schema, lifecycle.allDeletes())
                .filter(idFilter), "_id")
          else baseP
        case _ => live.filter(idFilter)
      }
      pruned.join(broadcast(local.select(
        Seq(col("vec_id").as(ridName), col("_score")) ++ extra: _*)),
        ridName)
    }
    // shared scalar-filter functor for the GRAPH families: ONE bounded
    // take() both probes the selectivity and collects the allow-set (the
    // reference's planner switch, engine.cc:355-373) - a broad filter's
    // ids never reach the driver past the cap, and the probe runs over
    // the LIVE view so fresh tail rows that match the filter are
    // admitted too. Lazy: evaluated only when a graph leg actually needs
    // it, and at most once per request (multi-field conjunctions share
    // it across every graph leg). Some(None) = no filter; None = broad
    // filter -> the whole request degrades to filter-first brute FLAT.
    lazy val allowProbe: Option[Option[Set[Long]]] = pred match {
      case Some(p) =>
        val probed = live.filter(p).select(col(ridName).cast("long"))
          .take(maxFilterAllowIds + 1)
        if (probed.length > maxFilterAllowIds) None
        else Some(Some(probed.map(_.getLong(0)).toSet))
      case None => Some(None)
    }
    // one precedence chain for every index param: request index_params
    // override the field's space params (doc_query.go:1475-1522) - the
    // callers supply the default (and any cap) at the use site
    def param(name: String,
        opts: graft.schema.VectorOptions): Option[Int] =
      req.indexParams.get(name).filter(_ > 0)
        .orElse(opts.indexParams.get(name).filter(_ > 0))

    // ------ ONE SERVING RECIPE PER FAMILY ------------------------------
    // legFor builds the index-served hits for ONE vector condition - the
    // same builder backs the single-condition arms, the multi-field
    // conjunction legs and their batched (req_num > 1) twins, so each
    // family's filter/gate/tail plumbing exists exactly once.
    //
    // Shape: (vec_id, _score) hits for a single-query condition,
    // (_qid, vec_id, _score) for a batched one; None = no READY
    // generation or no route for this family x value-type (the caller
    // degrades to the exact FLAT path - the reference's
    // below-training-threshold fallback, engine.cc:280-308), or a broad
    // scalar filter on a graph family (the planner switch,
    // engine.cc:355-373).
    //
    // The recipe per family (vector_manager.cc:941-1176 with the
    // admission gates of gamma_common_data.h:94-105):
    //  - the field's value type picks the distance domain
    //    (index_model.h:19): float -> metric kernels; int8 -> the request
    //    quantizes ONCE with the ingest quantizer, graph walks and ADC
    //    shortlists run in the raw-code float domain (small integers are
    //    exact in float, so walk distances equal the integer kernels
    //    bit-for-bit) while tails and exact reranks use the integer
    //    kernels; binary -> sign codes, Hamming ascending.
    //  - scalar filters: scan families evaluate the predicate IN-SCAN
    //    inside their probed lists; graph families take the shared
    //    [[allowProbe]] allow-set functor, broadcast ONCE per leg -
    //    never re-shipped across gate-loop retries.
    //  - score gates (doc_query.go:67-78): scan families gate IN-SCAN at
    //    heap admission; the beam-limited graph families over-fetch
    //    through the driver-bounded gate loops above.
    //  - realtime tail: every family merges the buffered writes through
    //    mergeTail/mergeTailBatch (vector_manager.cc:941-1012,1096-1176);
    //    the tail leg brute-scores the buffer in the condition's value
    //    domain with the filter and THIS condition's gate in-scan (the
    //    gate is on the final score, so pre-gating the tail stays exact
    //    for the graph loops too - they re-gate the merged stream).
    def legFor(vc: VecCond, lc: IndexLifecycle, k: Int): Option[DataFrame] = {
      val fOptsO = space.vectorFields.find(_.name == vc.field).flatMap(_.vector)
      if (fOptsO.isEmpty) None
      else {
        val fOpts = fOptsO.get
        // hit-id contract: routed families report the LONG routing id as
        // `vec_id`; a rid-FREE space (hand-rolled string PK, no `_docid`
        // sidecar) has no long id space, so the SCAN families — whose
        // layouts store full corpus rows, PK included — report the PK
        // itself and [[joinBack]] bridges in the native type. Graph
        // layouts store long vec_ids structurally, so a rid-free space
        // CANNOT serve them — and silently degrading to the exact FLAT
        // scan would hide an O(corpus)-per-query cliff behind a declared
        // graph index, so those arms FAIL LOUD instead (the reference
        // errors on unservable shapes rather than degrading — its ingest
        // always mints docids, engine.cc:730-745, so this shape only
        // exists when the catalog path was bypassed). The explicit brute
        // escapes stay open: per-condition index_type=FLAT and
        // is_brute_search=1 never enter these arms.
        def noDocidRoute(family: String): Nothing =
          throw new IllegalArgumentException(
            noDocidMsg(space.name, vc.field, family))
        def asVecId(c: Column): Column =
          if (rid.isEmpty) c.as("vec_id") else c.cast("long").as("vec_id")
        val isBin = fOpts.valueType == "binary"
        val isI8 = fOpts.valueType == "int8"
        val fieldMetric = metricOf(space, vc.field)
        // the integer kernels are ip/l2 (matching [[Knn.searchInt8]]) -
        // other int8 metrics keep the FLAT fallback
        val i8Metric = Set("ip", "l2", "l2sq").contains(fieldMetric)
        // binary ranks by code Hamming, ascending => direction entry l2
        val metric = if (isBin) "l2" else fieldMetric
        val batched = vc.queries.size > 1
        // per-query encodings, computed ONCE (normalization is declared
        // float-only - a no-op on int8/binary fields)
        val qsN: Seq[(Long, Seq[Float])] = vc.queries.zipWithIndex.map {
          case (q, i) => (i.toLong, maybeNormalize(space, vc.field, q)) }
        lazy val qI8: Seq[(Long, Array[Byte])] = qsN.map { case (qid, q) =>
          (qid, graft.functions.VecKernels.quantizeI8(
            new org.apache.spark.sql.catalyst.util.GenericArrayData(q.toArray))) }
        lazy val qCodes: Seq[(Long, Array[Byte])] = qsN.map { case (qid, q) =>
          (qid, graft.functions.VecKernels.signBits(
            new org.apache.spark.sql.catalyst.util.GenericArrayData(q.toArray))
            .asInstanceOf[Array[Byte]]) }
        // graph walks and ADC shortlists run on these: raw code values
        // as floats for int8 legs, the (normalized) request floats else
        def walkQs: Seq[(Long, Seq[Float])] =
          if (isI8) qI8.map { case (qid, c) => (qid, c.toSeq.map(_.toFloat)) }
          else qsN
        // this condition's score gate as the graph walks' result-heap
        // band ([lo, hi] on the reported score): the walk returns the
        // gated ranking's own prefix, so the gate loop converges on its
        // first probe. Exact in the same sense as the ungated walk: with
        // ef >= |shard| the walk is exhaustive, and int8 legs' raw-code
        // float domain reports scores identical to the integer kernels.
        val band: Option[(Double, Double)] =
          if (vc.minScore.isDefined || vc.maxScore.isDefined)
            Some((vc.minScore.getOrElse(Double.NegativeInfinity),
              vc.maxScore.getOrElse(Double.PositiveInfinity)))
          else None
        // tail leg, single query: value-typed brute scan of the buffer
        def tailScan(d: Int)(td: DataFrame): DataFrame =
          (if (isBin)
            Knn.searchBinary(td, col(vc.field), qCodes.head._2, d,
              filter = pred, minScore = vc.minScore, maxScore = vc.maxScore,
              tieBreak = Some(col("_id")))
          else if (isI8)
            Knn.searchInt8(td, col(vc.field), qI8.head._2, d, metric,
              filter = pred, minScore = vc.minScore, maxScore = vc.maxScore,
              tieBreak = Some(col("_id")))
          else
            Knn.search(td, col(vc.field), qsN.head._2, d, metric,
              filter = pred, minScore = vc.minScore, maxScore = vc.maxScore,
              tieBreak = Some(col("_id"))))
            .select(col(ridName).cast("long").as("vec_id"), col("_score"))
        def withTail(deny: Set[Long], d: Int)(base: Int => DataFrame): DataFrame =
          if (!tailOn) base(d)
          else tail.get.mergeTail(corpus.schema, d, metric, deny)(tailScan(d))(base)
        // tail leg, batched: ONE pass over the (bounded) buffer serves
        // every query; int8/binary score via a broadcast query cross join
        def tailScanB(d: Int)(td: DataFrame): DataFrame = {
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
              .filter(col("_score").isNotNull), vc.minScore, vc.maxScore)
          else if (isI8)
            Knn.scoreGate(filteredTd
              .select(col(ridName).cast("long").as("vec_id"),
                col(vc.field).as("_c"))
              .crossJoin(broadcast(qI8.toDF("_qid", "_qb")))
              .select(col("_qid"),
                Knn.scoreInt8(metric, col("_c"), col("_qb")).as("_score"),
                col("vec_id"))
              .filter(col("_score").isNotNull), vc.minScore, vc.maxScore)
          else {
            val qDf = qsN.toDF("_qid", "_qv")
              .select(col("_qid"), col("_qv").cast("array<float>").as("_qv"))
            Knn.searchBatch(filteredTd, col(vc.field), struct(col(ridName)),
              qDf, "_qid", "_qv", d, metric,
              minScore = vc.minScore, maxScore = vc.maxScore)
              .select(col("_qid"),
                col(s"_item.$ridName").cast("long").as("vec_id"),
                col("_score"))
          }
        }
        def withTailB(deny: Set[Long], d: Int)(base: Int => DataFrame): DataFrame =
          if (!tailOn) base(d)
          else tail.get.mergeTailBatch(corpus.schema, d, metric, deny)(tailScanB(d))(base)
        // graph-family core (HNSW and Vamana differ only in their walk
        // operators): allow-functor filtering with the broad-filter FLAT
        // switch, ONE allow broadcast per leg, value-typed tail merge.
        // Score gates ride INTO the walk's result heap (the `band`
        // threaded at the case sites below), so a gated leg's first
        // gate-loop probe already returns the gated ranking's prefix and
        // the walk runs ONCE — no depth-doubling segment-IO re-pay, no
        // persist pin needed (the r17 pin existed for the multi-probe
        // loop this replaces).
        def graphLeg(deny: Set[Long])(
            walk: (Seq[Float], Int) => DataFrame)(
            walkBc: (Seq[Float], Int,
              org.apache.spark.broadcast.Broadcast[Set[Long]]) => DataFrame)(
            walkBatch: (Seq[(Long, Seq[Float])], Int,
              Option[Set[Long]]) => DataFrame): Option[DataFrame] =
          allowProbe.map { allow =>
            if (!batched) {
              val base: Int => DataFrame = allow match {
                case Some(a) =>
                  val bc = corpus.sparkSession.sparkContext.broadcast(a -- deny)
                  kb => walkBc(walkQs.head._2, kb, bc)
                case None => kb => walk(walkQs.head._2, kb)
              }
              gateLoop(corpus.sparkSession, k, metric, vc.minScore,
                vc.maxScore)(d => withTail(deny, d)(base))
            } else
              gateBatchLoop(corpus.sparkSession, k, metric, vc.minScore,
                vc.maxScore)(d =>
                withTailB(deny, d)(kb => walkBatch(walkQs, kb, allow)))
          }
        // clustered generations (SPANN layout): prune to the union of
        // every query's nprobe route - the shard_id filter is parquet
        // PARTITION PRUNING over the partitionBy(shard_id) layout, so
        // the pruned segments' IO never happens. Default nprobe =
        // ncentroids (exact serving); requests/spaces narrow it via
        // index_params. Extra shards in a batch's union only add
        // candidates to the per-qid merge - correctness unchanged.
        def pruneShards[S](segments0: org.apache.spark.sql.Dataset[S],
            model: Option[IvfIndex.Model]): org.apache.spark.sql.Dataset[S] =
          model match {
            case Some(m) =>
              val nprobe = math.min(
                param("nprobe", fOpts).getOrElse(m.ncentroids), m.ncentroids)
              val lists = walkQs
                .flatMap(q => m.nearestCentroids(q._2, nprobe)).distinct
              segments0.filter(col("shard_id").isin(lists: _*))
            case None => segments0
          }
        // the request's per-condition index_type wins over the declared
        // one (doc_query.go:277-283); parseSearch validated it, so the
        // only divergent value here is the "FLAT" brute override — no
        // route, the caller serves this condition exactly
        vc.indexType.getOrElse(fOpts.indexType) match {
          case "HNSW" if !isBin && (!isI8 || i8Metric) =>
            if (rid.isEmpty) noDocidRoute("HNSW")
            lc.readyHnswSegments().flatMap { segments0 =>
              val deny = lc.hnswDeleteBaseline()
                .map(lc.deletedSince).getOrElse(Set.empty[Long])
              val segments = pruneShards(segments0, lc.hnswRoutedModel(metric))
              val ef = math.max(param("efSearch", fOpts).getOrElse(64), k)
              graphLeg(deny)(
                (q, kb) => graft.operators.HnswIndex.search(segments, q, kb,
                  math.max(ef, kb), metric, deny = deny, band = band))(
                (q, kb, bc) => graft.operators.HnswIndex.searchFilteredBc(
                  segments, q, kb, math.max(ef, kb), metric, bc, band = band))(
                (qs, kb, allow) => graft.operators.HnswIndex.searchBatch(
                  segments, qs, kb, math.max(ef, kb), metric, deny = deny,
                  allowIds = allow, band = band))
            }
          // the reference's DiskANN-static class
          // (gamma_index_diskann_static.cc): `l_search`/`beam_width`
          // resolve over the space's `L`/`beam_width`
          // (diskann_static_params.h:27-38). SSG - the other flat-graph
          // RNG-family index (wrapped third-party, impl/ssg/) - aliases
          // to the Vamana generation the way GPU_* alias to CPU layouts.
          case t @ ("DISKANN_STATIC" | "SSG")
              if !isBin && (!isI8 || i8Metric) =>
            if (rid.isEmpty) noDocidRoute(t)
            lc.readyVamanaSegments().flatMap { segments0 =>
              val deny = lc.readyVamanaGen()
                .map(lc.deletedSince).getOrElse(Set.empty[Long])
              val segments = pruneShards(segments0, lc.vamanaRoutedModel(metric))
              val l = math.max(
                req.indexParams.get("l_search").filter(_ > 0)
                  .orElse(fOpts.indexParams.get("L").filter(_ > 0))
                  .getOrElse(100), k)
              val bw = param("beam_width", fOpts).getOrElse(4)
              graphLeg(deny)(
                (q, kb) => graft.operators.VamanaIndex.search(segments, q, kb,
                  math.max(l, kb), bw, metric, deny = deny, band = band))(
                (q, kb, bc) => graft.operators.VamanaIndex.searchFilteredBc(
                  segments, q, kb, math.max(l, kb), bw, metric, bc,
                  band = band))(
                (qs, kb, allow) => graft.operators.VamanaIndex.searchBatch(
                  segments, qs, kb, math.max(l, kb), bw, metric, deny = deny,
                  allowIds = allow, band = band))
            }
          // GPU_* spaces execute on CUDA in the reference; here they
          // serve from the equivalent CPU layout - same semantics.
          // `nprobe` resolves request index_params -> space params ->
          // the model default 80 (gamma_index_ivfflat.cc:52-54), capped
          // at ncentroids. INT8 probes with the FLOAT query (centroids
          // live in the de-quantized domain, rebuildInt8) and scores
          // in-scan with the integer kernels.
          case "IVFFLAT" | "GPU_IVFFLAT" if !isBin && (!isI8 || i8Metric) =>
            for (table <- lc.readyIndex(); model <- lc.loadModel(metric)) yield {
              val deny = lc.readyGen()
                .map(lc.deletedSince).getOrElse(Set.empty[Long])
              val served = applyDeny(table, deny, ridName)
              val nprobe = math.min(
                param("nprobe", fOpts).getOrElse(80), model.ncentroids)
              if (!batched)
                // predicate + gate IN-SCAN inside the probed lists -
                // zero over-fetch, no gate loop
                withTail(deny, k)(kb =>
                  (if (isI8)
                    IvfIndex.searchInt8(served, col(vc.field), model,
                      qsN.head._2, qI8.head._2, kb, nprobe, filter = pred,
                      minScore = vc.minScore, maxScore = vc.maxScore,
                      tieBreak = Some(col("_id")))
                  else
                    IvfIndex.search(served, col(vc.field), model,
                      qsN.head._2, kb, nprobe, filter = pred,
                      minScore = vc.minScore, maxScore = vc.maxScore,
                      tieBreak = Some(col("_id"))))
                    .select(asVecId(col(ridName)), col("_score")))
              else {
                // one probe-union pass serves the whole batch
                val servedF = pred.map(served.filter).getOrElse(served)
                withTailB(deny, k)(kb =>
                  (if (isI8)
                    IvfIndex.searchBatchInt8(servedF, col(vc.field),
                      struct(col(ridName)),
                      qsN.zip(qI8).map { case ((qid, q), (_, code)) =>
                        (qid, q, code) },
                      model, kb, nprobe,
                      minScore = vc.minScore, maxScore = vc.maxScore)
                  else
                    IvfIndex.searchBatch(servedF, col(vc.field),
                      struct(col(ridName)), qsN, model, kb, nprobe,
                      minScore = vc.minScore, maxScore = vc.maxScore))
                    .select(col("_qid"), asVecId(col(s"_item.$ridName")),
                      col("_score")))
              }
            }
          // the compressed families: ADC over residual codes inside
          // nprobe lists, then a `recall_num`-deep exact rerank
          // (gamma_index_ivfpq.cc:765-768 - recall_num caps at
          // max(recall_num, k), absent = k). Predicate + delete gate
          // pre-compose into the scan both stages run over; score gates
          // apply at the exact-rerank heap - the stage the final score
          // exists at. SCANN (anisotropic quantization, Guo et al. ICML
          // 2020) shares the serving composition - only its codebook
          // training loss and recall default (10k) differ. INT8 legs
          // shortlist in the raw-code domain, rerank with the integer
          // kernels.
          case "IVFPQ" | "GPU_IVFPQ" | "IVFPQ_RELAYOUT" | "SCANN"
              if !isBin && (!isI8 || i8Metric) =>
            val isScann = fOpts.indexType == "SCANN"
            (if (isScann) lc.readyScann(metric) else lc.readyIvfPq(metric))
              .map { case (table, ivf, pq) =>
                val deny =
                  (if (isScann) lc.readyScannGen() else lc.readyPqGen())
                    .map(lc.deletedSince).getOrElse(Set.empty[Long])
                val served0 = applyDeny(table, deny, ridName)
                val served = pred.map(served0.filter).getOrElse(served0)
                val nprobe = math.min(
                  param("nprobe", fOpts).getOrElse(80), ivf.ncentroids)
                val recallNum = math.max(
                  param("recall_num", fOpts)
                    .getOrElse(if (isScann) math.max(10 * k, 100) else k), k)
                if (!batched)
                  withTail(deny, k)(kb =>
                    graft.operators.PqIndex.searchIvfResidual(served,
                      col(vc.field), ivf, pq, walkQs.head._2, kb, nprobe,
                      math.max(recallNum, kb), idCol = col("_id"),
                      minScore = vc.minScore, maxScore = vc.maxScore,
                      rerankInt8 = if (isI8) Some(qI8.head._2) else None)
                      .select(asVecId(col(ridName)), col("_score")))
                else
                  withTailB(deny, k)(kb =>
                    graft.operators.PqIndex.searchBatchIvfResidual(served,
                      col(vc.field), ivf, pq, walkQs, kb, nprobe,
                      math.max(recallNum, kb), idCol = col(ridName),
                      minScore = vc.minScore, maxScore = vc.maxScore,
                      rerankInt8 = if (isI8) Some(qI8) else None)
                      .select(col("_qid"), asVecId(col("_id")),
                        col("_score")))
              }
          // RaBitQ class: coarse probe, residual sign-code estimator
          // (qb in [0,8]), `recall_num`-deep exact rerank
          // (gamma_index_ivfrabitq.cc:105,214-223)
          case "IVFRABITQ" if !isBin && (!isI8 || i8Metric) =>
            lc.readyIvfRabitq(metric).map { case (table, ivf) =>
              val deny = lc.readyRbGen()
                .map(lc.deletedSince).getOrElse(Set.empty[Long])
              val served0 = applyDeny(table, deny, ridName)
              val served = pred.map(served0.filter).getOrElse(served0)
              val nprobe = math.min(
                param("nprobe", fOpts).getOrElse(80), ivf.ncentroids)
              val shortlist = math.max(
                param("recall_num", fOpts)
                  .getOrElse(math.max(10 * k, 100)), k)
              val qbBits = req.indexParams.get("qb")
                .orElse(fOpts.indexParams.get("qb"))
                .filter(v => v >= 0 && v <= 8).getOrElse(4)
              if (!batched)
                withTail(deny, k)(kb =>
                  graft.operators.BinaryIndex.searchIvfResidual(served,
                    col(vc.field), ivf, walkQs.head._2, kb, nprobe,
                    math.max(shortlist, kb), idCol = col("_id"),
                    metric = metric, qb = qbBits, minScore = vc.minScore,
                    maxScore = vc.maxScore,
                    rerankInt8 = if (isI8) Some(qI8.head._2) else None)
                    .select(asVecId(col(ridName)), col("_score")))
              else
                withTailB(deny, k)(kb =>
                  graft.operators.BinaryIndex.searchBatchIvfResidual(served,
                    col(vc.field), ivf, walkQs, kb, nprobe,
                    math.max(shortlist, kb), idCol = col(ridName),
                    metric = metric, qb = qbBits, minScore = vc.minScore,
                    maxScore = vc.maxScore,
                    rerankInt8 = if (isI8) Some(qI8) else None)
                    .select(col("_qid"), asVecId(col("_id")),
                      col("_score")))
            }
          // binary value_type: the stored column IS the packed code; the
          // request's float features sign-binarize like the FLAT binary
          // path, then route = probe nprobe Hamming-nearest lists
          // (partition pruning), rank by code Hamming - the reference's
          // IndexBinaryIVF semantics (gamma_index_binary_ivf.cc).
          // Hamming IS the final score, so gates apply in-scan.
          case "BINARYIVF" if isBin =>
            lc.readyBinaryIvf().map { case (table, cents) =>
              val deny = lc.readyBivfGen()
                .map(lc.deletedSince).getOrElse(Set.empty[Long])
              val nprobe = math.min(
                param("nprobe", fOpts).getOrElse(80), cents.length)
              if (!batched) {
                val served = applyDeny(table, deny, ridName)
                withTail(deny, k)(kb =>
                  graft.operators.BinaryIndex.searchBinaryIvf(served,
                    vc.field, cents, qCodes.head._2, kb, nprobe,
                    filter = pred, minScore = vc.minScore,
                    maxScore = vc.maxScore, tieBreak = Some(col("_id")))
                    .select(asVecId(col(ridName)), col("_score")))
              } else {
                val served0 = applyDeny(table, deny, ridName)
                val served = pred.map(served0.filter).getOrElse(served0)
                withTailB(deny, k)(kb =>
                  graft.operators.BinaryIndex.searchBatchBinaryIvf(served,
                    vc.field, cents, qCodes, kb, nprobe,
                    idCol = col(ridName), minScore = vc.minScore,
                    maxScore = vc.maxScore)
                    .select(col("_qid"), asVecId(col("_id")),
                      col("_score")))
              }
            }
          case _ => None // no route for this family x value type -> FLAT
        }
      }
    }

    // ------ multi-field conjunctive ROUTING (the reference searches
    // each field's OWN index and intersects docids,
    // vector_manager.cc:859,1024-1087; with a live buffer it merges the
    // buffer into the PER-FIELD searches before the intersection,
    // :1096-1176). Each leg serves through its field's OWN READY
    // generation KIND under the lifecycle's field scope
    // ([[IndexLifecycle.scoped]]) - the (vec_id, _score) intersection
    // join is family-agnostic, so mixed HNSW + IVF + Vamana conjunctions
    // route too. Any field without a READY generation (or a family x
    // value-type with no route) degrades the WHOLE request to FLAT (a
    // partial intersection of one indexed and one brute leg would be no
    // cheaper and harder to bound).
    val multiRouted: Option[DataFrame] =
      if (req.isBruteSearch != 1 && req.vectors.size > 1 &&
          req.vectors.forall(_.queries.size == 1)) {
        // perFieldK scales with limit like the engine's per-index topn
        val perFieldK = math.max(req.limit * 10, 200)
        val legs: Seq[Option[DataFrame]] = req.vectors.map(vc =>
          legFor(vc, lifecycle.scoped(vc.field), perFieldK))
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
      } else None
    if (multiRouted.isDefined) return multiRouted.get

    // ------ BATCHED multi-field conjunctive ROUTING (req_num > 1 on
    // every condition): the reference flattens req_num into one request
    // per field and intersects per (query, docid) (doc_query.go:296-318
    // composed with vector_manager.cc:1024-1087). Each field's batch
    // serves through its OWN READY generation in ONE pass (the
    // per-family batch operators amortize segment reads / probe scans
    // across the whole batch); unroutable shapes keep the FLAT per-field
    // batch fallback.
    val multiBatchRouted: Option[DataFrame] = {
      val reqNum = req.vectors.headOption.map(_.queries.size).getOrElse(0)
      if (req.isBruteSearch != 1 && req.vectors.size > 1 && reqNum > 1 &&
          req.vectors.forall(_.queries.size == reqNum)) {
        val perFieldK = math.max(req.limit * 10, 200)
        val legs: Seq[Option[DataFrame]] = req.vectors.map(vc =>
          legFor(vc, lifecycle.scoped(vc.field), perFieldK))
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
          // binary lead => ascending, like the FLAT twin's legDir
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
      } else None
    }
    if (multiBatchRouted.isDefined) return multiBatchRouted.get

    // ------ single-condition routing: one [[legFor]] leg, payload
    // joined back onto the LIVE view, finished per shape. Generations
    // resolve unscoped first (the single-vector-field convention), then
    // under the field's scope — a single-condition request against a
    // MULTI-field space serves from that field's own generation instead
    // of degrading to FLAT (the reference searches the field's index
    // whatever the request shape, vector_manager.cc:941-1012). No route
    // => the exact FLAT path over the live view (fresh writes are never
    // invisible, whatever the route).
    val routed: Option[DataFrame] =
      if (req.isBruteSearch != 1 && req.vectors.size == 1) {
        val vc = req.vectors.head
        val m = if (valueTypeOf(space, vc.field) == "binary") "l2"
          else metricOf(space, vc.field)
        legFor(vc, lifecycle, req.limit + req.offset)
          .orElse(legFor(vc, lifecycle.scoped(vc.field), req.limit + req.offset))
          .map { hits =>
            if (vc.queries.size == 1) finish(joinBack(hits), m)
            else finishBatch(joinBack(hits, Seq(col("_qid"))), m)
          }
      } else None
    routed.getOrElse(search(live, space, requestJson))
  }

  /** `POST /document/query` → DataFrame: document_ids path (request order)
    * or filtered scan with limit/offset. No scoring, no defined global
    * order beyond the reference's (we sort by `_id` for determinism only
    * when neither ids nor filters demand an order).
    */
  def query(corpus0: DataFrame, space: Space, requestJson: String,
      lifecycle: Option[IndexLifecycle] = None): DataFrame = {
    // same internal `_bucket` contract as [[searchAuto]]: a corpus still
    // carrying the catalog's id-hash partition column partition-prunes
    // the document_ids point reads; the column never reaches results
    val bucketedCorpus: Option[DataFrame] =
      if (corpus0.columns.contains("_bucket")) Some(corpus0) else None
    val corpus = bucketedCorpus.map(_.drop("_bucket")).getOrElse(corpus0)
    lazy val bucketNb: Option[Int] = for {
      _ <- bucketedCorpus
      lc <- lifecycle
      p = s"${lc.path}/_graft_buckets"
      if graft.sources.SidecarIO.exists(p)
      nb <- scala.util.Try(
        graft.sources.SidecarIO.readString(p).trim.toInt).toOption
      if nb > 0
    } yield nb
    val j = JsonMethods.parse(requestJson)
    val req = parseSearch(
      JsonMethods.compact(JsonMethods.render(j removeField {
        case ("document_ids", _) => true; case _ => false })), space)
    (j \ "document_ids") match {
      case JArray(ids) if ids.nonEmpty =>
        // DocumentIds is *[]string in the reference (search_doc.go:84):
        // a non-string element is the unmarshal error, never dropped;
        // a JSON null element unmarshals to "" in Go (matches no doc)
        val idSeq = ids.map {
          case JString(s) => s
          case JNull => ""
          case other => throw new IllegalArgumentException(
            "unmarshal err: document_ids must be strings, got " +
              s"[${JsonMethods.compact(JsonMethods.render(other))}]")
        }
        val spark = corpus.sparkSession
        import spark.implicits._
        // point reads prune like the routed payload fetch: id-IN into
        // the scan always, plus `_bucket IN` partition pruning on a
        // catalog layout (the reference's GetDocs = RocksDB point reads,
        // engine.cc:869-911) — fetch IO tracks |ids|, not the corpus.
        // Wire ids are JSON strings whatever the PK type; an integral PK
        // must coerce BEFORE hashing (`Literal.create(String, LongType)`
        // throws) and before the id-IN/join (ANSI cast of a non-numeric
        // string errors the whole request). A non-coercible id can never
        // match an integral column, so it simply contributes no row —
        // the coercible subset still bucket-prunes.
        import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
        val idT = corpus.schema("_id").dataType
        def coerce(s: String): Option[Any] = idT match {
          case LongType    => s.trim.toLongOption
          case IntegerType => s.trim.toIntOption
          case _           => Some(s)
        }
        val typed: Seq[(Int, Any)] = idSeq.zipWithIndex.flatMap {
          case (s, i) => coerce(s).map(id => (i, id))
        }
        val reqDf = spark.createDataFrame(
          spark.sparkContext.parallelize(
            typed.map { case (i, id) => org.apache.spark.sql.Row(i, id) }, 1),
          StructType(Seq(
            StructField("_ord", IntegerType, nullable = false),
            StructField("_id", idT, nullable = true))))
        val tids = typed.map(_._2)
        val idFilter =
          if (tids.nonEmpty) col("_id").isin(tids: _*) else lit(false)
        val base = (bucketedCorpus, bucketNb) match {
          case (Some(b), Some(nb)) if tids.nonEmpty =>
            val bks = tids.map(bucketOfAny(_, nb, idT)).distinct
            b.filter(col("_bucket").isin(bks: _*) && idFilter).drop("_bucket")
          case _ => corpus.filter(idFilter)
        }
        base.join(broadcast(reqDf), Seq("_id")).orderBy(col("_ord"))
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
