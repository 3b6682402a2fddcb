package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft
import graft.operators.{IvfIndex, Knn, PqIndex}

/** Recall harness replicating the reference CI gates
  * (test/test_recall_baseline.py:301-303: recall@1 ≥ 0.5, @10 ≥ 0.8,
  * @100 ≥ 0.9 vs exact ground truth), at two scales:
  *
  *  - fixture mode (default): the sf embeddings table, scaled params;
  *  - synthetic mode (`SPARK_GRAFT_RECALL_SYNTH=1000000x128`): a
  *    deterministic clustered corpus at the reference's published
  *    benchmark params (ncentroids=1024, nprobe=40, nbytes=64 ⇒ m=64 —
  *    internal/engine/benchs/README.md:70-92), held-out queries.
  *
  * Every stage is BATCHED — one Spark job scores all queries at once
  * (broadcast queries × probed candidates → bounded top-k aggregate), the
  * shape a 1000-executor cluster needs; no per-query driver loop.
  * Prints one JSON line per index configuration.
  */
object Recall {

  /** Deterministic mixture-of-clusters corpus: `nClusters` centers with
    * components uniform in [-2,2) (hash-derived), per-point noise uniform
    * in [-0.2,0.2). ids < n are the corpus; ids in [n, n+nQueries) are
    * held-out queries drawn from the same mixture. All columnar,
    * codegen'd, no driver-side data generation.
    */
  def synthetic(spark: SparkSession, n: Long, dim: Int,
      nClusters: Int, nQueries: Int): DataFrame = {
    import spark.implicits._
    spark.range(n + nQueries).select(
      $"id".as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), j =>
        ((pmod(xxhash64(pmod($"id", lit(nClusters.toLong)), j), lit(2000L))
            .cast("double") / 500.0 - 2.0) +
         (pmod(xxhash64($"id", j + lit(1000000)), lit(2000L))
            .cast("double") / 5000.0 - 0.2)
        ).cast("float")).as("embedding"))
  }

  /** Second evaluation distribution (the reference CI gates run on SIFT +
    * GloVe + NYTimes, test/test_recall_baseline.py:31-45 — clustered
    * integer-ish, normalized word-embedding, and normalized document
    * distributions; one synthetic mixture alone over-fits the gate
    * evidence to one geometry): GloVe/NYTimes-shaped — every vector
    * L2-NORMALIZED onto the unit sphere, with ANISOTROPIC per-dimension
    * energy (component variance decays with dimension index, the spectrum
    * word-embedding matrices exhibit) and larger relative noise than the
    * mixture. Deterministic, columnar, held-out queries as in
    * [[synthetic]].
    */
  def syntheticNormalized(spark: SparkSession, n: Long, dim: Int,
      nClusters: Int, nQueries: Int): DataFrame = {
    import spark.implicits._
    val raw = transform(sequence(lit(0), lit(dim - 1)), j => {
      // leading dims carry ~4× the energy of trailing ones
      val decay = lit(1.0) / (lit(1.0) + j.cast("double") * lit(3.0) / lit(dim))
      (((pmod(xxhash64(pmod($"id", lit(nClusters.toLong)), j, lit(7L)), lit(2000L))
          .cast("double") / 500.0 - 2.0) +
        (pmod(xxhash64($"id", j, lit(9L)), lit(2000L))
          .cast("double") / 2500.0 - 0.4)) * decay).cast("float")
    })
    spark.range(n + nQueries).select(
      $"id".as("vec_id"),
      Graft.F.l2Normalize(raw).as("embedding"))
  }

  /** Exact L2 ground truth @k for every query in one batched pass. */
  def groundTruth(corpus: DataFrame, queries: DataFrame, k: Int): Map[Long, Seq[Long]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    Knn.searchBatch(corpus, $"embedding", struct($"vec_id"), queries, "qid", "qv", k, "l2")
      .select($"_qid", $"_item.vec_id", $"_score")
      .collect().groupBy(_.getLong(0))
      .map { case (qid, rows) =>
        qid -> rows.sortBy(_.getDouble(2)).map(_.getLong(1)).toSeq
      }
  }

  /** Batched IVFFLAT search via [[IvfIndex.searchBatch]] — one probe-join
    * pass for all queries (shuffle = |queries|·k rows, independent of
    * corpus size).
    */
  def evalIvf(assigned: DataFrame, ivf: IvfIndex.Model,
      queries: Array[(Long, Seq[Float])], nprobe: Int, k: Int): Map[Long, Seq[Long]] = {
    val spark = assigned.sparkSession
    import spark.implicits._
    IvfIndex.searchBatch(assigned, $"embedding", struct($"vec_id"),
      queries.toSeq, ivf, k, nprobe)
      .select($"_qid", $"_item.vec_id", $"_score")
      .collect().groupBy(_.getLong(0))
      .map { case (qid, rows) =>
        qid -> rows.sortBy(_.getDouble(2)).map(_.getLong(1)).toSeq
      }
  }

  /** Batched IVFPQ via [[PqIndex.searchBatchIvf]] — per-query ADC LUTs
    * broadcast as data, one code pass for all queries, semi-join rerank.
    */
  def evalIvfPq(encoded: DataFrame, ivf: IvfIndex.Model, pq: PqIndex.Model,
      queries: Array[(Long, Seq[Float])], nprobe: Int, recallNum: Int,
      k: Int): Map[Long, Seq[Long]] = {
    val spark = encoded.sparkSession
    import spark.implicits._
    PqIndex.searchBatchIvf(encoded, $"embedding", ivf, pq, queries.toSeq,
      k, nprobe, recallNum, $"vec_id")
      .collect().groupBy(_.getLong(0))
      .map { case (qid, rows) =>
        qid -> rows.sortBy(_.getDouble(2)).map(_.getLong(1)).toSeq
      }
  }

  /** Batched residual IVFPQ via [[PqIndex.searchBatchIvfResidual]] —
    * per-(query, list) residual LUTs, codes from [[PqIndex.encodeResidual]].
    */
  def evalIvfPqResidual(encoded: DataFrame, ivf: IvfIndex.Model,
      pq: PqIndex.Model, queries: Array[(Long, Seq[Float])], nprobe: Int,
      recallNum: Int, k: Int): Map[Long, Seq[Long]] = {
    val spark = encoded.sparkSession
    import spark.implicits._
    PqIndex.searchBatchIvfResidual(encoded, $"embedding", ivf, pq,
      queries.toSeq, k, nprobe, recallNum, $"vec_id")
      .collect().groupBy(_.getLong(0))
      .map { case (qid, rows) =>
        qid -> rows.sortBy(_.getDouble(2)).map(_.getLong(1)).toSeq
      }
  }

  /** Batched IVFRABITQ: per-(query, probed-list) residual queries ride as
    * broadcast data; one join on list_id scores every probed candidate's
    * residual code, bounded top-shortlist per qid, exact rerank of the
    * survivors — the same shape as [[PqIndex.searchBatchIvf]] with the
    * sign-dot estimator in stage 1.
    */
  def evalIvfRabitq(coded: DataFrame, ivf: IvfIndex.Model,
      queries: Array[(Long, Seq[Float])], nprobe: Int, shortlist: Int,
      k: Int, qb: Int = 4): Map[Long, Seq[Long]] = {
    val spark = coded.sparkSession
    import spark.implicits._
    import graft.operators.BinaryIndex
    val qRows = queries.toSeq.flatMap { case (qid, q) =>
      ivf.nearestCentroids(q, nprobe).map { l =>
        val c = ivf.centroids(l)
        val r = q.toArray.zipWithIndex.map { case (x, i) =>
          x - (if (i < c.length) c(i) else 0f)
        }
        (qid, l, BinaryIndex.quantizeQuery(r.toSeq, qb).toSeq)
      }
    }
    val qDf = qRows.toDF("qid", "list_id", "qres")
      .select($"qid", $"list_id", $"qres".cast("array<float>").as("qres"))
    // static pre-filter on the union of probed lists (partition pruning
    // on a stored layout; the join alone reads every partition)
    val union = qRows.map(_._2).distinct
    val pruned =
      if (union.isEmpty) coded.limit(0)
      else coded.filter($"list_id".isin(union: _*))
    // stage 1: residual codes only; negate the dot so topK(asc) keeps best
    val stage1 = pruned.select($"vec_id", $"list_id", $"rbcode")
      .join(broadcast(qDf), Seq("list_id"))
      .select($"qid", (-Graft.F.signAdot($"rbcode", $"qres")).as("_s"),
        struct($"vec_id").as("_i"))
    val short = topkPerQuery(stage1, shortlist).toSeq
      .flatMap { case (qid, ids) => ids.map(id => (qid, id)) }
    val qvDf = queries.toSeq.toDF("qid", "qv")
      .select($"qid", $"qv".cast("array<float>").as("qv"))
    val rerank = coded.join(
        broadcast(spark.createDataset(short).toDF("qid", "vec_id")), Seq("vec_id"))
      .join(broadcast(qvDf), Seq("qid"))
      .select($"qid", Knn.score("l2", $"embedding", $"qv").as("_s"),
        struct($"vec_id").as("_i"))
    topkPerQuery(rerank, k)
  }

  private def topkPerQuery(scored: DataFrame, k: Int): Map[Long, Seq[Long]] = {
    val spark = scored.sparkSession
    import spark.implicits._
    scored.filter($"_s".isNotNull)
      .groupBy($"qid").agg(Graft.F.topK($"_s", $"_i", k, asc = true).as("_tk"))
      .select($"qid", explode($"_tk").as("_e"))
      .select($"qid", $"_e.item.vec_id", $"_e.score")
      .collect().groupBy(_.getLong(0))
      .map { case (qid, rows) =>
        qid -> rows.sortBy(_.getDouble(2)).map(_.getLong(1)).toSeq
      }
  }

  def recallAt(gt: Map[Long, Seq[Long]], got: Map[Long, Seq[Long]], k: Int): Double = {
    val per = gt.toSeq.map { case (qid, g0) =>
      val g = g0.take(k).toSet
      got.getOrElse(qid, Nil).take(k).count(g.contains).toDouble / math.min(k, g0.size)
    }
    per.sum / per.length
  }

  /** The reference's CI thresholds. */
  val Gates: Seq[(Int, Double)] = Seq(1 -> 0.5, 10 -> 0.8, 100 -> 0.9)

  def report(name: String, n: Long, gt: Map[Long, Seq[Long]],
      got: Map[Long, Seq[Long]]): Boolean = {
    val r = Map(1 -> recallAt(gt, got, 1), 10 -> recallAt(gt, got, 10),
      100 -> recallAt(gt, got, 100))
    val pass = Gates.forall { case (k, g) => r(k) >= g }
    println(f"""{"index":"$name","n":$n,"queries":${gt.size},"recall@1":${r(1)}%.4f,"recall@10":${r(10)}%.4f,"recall@100":${r(100)}%.4f,"gates_pass":$pass}""")
    pass
  }

  def main(args: Array[String]): Unit = {
    val spark = Graft.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._

    val synth = sys.env.get("SPARK_GRAFT_RECALL_SYNTH")
    val nQueries = sys.env.getOrElse("SPARK_GRAFT_RECALL_QUERIES", "100").toInt

    // mixture (SIFT-like clustered) | normalized (GloVe/NYTimes-like
    // unit-sphere anisotropic) — the two CI gate distributions
    val dist = sys.env.getOrElse("SPARK_GRAFT_RECALL_DIST", "mixture")

    val (corpus, queriesDf) = synth match {
      case Some(spec) =>
        val Array(nStr, dStr) = spec.split("x")
        val (n, d) = (nStr.toLong, dStr.toInt)
        val all = dist match {
          case "normalized" =>
            syntheticNormalized(spark, n, d, nClusters = 4096, nQueries = nQueries)
          case _ => synthetic(spark, n, d, nClusters = 4096, nQueries = nQueries)
        }
        (all.filter($"vec_id" < n),
          all.filter($"vec_id" >= n)
            .select($"vec_id".as("qid"), $"embedding".as("qv")))
      case None =>
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
        val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        (emb, emb.filter($"vec_id" < nQueries)
          .select($"vec_id".as("qid"), $"embedding".as("qv")))
    }
    val cached = corpus.select($"vec_id", $"embedding").cache()
    val n = cached.count()

    val queries = queriesDf.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val qDf = queries.toSeq.toDF("qid", "qv")
      .select($"qid", $"qv".cast("array<float>").as("qv"))

    val gt = groundTruth(cached, qDf, 100)
    // distribution tag keeps the two synthetic rows distinguishable
    val tag = if (synth.isDefined && dist != "mixture") s"${dist}_" else ""
    report(s"${tag}FLAT", n, gt, gt) // 1.0 by construction

    val dim = queries.head._2.length
    val ncent = sys.env.get("SPARK_GRAFT_RECALL_NCENT").map(_.toInt)
      .getOrElse(if (synth.isDefined) 1024
        else math.max(4, math.min(64, (math.sqrt(n.toDouble) / 2).toInt)))
    val nprobes = sys.env.getOrElse("SPARK_GRAFT_RECALL_NPROBE",
      if (synth.isDefined) "40" else s"${ncent / 8 max 1},${ncent / 4 max 1},${ncent / 2 max 1}")
      .split(",").map(_.trim.toInt).toSeq

    val ivf = IvfIndex.train(cached, "embedding", ncent,
      maxTrainRows = 300000L)
    val assigned = IvfIndex.assign(cached, "embedding", ivf).cache()
    assigned.count()
    for (np <- nprobes)
      report(s"${tag}IVFFLAT_nc${ncent}_np$np", n, gt, evalIvf(assigned, ivf, queries, np, 100))

    // nbytes=64 at 128d ⇒ m = dim/2 (dsub=2, 1 byte per sub-code)
    val m = math.min(dim / 2, 64)
    val ksub = if (synth.isDefined) 256 else 16
    val pq = PqIndex.train(cached, "embedding", dim = dim, m = m, ksub = ksub,
      maxTrainRows = if (synth.isDefined) 50000L else 5000L, maxIter = 10)
    val encoded = PqIndex.encode(assigned, "embedding", pq).cache()
    encoded.count()
    val np = nprobes.max
    val recallNum = sys.env.getOrElse("SPARK_GRAFT_RECALL_RERANK", "300").toInt
    report(s"${tag}IVFPQ_nc${ncent}_np${np}_m$m", n, gt,
      evalIvfPq(encoded, ivf, pq, queries, np, recallNum, 100))
    encoded.unpersist()

    // residual-trained codebooks at the same geometry (the adopted
    // default for the q_ivfpq queries)
    val pqRes = PqIndex.trainResidual(assigned, "embedding", dim, m, ivf,
      ksub = ksub, maxTrainRows = if (synth.isDefined) 50000L else 5000L,
      maxIter = 10)
    val encodedRes = PqIndex.encodeResidual(assigned, "embedding", ivf, pqRes).cache()
    encodedRes.count()
    report(s"${tag}IVFPQ_residual_nc${ncent}_np${np}_m$m", n, gt,
      evalIvfPqResidual(encodedRes, ivf, pqRes, queries, np, recallNum, 100))
    encodedRes.unpersist()

    // SCANN class: ANISOTROPIC (score-aware) codebooks at the same
    // geometry — identical serving machinery, score-aware training +
    // assignment (Guo et al. ICML 2020)
    val pqAniso = PqIndex.trainResidualAnisotropic(assigned, "embedding",
      dim, m, ivf, ksub = ksub, metric = "l2",
      maxTrainRows = if (synth.isDefined) 50000L else 5000L, maxIter = 10)
    val encodedAniso = PqIndex.encodeResidualAnisotropic(assigned,
      "embedding", ivf, pqAniso).cache()
    encodedAniso.count()
    report(s"${tag}SCANN_aniso_nc${ncent}_np${np}_m$m", n, gt,
      evalIvfPqResidual(encodedAniso, ivf, pqAniso, queries, np, recallNum, 100))
    encodedAniso.unpersist()

    // IVFRABITQ: residual sign codes over the same coarse quantizer
    val coded = graft.operators.BinaryIndex
      .encodeResidual(assigned, "embedding", ivf).cache()
    coded.count()
    report(s"${tag}IVFRABITQ_nc${ncent}_np${np}_qb4", n, gt,
      evalIvfRabitq(coded, ivf, queries, np, shortlist = recallNum, k = 100))
    coded.unpersist()

    // HNSW graph segments: shards sized so per-shard build memory and the
    // serialized segment row stay bounded (~64k nodes/shard at 1M)
    val hShards = sys.env.get("SPARK_GRAFT_RECALL_HNSW_SHARDS").map(_.toInt)
      .getOrElse(math.max(1, (n / 65536L).toInt))
    val hEf = sys.env.getOrElse("SPARK_GRAFT_RECALL_HNSW_EF", "300").toInt
    // m/efConstruction overridable to replay the reference's PUBLISHED
    // HNSW operating point (nlinks=32, efConstruction=40, efSearch=64 —
    // internal/engine/benchs/README.md:70-78)
    val hM = sys.env.getOrElse("SPARK_GRAFT_RECALL_HNSW_M", "16").toInt
    val hEfc = sys.env.getOrElse("SPARK_GRAFT_RECALL_HNSW_EFC", "100").toInt
    val segs = graft.operators.HnswIndex.build(cached, "vec_id", "embedding",
      graft.operators.HnswIndex.Params(m = hM, efConstruction = hEfc,
        metric = "l2", numShards = hShards)).cache()
    segs.count()
    val gotHnsw = graft.operators.HnswIndex
      .searchBatch(segs, queries.toSeq, k = 100, ef = hEf, metric = "l2")
      .collect().groupBy(_.getLong(0))
      .map { case (qid, rows) =>
        qid -> rows.sortBy(_.getDouble(2)).map(_.getLong(1)).toSeq
      }
    report(s"${tag}HNSW_m${hM}_efc${hEfc}_ef${hEf}_s$hShards", n, gt, gotHnsw)
    segs.unpersist()

    // Vamana (DiskANN-static): same harness, the reference search surface
    // (l_search / beam_width). Opt-in via SPARK_GRAFT_RECALL_VAMANA=1 —
    // the two-pass α-prune build is the costliest of the families.
    if (sys.env.get("SPARK_GRAFT_RECALL_VAMANA").contains("1")) {
      val vR = sys.env.getOrElse("SPARK_GRAFT_RECALL_VAMANA_R", "32").toInt
      val vL = sys.env.getOrElse("SPARK_GRAFT_RECALL_VAMANA_L", "64").toInt
      val vLs = sys.env.getOrElse("SPARK_GRAFT_RECALL_VAMANA_LS", "300").toInt
      val vSegs = graft.operators.VamanaIndex.build(cached, "vec_id", "embedding",
        graft.operators.VamanaIndex.Params(r = vR, l = vL, alpha = 1.2,
          metric = "l2", numShards = hShards)).cache()
      vSegs.count()
      val gotVam = graft.operators.VamanaIndex
        .searchBatch(vSegs, queries.toSeq, k = 100, l = vLs, beamWidth = 4,
          metric = "l2")
        .collect().groupBy(_.getLong(0))
        .map { case (qid, rows) =>
          qid -> rows.sortBy(_.getDouble(2)).map(_.getLong(1)).toSeq
        }
      report(s"${tag}VAMANA_r${vR}_l${vL}_ls${vLs}_s$hShards", n, gt, gotVam)
      vSegs.unpersist()
    }

    spark.stop()
  }
}
