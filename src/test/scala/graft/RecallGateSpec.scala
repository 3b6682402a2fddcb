package graft

import graft.operators.{HnswIndex, IvfIndex, PqIndex}
import graft.tools.Recall

/** The reference's recall CI gates (test/test_recall_baseline.py:301-303:
  * recall@{1,10,100} ≥ {0.5, 0.8, 0.9}) enforced in-suite on a scaled-down
  * version of the 1M×128d benchmark config (same nprobe/ncentroids ratio
  * as ncentroids=1024/nprobe=40; same dsub=2 PQ geometry as nbytes=64).
  * The full-size run (`SPARK_GRAFT_RECALL_SYNTH=1000000x128`) is reported
  * in README.md.
  */
class RecallGateSpec extends SparkSpec {
  import spark.implicits._

  test("IVFFLAT and IVFPQ meet the reference recall gates on clustered data") {
    val n = 40000L
    val dim = 64
    val all = Recall.synthetic(spark, n, dim, nClusters = 256, nQueries = 30)
    val corpus = all.filter($"vec_id" < n).cache()
    corpus.count()
    val qDf = all.filter($"vec_id" >= n)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val queries = qDf.collect().map(r => (r.getLong(0), r.getSeq[Float](1)))

    val gt = Recall.groundTruth(corpus, qDf, 100)

    val ncent = 64
    val nprobe = 3 // ≈ the published 40/1024 probe ratio
    val ivf = IvfIndex.train(corpus, "embedding", ncent)
    val assigned = IvfIndex.assign(corpus, "embedding", ivf).cache()
    assigned.count()
    val gotIvf = Recall.evalIvf(assigned, ivf, queries, nprobe, 100)
    assert(Recall.report(s"spec_IVFFLAT_nc${ncent}_np$nprobe", n, gt, gotIvf),
      "IVFFLAT recall gates failed")

    val pq = PqIndex.train(corpus, "embedding", dim = dim, m = dim / 2, ksub = 64,
      maxTrainRows = 10000L, maxIter = 8)
    val encoded = PqIndex.encode(assigned, "embedding", pq).cache()
    encoded.count()
    val gotPq = Recall.evalIvfPq(encoded, ivf, pq, queries, nprobe,
      recallNum = 300, k = 100)
    assert(Recall.report(s"spec_IVFPQ_nc${ncent}_np${nprobe}_m${dim / 2}", n, gt, gotPq),
      "IVFPQ recall gates failed")

    // residual-trained codebooks at the SAME m/ksub geometry — the
    // reference's actual IVFPQ training (gamma_index_ivfpq.cc:221-273);
    // head-to-head against the global-sample codebooks above
    val pqRes = PqIndex.trainResidual(assigned, "embedding", dim, m = dim / 2,
      ivf, ksub = 64, maxTrainRows = 10000L, maxIter = 8)
    val encodedRes = PqIndex.encodeResidual(assigned, "embedding", ivf, pqRes).cache()
    encodedRes.count()
    val gotRes = Recall.evalIvfPqResidual(encodedRes, ivf, pqRes, queries,
      nprobe, recallNum = 300, k = 100)
    assert(Recall.report(s"spec_IVFPQ_residual_nc${ncent}_np${nprobe}_m${dim / 2}",
      n, gt, gotRes), "residual IVFPQ recall gates failed")
    val g10 = Recall.recallAt(gt, gotPq, 10)
    val r10 = Recall.recallAt(gt, gotRes, 10)
    println(f"""{"compare":"IVFPQ_codebooks","global@10":$g10%.4f,"residual@10":$r10%.4f,"winner":"${if (r10 >= g10) "residual" else "global"}"}""")
    encodedRes.unpersist()

    corpus.unpersist(); assigned.unpersist(); encoded.unpersist()
    ()
  }

  test("HNSW-class recall@1 is reachable by probing a small fraction of lists") {
    // the reference's published HNSW operating point reaches recall@1 =
    // 0.9795 on its SIFT1M-class bench (internal/engine/benchs/
    // README.md:82-92). A real HNSW now exists ([[HnswIndex]], gated in
    // the test below); this row keeps the complementary SCAN-path
    // evidence: the smallest IVF nprobe whose recall@1 meets the HNSW
    // number, asserted to cost at most 1/4 of the lists. The full-size
    // (1M×128d, nc=1024) sweep is recorded in README.md via the same
    // harness.
    val n = 40000L
    val dim = 64
    val all = Recall.synthetic(spark, n, dim, nClusters = 256, nQueries = 30)
    val corpus = all.filter($"vec_id" < n).cache()
    corpus.count()
    val qDf = all.filter($"vec_id" >= n)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val queries = qDf.collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val gt = Recall.groundTruth(corpus, qDf, 1)
    val ncent = 64
    val ivf = IvfIndex.train(corpus, "embedding", ncent)
    val assigned = IvfIndex.assign(corpus, "embedding", ivf).cache()
    assigned.count()
    val target = 0.9795
    val swept = Seq(1, 2, 3, 4, 6, 8, 12, 16).iterator.map { np =>
      np -> Recall.recallAt(gt, Recall.evalIvf(assigned, ivf, queries, np, 1), 1)
    }.find(_._2 >= target)
    assert(swept.isDefined,
      s"no nprobe <= 16 of $ncent reaches HNSW-class recall@1 >= $target")
    val (np, r1) = swept.get
    println(f"""{"hnsw_equiv":"IVFFLAT_nc$ncent","nprobe":$np,"probed_frac":${np.toDouble / ncent}%.4f,"recall@1":$r1%.4f,"hnsw_target":$target}""")
    assert(np <= ncent / 4,
      s"HNSW-class recall@1 needs nprobe=$np > ${ncent / 4} (1/4 of lists)")
    corpus.unpersist(); assigned.unpersist()
    ()
  }

  test("HNSW meets the reference recall gates on both distributions") {
    // the graph index itself (per-shard segments + fan-out merge) against
    // the same CI gates the scan-path indexes pass, on BOTH evaluation
    // geometries; ef=300 ≈ hnswlib's wide-recall operating point
    val n = 40000L
    val dim = 64
    for ((name, all) <- Seq(
        "mixture" -> Recall.synthetic(spark, n, dim, nClusters = 256, nQueries = 30),
        "normalized" -> Recall.syntheticNormalized(spark, n, dim, nClusters = 256, nQueries = 30))) {
      val corpus = all.filter($"vec_id" < n).cache()
      corpus.count()
      val qDf = all.filter($"vec_id" >= n)
        .select($"vec_id".as("qid"), $"embedding".as("qv"))
      val queries = qDf.collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
      val gt = Recall.groundTruth(corpus, qDf, 100)
      val segs = HnswIndex.build(corpus, "vec_id", "embedding",
        HnswIndex.Params(m = 16, efConstruction = 100, metric = "l2", numShards = 4)).cache()
      segs.count()
      val got = HnswIndex.searchBatch(segs, queries, k = 100, ef = 300, metric = "l2")
        .collect().groupBy(_.getLong(0))
        .map { case (qid, rows) =>
          qid -> rows.sortBy(_.getDouble(2)).map(_.getLong(1)).toSeq
        }
      assert(Recall.report(s"spec_HNSW_${name}_m16_efc100_ef300", n, gt, got),
        s"HNSW recall gates failed on the $name distribution")
      segs.unpersist(); corpus.unpersist()
    }
    ()
  }

  test("Vamana (DiskANN-static) meets the reference recall gates on both distributions") {
    // the flat α-RNG graph against the same CI thresholds
    // (test_recall_baseline.py:301-303) at the reference's search surface
    // (l_search, beam_width — diskann_static_params.h:27-38)
    val n = 40000L
    val dim = 64
    for ((name, all) <- Seq(
        "mixture" -> Recall.synthetic(spark, n, dim, nClusters = 256, nQueries = 30),
        "normalized" -> Recall.syntheticNormalized(spark, n, dim, nClusters = 256, nQueries = 30))) {
      val corpus = all.filter($"vec_id" < n).cache()
      corpus.count()
      val qDf = all.filter($"vec_id" >= n)
        .select($"vec_id".as("qid"), $"embedding".as("qv"))
      val queries = qDf.collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
      val gt = Recall.groundTruth(corpus, qDf, 100)
      val segs = graft.operators.VamanaIndex.build(corpus, "vec_id", "embedding",
        graft.operators.VamanaIndex.Params(r = 32, l = 64, alpha = 1.2,
          metric = "l2", numShards = 4)).cache()
      segs.count()
      val got = graft.operators.VamanaIndex
        .searchBatch(segs, queries, k = 100, l = 300, beamWidth = 4, metric = "l2")
        .collect().groupBy(_.getLong(0))
        .map { case (qid, rows) =>
          qid -> rows.sortBy(_.getDouble(2)).map(_.getLong(1)).toSeq
        }
      assert(Recall.report(s"spec_VAMANA_${name}_r32_l64_ls300", n, gt, got),
        s"Vamana recall gates failed on the $name distribution")
      segs.unpersist(); corpus.unpersist()
    }
    ()
  }

  test("gates hold on the normalized anisotropic (GloVe-like) distribution") {
    // second CI distribution (test_recall_baseline.py:31-45 evaluates
    // SIFT + GloVe + NYTimes, not one geometry): unit-sphere vectors with
    // decaying per-dimension energy — harder coarse quantization than the
    // well-separated mixture
    val n = 40000L
    val dim = 64
    val all = Recall.syntheticNormalized(spark, n, dim, nClusters = 256, nQueries = 30)
    val corpus = all.filter($"vec_id" < n).cache()
    corpus.count()
    val qDf = all.filter($"vec_id" >= n)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val queries = qDf.collect().map(r => (r.getLong(0), r.getSeq[Float](1)))

    val gt = Recall.groundTruth(corpus, qDf, 100)

    val ncent = 64
    val nprobe = 3
    val ivf = IvfIndex.train(corpus, "embedding", ncent)
    val assigned = IvfIndex.assign(corpus, "embedding", ivf).cache()
    assigned.count()
    assert(Recall.report(s"spec_norm_IVFFLAT_nc${ncent}_np$nprobe", n, gt,
      Recall.evalIvf(assigned, ivf, queries, nprobe, 100)),
      "IVFFLAT recall gates failed on the normalized distribution")

    val pq = PqIndex.train(corpus, "embedding", dim = dim, m = dim / 2, ksub = 64,
      maxTrainRows = 10000L, maxIter = 8)
    val encoded = PqIndex.encode(assigned, "embedding", pq).cache()
    encoded.count()
    assert(Recall.report(s"spec_norm_IVFPQ_nc${ncent}_np${nprobe}_m${dim / 2}", n, gt,
      Recall.evalIvfPq(encoded, ivf, pq, queries, nprobe, recallNum = 300, k = 100)),
      "IVFPQ recall gates failed on the normalized distribution")

    // codebook head-to-head at a DISCRIMINATING operating point: tiny
    // rerank slack (recallNum 20 → k 10) on the hard distribution, so the
    // raw ADC shortlist quality decides — the wide-slack gate rows above
    // saturate at 1.0 and cannot separate the two trainings
    val pqRes = PqIndex.trainResidual(assigned, "embedding", dim, m = dim / 2,
      ivf, ksub = 64, maxTrainRows = 10000L, maxIter = 8)
    val encodedRes = PqIndex.encodeResidual(assigned, "embedding", ivf, pqRes).cache()
    encodedRes.count()
    val tightGlobal = Recall.recallAt(gt,
      Recall.evalIvfPq(encoded, ivf, pq, queries, nprobe, recallNum = 20, k = 10), 10)
    val tightRes = Recall.recallAt(gt,
      Recall.evalIvfPqResidual(encodedRes, ivf, pqRes, queries, nprobe,
        recallNum = 20, k = 10), 10)
    println(f"""{"compare":"IVFPQ_codebooks_norm_tight","global@10":$tightGlobal%.4f,"residual@10":$tightRes%.4f,"winner":"${if (tightRes >= tightGlobal) "residual" else "global"}"}""")
    assert(tightRes >= tightGlobal - 0.05,
      f"residual codebooks regressed: $tightRes%.4f vs $tightGlobal%.4f")
    encodedRes.unpersist()
    encoded.unpersist()

    val coded = graft.operators.BinaryIndex
      .encodeResidual(assigned, "embedding", ivf).cache()
    coded.count()
    assert(Recall.report(s"spec_norm_IVFRABITQ_nc${ncent}_np${nprobe}_qb4", n, gt,
      Recall.evalIvfRabitq(coded, ivf, queries, nprobe, shortlist = 300, k = 100)),
      "IVFRABITQ recall gates failed on the normalized distribution")
    coded.unpersist()

    corpus.unpersist(); assigned.unpersist()
    ()
  }
}
