package graft

import org.apache.spark.sql.functions._
import graft.operators.{Knn, PqIndex}

class PqIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet").cache()
  private lazy val model = PqIndex.train(emb, "embedding", dim = 64, m = 8, ksub = 16)
  private lazy val encoded = PqIndex.encode(emb, "embedding", model).cache()
  private lazy val q0 = emb.filter($"vec_id" === 0)
    .select("embedding").head().getSeq[Float](0)

  test("codes have m entries in [0, ksub)") {
    val codes = encoded.select($"pq_code").head().getSeq[Int](0)
    assert(codes.size == 8)
    assert(codes.forall(c => c >= 0 && c < 16))
  }

  test("ADC ordering correlates with true L2: self is best") {
    val adc = encoded
      .withColumn("_adc", PqIndex.adcScore(model, q0, col("pq_code")))
      .orderBy($"_adc".asc).select($"vec_id").limit(5).as[Long].collect()
    assert(adc.contains(0L), s"self not in ADC top-5: ${adc.toSeq}")
  }

  test("recall_num = N degenerates to exact search") {
    val n = encoded.count().toInt
    val viaPq = PqIndex.search(encoded, $"embedding", model, q0,
      k = 10, recallNum = n, idCol = $"vec_id")
      .select($"vec_id").as[Long].collect().toSeq
    val exact = Knn.search(emb, $"embedding", q0, 10, "l2", tieBreak = Some($"vec_id"))
      .select($"vec_id").as[Long].collect().toSeq
    assert(viaPq == exact)
  }

  test("two-stage rerank hits the recall gate at modest recall_num") {
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    var hits = 0; var total = 0
    for ((_, q) <- queries) {
      val exact = Knn.search(emb, $"embedding", q, 10, "l2", tieBreak = Some($"vec_id"))
        .select($"vec_id").as[Long].collect().toSet
      // random-ish fixture vectors have no cluster structure, the hardest
      // case for PQ — a deeper rerank pool (20% of N) recovers the gate
      val got = PqIndex.search(encoded, $"embedding", model, q,
        k = 10, recallNum = 100, idCol = $"vec_id")
        .select($"vec_id").as[Long].collect().toSet
      hits += got.intersect(exact).size; total += exact.size
    }
    val recall = hits.toDouble / total
    assert(recall >= 0.8, s"PQ rerank recall@10 = $recall")
  }

  test("residual codebooks: exact parity at full probe + exhaustive rerank") {
    import graft.operators.IvfIndex
    val ivf = IvfIndex.train(emb, "embedding", 8)
    val assigned = IvfIndex.assign(emb, "embedding", ivf)
    val pqr = PqIndex.trainResidual(assigned, "embedding", dim = 64, m = 8,
      ivf, ksub = 16)
    val enc = PqIndex.encodeResidual(assigned, "embedding", ivf, pqr)
    val viaRes = PqIndex.searchIvfResidual(enc, $"embedding", ivf, pqr, q0,
      k = 10, nprobe = 8, recallNum = 1 << 30, idCol = $"vec_id")
      .select($"vec_id").as[Long].collect().toSeq
    val exact = Knn.search(emb, $"embedding", q0, 10, "l2", tieBreak = Some($"vec_id"))
      .select($"vec_id").as[Long].collect().toSeq
    assert(viaRes == exact)
  }

  test("residual ip: per-list bias keeps cross-list shortlists usable") {
    import graft.operators.IvfIndex
    val ivf = IvfIndex.train(emb, "embedding", 8)
    val assigned = IvfIndex.assign(emb, "embedding", ivf)
    val pqr = PqIndex.trainResidual(assigned, "embedding", dim = 64, m = 8,
      ivf, ksub = 16, metric = "ip")
    val enc = PqIndex.encodeResidual(assigned, "embedding", ivf, pqr)
    val exact = Knn.search(emb, $"embedding", q0, 10, "ip", tieBreak = Some($"vec_id"))
      .select($"vec_id").as[Long].collect().toSet
    // a missing q·c_list bias skews the shortlist toward whole lists and
    // tanks recall; with it a modest shortlist recovers most of top-10
    val got = PqIndex.searchIvfResidual(enc, $"embedding", ivf, pqr, q0,
      k = 10, nprobe = 8, recallNum = 60, idCol = $"vec_id")
      .select($"vec_id").as[Long].collect().toSet
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.6, s"residual-ip shortlist recall@10 = $recall")
  }

  test("residual ip: shortlist implements ADC = −(q·c + q·r̂) exactly") {
    import graft.operators.IvfIndex
    val ivf = IvfIndex.train(emb, "embedding", 8)
    val assigned = IvfIndex.assign(emb, "embedding", ivf)
    val pqr = PqIndex.trainResidual(assigned, "embedding", dim = 64, m = 8,
      ivf, ksub = 16, metric = "ip")
    val enc = PqIndex.encodeResidual(assigned, "embedding", ivf, pqr)
    // k = recallNum: the output SET is exactly the ADC shortlist (rerank
    // only reorders k survivors). Recompute the intended asymmetric score
    // −(q·c_list + q·r̂) driver-side; a LUT built from the residual query
    // instead of q would add a spurious +c·r̂ per code and diverge.
    val rn = 25
    val lists = ivf.nearestCentroids(q0, 4)
    val lut = pqr.lut(q0) // ip: lut(sub)(code) = −q_sub·cent
    val expected = enc.filter($"list_id".isin(lists.map(_.toLong): _*))
      .select($"vec_id", $"list_id".cast("int"), $"pq_code").collect()
      .map { r =>
        val c = ivf.centroids(r.getInt(1))
        val qc = (0 until math.min(q0.length, c.length))
          .map(i => q0(i).toDouble * c(i)).sum
        val code = r.getSeq[Int](2)
        val adc = -qc + (0 until pqr.m).map(sub => lut(sub)(code(sub))).sum
        (adc, r.getLong(0))
      }.sortBy(identity).take(rn).map(_._2).toSet
    val got = PqIndex.searchIvfResidual(enc, $"embedding", ivf, pqr, q0,
      k = rn, nprobe = 4, recallNum = rn, idCol = $"vec_id")
      .select($"vec_id").as[Long].collect().toSet
    assert(got == expected,
      s"shortlist mismatch: missing=${expected -- got}, extra=${got -- expected}")
  }

  test("ip metric: ADC uses negated dot, search still ranks self first") {
    val mIp = PqIndex.train(emb, "embedding", dim = 64, m = 8, ksub = 16, metric = "ip")
    val encIp = PqIndex.encode(emb, "embedding", mIp)
    val r = PqIndex.search(encIp, $"embedding", mIp, q0,
      k = 3, recallNum = 50, idCol = $"vec_id")
      .select($"vec_id").as[Long].collect()
    assert(r.head == 0L)
  }

  test("anisotropic (SCANN) training: η = 1 is bit-identical to plain Lloyd's") {
    // every anisotropic formula must collapse at η = 1 — same RNG draws,
    // same tie order, same division — so the score-aware path is a pure
    // generalization, not a fork (Guo et al. 2020 loss with h∥ = h⊥)
    val rnd = new scala.util.Random(7)
    val pts = Array.fill(400)(Array.fill(8)(rnd.nextFloat() * 2f - 1f))
    val plain = PqIndex.localKMeans(pts, k = 16, maxIter = 10, seed = 5L)
    val aniso = PqIndex.localKMeansAnisotropic(pts, pts, k = 16, maxIter = 10,
      seed = 5L, eta = 1.0)
    assert(plain.map(_.toSeq).toSeq == aniso.map(_.toSeq).toSeq)
  }

  test("anisotropic training reduces PARALLEL quantization error (the score-aware objective)") {
    // the loss being optimized: Σ ⟨x − c(x), x/‖x‖⟩² — parallel error is
    // what perturbs inner-product ranking of high-scoring points. η > 1
    // must not lose to plain k-means on its own objective.
    val rnd = new scala.util.Random(11)
    val pts = Array.fill(2000)(Array.fill(8)(rnd.nextFloat() * 2f - 1f))
    def parallelErr(cents: Array[Array[Float]]): Double = pts.map { p =>
      val nrm = math.sqrt(p.map(x => x.toDouble * x).sum)
      if (nrm == 0) 0.0
      else {
        // assign by the centroid the ENCODER would pick at η, then
        // measure the parallel residual component
        val errs = cents.map { c =>
          val par = p.indices.map(i => (p(i) - c(i)).toDouble * p(i)).sum / nrm
          par * par
        }
        errs.min // best-case parallel error over the codebook
      }
    }.sum
    val eta = PqIndex.etaForThreshold(0.2, 64)
    assert(eta > 1.0)
    val plain = PqIndex.localKMeans(pts, k = 16, maxIter = 12, seed = 3L)
    val aniso = PqIndex.localKMeansAnisotropic(pts, pts, k = 16, maxIter = 12,
      seed = 3L, eta = eta)
    val (ep, ea) = (parallelErr(plain), parallelErr(aniso))
    assert(ea <= ep * 1.02,
      s"anisotropic parallel error $ea should not exceed plain $ep")
  }

  test("anisotropic encode+search: exact parity at full probe + exhaustive rerank") {
    val ivf = graft.operators.IvfIndex.train(emb, "embedding", 4)
    val assigned = graft.operators.IvfIndex.assign(emb, "embedding", ivf)
    val pq = PqIndex.trainResidualAnisotropic(assigned, "embedding", dim = 64,
      m = 8, ivf = ivf, ksub = 16, metric = "l2")
    val enc = PqIndex.encodeResidualAnisotropic(assigned, "embedding", ivf, pq)
    // codes well-formed
    val codes = enc.select($"pq_code").head().getSeq[Int](0)
    assert(codes.length == 8 && codes.forall(c => c >= 0 && c < 16))
    // full probe + full-depth rerank ⇒ exact, whatever the codebooks
    val got = PqIndex.searchIvfResidual(enc, $"embedding", ivf, pq, q0,
      k = 5, nprobe = 4, recallNum = 1 << 20, idCol = $"vec_id")
      .select($"vec_id").as[Long].collect().toSeq
    val brute = graft.operators.Knn.search(emb, $"embedding", q0, 5, "l2",
      tieBreak = Some($"vec_id"))
      .select($"vec_id").as[Long].collect().toSeq
    assert(got == brute)
  }

  test("dim-aware training cap: high-dim training stays inside the byte budget, serving still exact") {
    // the cap is a BYTE budget: 200k rows at dim 64 keeps the full row
    // cap; dim 768 scales it by 64/768; extreme dims hit the
    // conditioning floor max(10k, 39·ksub)
    assert(PqIndex.dimAwareCap(200000L, 64, 256) == 200000L)
    assert(PqIndex.dimAwareCap(200000L, 32, 16) == 200000L)
    assert(PqIndex.dimAwareCap(200000L, 768, 16) == 200000L * 64 / 768)
    assert(PqIndex.dimAwareCap(200000L, 8192, 256) == 10000L)
    assert(PqIndex.dimAwareCap(200000L, 8192, 1024) == 39L * 1024)

    // end-to-end at dim 768: 30k deterministic vectors (≈92 MB as a
    // table; the dim-aware SAMPLE is ~16.6k rows ≈ 51 MB driver-side —
    // the same budget dim 64 pays), anisotropic training, then the
    // exactness gate: full-depth rerank ≡ brute KNN
    val dim = 768
    val n = 30000L
    val df = spark.range(n).select($"id".as("vec_id"),
      expr(s"transform(sequence(1, $dim), i -> cast(pmod(id * 31 + i * 7, 997) / 997.0 as float))")
        .as("embedding"))
      .withColumn("list_id", lit(0))
    val ivf1 = graft.operators.IvfIndex.Model(
      Array(Array.fill(dim)(0f)), metric = "l2")
    val m768 = PqIndex.trainResidualAnisotropic(df, "embedding", dim, m = 8,
      ivf = ivf1, ksub = 16, metric = "l2", maxIter = 2)
    assert(m768.m == 8 && m768.dsub == dim / 8)
    assert(m768.codebooks.forall(_.forall(_.forall(v => !v.isNaN && !v.isInfinite))))
    val coded = PqIndex.encodeResidual(df, "embedding", ivf1, m768)
    val q = df.filter($"vec_id" === 7).select("embedding").head().getSeq[Float](0)
    val got = PqIndex.searchIvfResidual(coded, col("embedding"), ivf1, m768,
      q, k = 5, nprobe = 1, recallNum = 1 << 30, idCol = col("vec_id"))
      .select($"vec_id").as[Long].collect().toSeq
    val brute = Knn.search(df, col("embedding"), q, 5, "l2",
      tieBreak = Some($"vec_id"))
      .select($"vec_id").as[Long].collect().toSeq
    assert(got == brute)
  }
}
