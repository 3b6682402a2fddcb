package graft

import org.apache.spark.sql.functions._
import graft.operators.{BinaryIndex, Knn}

class BinaryIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet").cache()
  private lazy val coded = BinaryIndex.encode(emb, "embedding").cache()

  private def q(id: Long): Seq[Float] =
    emb.filter($"vec_id" === id).select("embedding").head().getSeq[Float](0)

  test("shortlist = N degenerates to exact search") {
    val n = emb.count().toInt
    val got = BinaryIndex.search(coded, $"embedding", q(0), 10, shortlist = n,
      idCol = $"vec_id").select($"vec_id").as[Long].collect().toSeq
    val exact = Knn.search(emb, $"embedding", q(0), 10, "l2", tieBreak = Some($"vec_id"))
      .select($"vec_id").as[Long].collect().toSeq
    assert(got == exact)
  }

  test("code is 64x smaller and hamming shortlist keeps recall@10 >= 0.8") {
    val codeBytes = coded.select(length($"bcode")).head().getInt(0)
    assert(codeBytes == 8) // 64 dims / 8
    var hits = 0; var total = 0
    for (id <- 0L until 15L) {
      val exact = Knn.search(emb, $"embedding", q(id), 10, "l2", tieBreak = Some($"vec_id"))
        .select($"vec_id").as[Long].collect().toSet
      val got = BinaryIndex.search(coded, $"embedding", q(id), 10, shortlist = 100,
        idCol = $"vec_id").select($"vec_id").as[Long].collect().toSet
      hits += got.intersect(exact).size; total += exact.size
    }
    val recall = hits.toDouble / total
    assert(recall >= 0.8, s"binary shortlist recall@10 = $recall")
  }

  test("RaBitQ qb=4: asymmetric estimator >= symmetric hamming on recall") {
    def recallAt(qb: Int, shortlist: Int): Double = {
      var hits = 0; var total = 0
      for (id <- 0L until 15L) {
        val exact = Knn.search(emb, $"embedding", q(id), 10, "l2", tieBreak = Some($"vec_id"))
          .select($"vec_id").as[Long].collect().toSet
        val got = BinaryIndex.search(coded, $"embedding", q(id), 10,
          shortlist = shortlist, idCol = $"vec_id", qb = qb)
          .select($"vec_id").as[Long].collect().toSet
        hits += got.intersect(exact).size; total += exact.size
      }
      hits.toDouble / total
    }
    val r1 = recallAt(1, 50)
    val r4 = recallAt(4, 50)
    // deterministic fixture: the magnitude-aware estimator must not lose
    // to plain hamming at the same shortlist budget
    assert(r4 >= r1, s"qb=4 recall $r4 < qb=1 recall $r1")
    assert(r4 >= 0.8, s"qb=4 shortlist recall@10 = $r4")
    // qb=4 with full shortlist is still exact
    val n = emb.count().toInt
    val got = BinaryIndex.search(coded, $"embedding", q(3), 10, shortlist = n,
      idCol = $"vec_id", qb = 4).select($"vec_id").as[Long].collect().toSeq
    val exact = Knn.search(emb, $"embedding", q(3), 10, "l2", tieBreak = Some($"vec_id"))
      .select($"vec_id").as[Long].collect().toSeq
    assert(got == exact)
  }

  test("qb=0 (unquantized query): accepted, exact at full shortlist, >= qb=4 recall") {
    // reference space.go:302-319 accepts qb in [0,8]; 0 = raw query in the
    // asymmetric estimator. Full shortlist still pins scores to exact rerank.
    val n = emb.count().toInt
    val got = BinaryIndex.search(coded, $"embedding", q(5), 10, shortlist = n,
      idCol = $"vec_id", qb = 0).select($"vec_id", $"_score").as[(Long, Double)].collect().toSeq
    val exact = Knn.search(emb, $"embedding", q(5), 10, "l2", tieBreak = Some($"vec_id"))
      .select($"vec_id", $"_score").as[(Long, Double)].collect().toSeq
    assert(got == exact)
    // raw query matches its quantized form's recall in expectation; on a
    // single fixture quantization noise can swing a result either way, so
    // pin near-parity plus an absolute floor rather than strict dominance
    def recallAt(qb: Int): Double = {
      var hits = 0; var total = 0
      for (id <- 0L until 15L) {
        val ex = Knn.search(emb, $"embedding", q(id), 10, "l2", tieBreak = Some($"vec_id"))
          .select($"vec_id").as[Long].collect().toSet
        val g = BinaryIndex.search(coded, $"embedding", q(id), 10,
          shortlist = 50, idCol = $"vec_id", qb = qb)
          .select($"vec_id").as[Long].collect().toSet
        hits += g.intersect(ex).size; total += ex.size
      }
      hits.toDouble / total
    }
    val (r0, r4) = (recallAt(0), recallAt(4))
    assert(r0 >= r4 - 0.05, s"qb=0 recall $r0 far below qb=4 recall $r4")
    assert(r0 >= 0.8, s"qb=0 shortlist recall@10 = $r0")
    // out-of-range still rejects
    intercept[IllegalArgumentException] { BinaryIndex.quantizeQuery(Seq(1f, 2f), 9) }
    intercept[IllegalArgumentException] { BinaryIndex.quantizeQuery(Seq(1f, 2f), -1) }
  }

  test("IVFRABITQ: residual codes, exact at degenerate params, recall holds") {
    val ivf = graft.operators.IvfIndex.train(emb, "embedding", 8)
    val assigned = graft.operators.IvfIndex.assign(emb, "embedding", ivf)
    val coded2 = BinaryIndex.encodeResidual(assigned, "embedding", ivf).cache()
    // nprobe = ncentroids & shortlist = N degenerates to exact KNN
    val n = emb.count().toInt
    val got = BinaryIndex.searchIvfResidual(coded2, $"embedding", ivf, q(0), 10,
      nprobe = ivf.ncentroids, shortlist = n, idCol = $"vec_id")
      .select($"vec_id").as[Long].collect().toSeq
    val exact = Knn.search(emb, $"embedding", q(0), 10, "l2", tieBreak = Some($"vec_id"))
      .select($"vec_id").as[Long].collect().toSeq
    assert(got == exact)
    // probed + shortlisted recall vs exact at the same budget as the
    // global-code test (nprobe=4/8 halves candidate IO on top)
    var hits = 0; var total = 0
    for (id <- 0L until 15L) {
      val ex = Knn.search(emb, $"embedding", q(id), 10, "l2", tieBreak = Some($"vec_id"))
        .select($"vec_id").as[Long].collect().toSet
      val g = BinaryIndex.searchIvfResidual(coded2, $"embedding", ivf, q(id), 10,
        nprobe = 4, shortlist = 100, idCol = $"vec_id")
        .select($"vec_id").as[Long].collect().toSet
      hits += g.intersect(ex).size; total += ex.size
    }
    val recall = hits.toDouble / total
    assert(recall >= 0.7, s"ivf-residual recall@10 = $recall")
    coded2.unpersist()
    ()
  }

  test("self is always found (hamming 0 to itself)") {
    val r = BinaryIndex.search(coded, $"embedding", q(7), 3, shortlist = 50,
      idCol = $"vec_id").select($"vec_id").as[Long].collect()
    assert(r.head == 7L)
  }
}
