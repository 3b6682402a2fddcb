package graft.tools

import org.apache.spark.sql.functions._

import graft.Graft
import graft.operators.{IvfIndex, Knn, PqIndex}

/** Dev probe: anisotropic (SCANN-class) vs plain residual codebooks,
  * recall@10 at a pruned operating point. Both trained on the same IVF
  * assignment with identical seeds/iters — the only variable is the
  * quantization loss (and the matching encode-time assignment).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.ScannProbe
  *        [nqueries] [nprobe] [recallNum] [metric]
  */
object ScannProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/bench-data/open100x")
    val nq = args.headOption.map(_.toInt).getOrElse(50)
    val nprobe = args.lift(1).map(_.toInt).getOrElse(4)
    val recallNum = args.lift(2).map(_.toInt).getOrElse(100)
    val metric = args.lift(3).getOrElse("l2")
    val spark = Graft.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._
    // SPARK_GRAFT_SCANN_SYNTH=200000x64 swaps in the normalized
    // anisotropic synthetic corpus (Recall.syntheticNormalized — the
    // GloVe/NYTimes-like distribution the anisotropic loss targets);
    // default is the fixture's embeddings table
    val emb = (sys.env.get("SPARK_GRAFT_SCANN_SYNTH") match {
      case Some(spec) =>
        val Array(nStr, dStr) = spec.split("x")
        Recall.syntheticNormalized(spark, nStr.toLong, dStr.toInt,
          nClusters = 1024, nQueries = 0)
      case None => spark.read.parquet(s"$sfDir/embeddings.parquet")
    }).cache()
    val dim = emb.select(size($"embedding")).head().getInt(0)

    val ivf = IvfIndex.train(emb, "embedding", 16)
    val assigned = IvfIndex.assign(emb, "embedding", ivf).cache()
    assigned.count()
    val plain = PqIndex.trainResidual(assigned, "embedding", dim, m = 8,
      ivf = ivf, ksub = 16, metric = metric, maxTrainRows = 200000L,
      maxIter = 8)
    val aniso = PqIndex.trainResidualAnisotropic(assigned, "embedding", dim,
      m = 8, ivf = ivf, ksub = 16, metric = metric, maxTrainRows = 200000L,
      maxIter = 8)
    val encPlain = PqIndex.encodeResidual(assigned, "embedding", ivf, plain).cache()
    val encAniso = PqIndex.encodeResidualAnisotropic(assigned, "embedding",
      ivf, aniso).cache()
    encPlain.count(); encAniso.count()

    val queries = emb.orderBy($"vec_id").limit(nq)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))

    def recallAt10(enc: org.apache.spark.sql.DataFrame, pq: PqIndex.Model): Double = {
      val hits = queries.map { case (_, q) =>
        val exact = Knn.search(emb, $"embedding", q, 10, metric,
          tieBreak = Some($"vec_id"))
          .select($"vec_id").as[Long].collect().toSet
        val got = PqIndex.searchIvfResidual(enc, $"embedding", ivf, pq, q,
          k = 10, nprobe = nprobe, recallNum = recallNum, idCol = $"vec_id")
          .select($"vec_id").as[Long].collect().toSet
        exact.intersect(got).size.toDouble / exact.size
      }
      hits.sum / hits.length
    }

    val rp = recallAt10(encPlain, plain)
    val ra = recallAt10(encAniso, aniso)
    println(f"[scannprobe] dir=$sfDir nq=$nq nprobe=$nprobe recall_num=$recallNum " +
      f"metric=$metric recall@10 plain=$rp%.4f aniso=$ra%.4f")
    spark.stop()
  }
}
