package graft.tools

import org.apache.spark.sql.functions._

import graft.Graft
import graft.operators.Dedup

/** Scaling runner for the embedding near-dup SCALE PATH at a production
  * operating point: `embeddingNearDupKnn` with ncentroids grown
  * proportionally to the corpus and nprobe fixed, so candidate volume is
  * n · nprobe · (n / ncentroids) — LINEAR in n when ncentroids ∝ n (the
  * declared query q_embed_neardup_knn instead pins nprobe = ncentroids
  * for oracle exactness, which is quadratic by construction on iid
  * fixture noise; this tool measures the shape a real deployment runs).
  *
  * Usage: runMain graft.tools.EmbedScale <dir,ncentroids,nprobe>...
  */
object EmbedScale {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    args.foreach { spec =>
      val Array(dir, nc, np) = spec.split(",")
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val best = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val df = Dedup.embeddingNearDupKnn(emb, "vec_id", "embedding",
          threshold = 0.4, ncentroids = nc.toInt, nprobe = np.toInt)
        val n = try df.count() finally graft.operators.Checkpoints.free(df)
        (n, (System.nanoTime() - t0) / 1e9)
      }.minBy(_._2)
      println(f"[embedscale] $dir nc=$nc np=$np pairs=${best._1} t=${best._2}%.2f s")
    }
    spark.stop()
  }
}
