package graft.tools

import graft.Graft
import graft.operators.Dedup

/** Dev probe: near-dup pair-list size + clusters staging cost at a SF. */
object PairsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pairs] $name t=${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val pairs = time("jaccardPairs")(Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8))
    println(s"[pairs] n_pairs = ${pairs.count()}")
    val cl = time("clusters")(Dedup.clusters(docs, "doc_id", pairs))
    println(s"[pairs] n_rows = ${cl.count()}")
    graft.operators.Checkpoints.free(pairs)
    graft.operators.Checkpoints.free(cl)
    spark.stop()
  }
}
