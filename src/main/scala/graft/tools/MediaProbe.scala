package graft.tools

import graft.Graft
import graft.operators.Multimodal

/** Dev probe: time each stage of the media decode path at a given SF. */
object MediaProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val media = graft.sources.IndexStore.media(spark, sfDir)
    println(s"[probe] scan partitions = ${media.rdd.getNumPartitions}, rows = ${media.count()}")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("decodeImages")(Multimodal.decodeImages(media).count())
    time("decodeImages2")(Multimodal.decodeImages(media).count())
    time("decodeAudio")(Multimodal.decodeAudio(media).count())
    time("imgPartitions")(Multimodal.decodeImages(media).rdd.getNumPartitions.toLong)
    spark.stop()
  }
}
