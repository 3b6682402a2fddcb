package graft.tools

import java.nio.file.{Files, Paths}

import graft.Graft
import graft.operators.Dedup

/** Plan-evidence companion to [[PlanDump]] for the dedup pair operators:
  * the public wrappers eagerly checkpoint their output, so the declared
  * queries' `explain` shows only a `Scan ExistingRDD` frame. This dumps
  * the LAZY pair plans (jaccard/containment candidate join + verify) so
  * the committed plan artifacts show the candidate-filter shape itself.
  *
  * Usage: runMain graft.tools.PairPlanDump <outDir> <suffix>
  */
object PairPlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = args(0)
    val suffix = args(1)
    val spark = Graft.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    Files.createDirectories(Paths.get(outDir))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val dumps = Seq(
      "jaccard_pairplan" -> Dedup.jaccardPairsPlan(
        docs, "doc_id", "text", n = 3, threshold = 0.8),
      "containment_pairplan" -> Dedup.containmentPairsPlan(
        docs, "doc_id", "text", n = 3, threshold = 0.8))
    dumps.foreach { case (name, (plan, cps)) =>
      val txt = plan.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
      println(s"[pairplan] wrote ${name}_$suffix.txt (${txt.length} chars)")
      cps.foreach(graft.operators.Checkpoints.free)
    }
    spark.stop()
  }
}
