package graft.tools

import java.nio.file.{Files, Paths}

import graft.{Graft, SparkEntry}

/** Writes `.explain("formatted")` output for named queries to
  * `<outDir>/<query>_<suffix>.txt` — the plan-evidence artifacts the
  * optimization rounds commit under `plans/`. Cold path (no resident
  * caches), so scan nodes show PushedFilters / ReadSchema / partition
  * pruning the way the correctness runs execute them.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> <query>...
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = args(0)
    val suffix = args(1)
    val spark = Graft.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    Files.createDirectories(Paths.get(outDir))
    args.drop(2).foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
        graft.operators.Checkpoints.free(df)
        println(s"[plandump] wrote ${name}_$suffix.txt (${txt.length} chars)")
      } catch { case e: Throwable =>
        println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
