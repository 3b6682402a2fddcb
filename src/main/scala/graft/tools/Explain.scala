package graft.tools

import org.apache.spark.sql.functions._
import graft.Graft
import graft.Graft.F

/** Dev tool: print executed plans for plan-shape inspection. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session("4")
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = emb.select(F.vecDot($"embedding", $"embedding").as("d"))
    df.explain("formatted")
    println("=== executedPlan.toString ===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
