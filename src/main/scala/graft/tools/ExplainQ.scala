package graft.tools
import graft.{Graft, SparkEntry}
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.session("32")
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"=== $name ===")
      println(df.queryExecution.executedPlan.toString.take(8000))
    }
    spark.stop()
  }
}
