package graft.tools

import graft.Graft

/** Output-row counter for declared queries: `CountQ <sfDir> <q> [<q>…]`.
  * Feeds the output-normalized scaling tables (BENCH_SCALING.md) — the
  * pair-join dedup family's decade wall-times are output-bound, so the
  * honest scaling number is pairs/s, which needs the pair counts.
  */
object CountQ {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = Graft.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    args.tail.foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, dir)
      println(s"""{"count_q":"$q","dir":"$dir","rows":${df.count()}}""")
    }
    spark.stop()
  }
}
