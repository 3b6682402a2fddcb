package graft.tools

import graft.{Graft, SparkEntry}

/** Mimics the driver's t1 smoke: run SparkEntry.entry, require rows > 0. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session()
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"[smoke] entry rows=${rows.length}")
    rows.take(5).foreach(r => println(s"[smoke] $r"))
    require(rows.nonEmpty, "entry returned 0 rows")
    spark.stop()
  }
}
