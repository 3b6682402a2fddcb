package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Scale story: big fact-fact joins co-located via bucketing — the Spark
  * equivalent of vearch's static hash-slot partitioning
  * (entity/space.go:210-236). Bucketed on the join key, the shuffle
  * disappears entirely; at 100 TB this is the difference between a join
  * that moves the table and one that doesn't.
  */
class BucketedJoinSpec extends SparkSpec {

  test("join of two tables bucketed on the key runs with zero shuffle") {
    val dir = Files.createTempDirectory("bucketed").toString
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val o = spark.read.parquet(s"$sf/orders.parquet")

    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$dir/li").saveAsTable("li_bucketed")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$dir/o").saveAsTable("o_bucketed")
    try {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("li_bucketed")
          .join(spark.table("o_bucketed"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderstatus"))
          .agg(sum(col("l_quantity")).as("qty"))
        val plan = joined.queryExecution.executedPlan.toString
        val joinSection = plan.split("HashAggregate").last // below the agg
        assert(!joinSection.contains("Exchange hashpartitioning"),
          s"bucketed join still shuffles:\n$plan")
        // and it's still correct
        val viaBuckets = joined.collect()
          .map(r => r.getString(0) -> r.getDouble(1)).toMap
        val viaPlain = li.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")).as("qty"))
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        assert(viaBuckets.keySet == viaPlain.keySet)
        viaBuckets.foreach { case (k, v) =>
          assert(math.abs(v - viaPlain(k)) < 1e-6)
        }
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
