package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows share key 0 — the single-hot-key shape
  private lazy val skewed = spark.range(0, 20000).repartition(8)
    .select(when($"id" % 10 =!= 0, lit(0L)).otherwise($"id" % 100).as("k"),
      lit(1L).as("v"), ($"id" % 7).cast("double").as("x"))
    .cache()

  test("saltedAgg equals plain aggregation") {
    val plain = skewed.groupBy($"k")
      .agg(sum($"v").as("total"), count(lit(1)).as("cnt"), max($"x").as("mx"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val salted = Skew.saltedAgg(skewed, Seq($"k"), salts = 16)(
      partialAggs = Seq(sum($"v").as("total"), count(lit(1)).as("cnt"), max($"x").as("mx")),
      finalAggs = Seq(sum($"total").as("total"), sum($"cnt").as("cnt"), max($"mx").as("mx")))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(salted == plain)
  }

  test("saltedJoin equals plain join, replicates only hot keys") {
    val right = spark.range(0, 100).select($"id".as("k"), concat(lit("dim"), $"id").as("name"))
    val plain = skewed.join(right, "k").groupBy($"k").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(skewed, right, "k", hotKeys = Seq(0L), salts = 8)
      .groupBy($"k").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }
}
