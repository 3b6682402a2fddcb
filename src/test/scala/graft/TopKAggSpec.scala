package graft

import org.apache.spark.sql.functions._
import graft.Graft.F

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("topk desc keeps k largest, best-first, distributed") {
    val df = spark.range(0, 10000).repartition(8)
      .select($"id", ($"id" % 997).cast("double").as("s"))
    val r = df.agg(F.topK($"s", struct($"id"), 3, asc = false).as("tk"))
      .select(explode($"tk").as("e"))
      .select($"e.score", $"e.item.id").collect()
    assert(r.map(_.getDouble(0)).toSeq == Seq(996.0, 996.0, 996.0))
  }

  test("topk asc keeps k smallest") {
    val df = spark.range(1, 1000).repartition(7).select($"id", $"id".cast("double").as("s"))
    val r = df.agg(F.topK($"s", struct($"id"), 4, asc = true).as("tk"))
      .select(explode($"tk").as("e")).select($"e.score").as[Double].collect()
    assert(r.toSeq == Seq(1.0, 2.0, 3.0, 4.0))
  }

  test("topk per group matches window row_number") {
    val df = spark.range(0, 5000).repartition(16)
      .select(($"id" % 7).as("g"), $"id",
        (($"id" * 2654435761L) % 100003).cast("double").as("s"))
    val viaAgg = df.groupBy($"g")
      .agg(F.topK($"s", struct($"id"), 5, asc = false).as("tk"))
      .select($"g", explode($"tk").as("e"))
      .select($"g", $"e.item.id".as("id"), $"e.score".as("s"))
      .orderBy($"g", $"s".desc, $"id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"g").orderBy($"s".desc, $"id")
    val viaWin = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
      .select($"g", $"id", $"s").orderBy($"g", $"s".desc, $"id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(viaAgg.toSeq == viaWin.toSeq)
  }

  test("topk serialize/merge across shuffle with string payload") {
    val df = spark.range(0, 2000).repartition(13)
      .select(($"id" % 3).as("g"), concat(lit("doc"), $"id").as("name"),
        $"id".cast("double").as("s"))
    val r = df.groupBy($"g")
      .agg(F.topK($"s", struct($"name", $"s"), 2, asc = false).as("tk"))
      .select($"g", explode($"tk").as("e")).select($"g", $"e.item.name")
      .orderBy($"g").as[(Long, String)].collect()
    assert(r.length == 6)
    // ids ≡ 0 mod 3 descending: 1998, 1995
    assert(r.filter(_._1 == 0).map(_._2).toSet == Set("doc1998", "doc1995"))
  }
}
