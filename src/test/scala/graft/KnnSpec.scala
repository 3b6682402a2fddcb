package graft

import org.apache.spark.sql.functions._
import graft.operators.Knn

class KnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet").cache()
  private lazy val q0: Seq[Float] =
    emb.filter($"vec_id" === 0).select("embedding").head().getSeq[Float](0)

  test("FLAT ip search: self is top hit, scores monotone") {
    val r = Knn.search(emb, $"embedding", q0, 5, "ip", tieBreak = Some($"vec_id"))
      .select($"vec_id", $"_score").collect()
    assert(r.length == 5)
    val scores = r.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("FLAT l2 search: self has distance 0 and ranks first") {
    val r = Knn.search(emb, $"embedding", q0, 3, "l2", tieBreak = Some($"vec_id")).collect()
    assert(r.head.getAs[Long]("vec_id") == 0L)
    assert(r.head.getAs[Double]("_score") == 0.0)
  }

  test("filter-first: excluded rows never scored into results") {
    val r = Knn.search(emb, $"embedding", q0, 50, "ip",
      filter = Some($"label" === 4)).select($"label").distinct().collect()
    assert(r.map(_.getInt(0)).toSet == Set(4))
  }

  test("score gate behaves like vearch min/max score") {
    val r = Knn.search(emb, $"embedding", q0, 1000, "cosine",
      minScore = Some(0.0), maxScore = Some(0.5)).select($"_score").collect()
    assert(r.nonEmpty)
    assert(r.forall(x => x.getDouble(0) >= 0.0 && x.getDouble(0) <= 0.5))
  }

  test("batch search: per-qid top-k equals per-query single search") {
    val queries = emb.filter($"vec_id" < 3).select($"vec_id".as("qid"), $"embedding".as("qv"))
    val batch = Knn.searchBatch(emb, $"embedding", struct($"vec_id"), queries,
      "qid", "qv", 4, "l2")
      .select($"_qid", $"_item.vec_id".as("vec_id"), $"_score")
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    for (qid <- 0L to 2L) {
      val qv = emb.filter($"vec_id" === qid).select("embedding").head().getSeq[Float](0)
      val single = Knn.search(emb, $"embedding", qv, 4, "l2", tieBreak = Some($"vec_id"))
        .select($"vec_id").collect().map(_.getLong(0)).toSet
      assert(batch(qid).map(_._2).toSet == single, s"qid=$qid")
    }
  }

  test("batch search plan: broadcast join + partial topk aggregation, no sort of corpus") {
    val queries = emb.limit(2).select($"vec_id".as("qid"), $"embedding".as("qv"))
    val plan = Knn.searchBatch(emb, $"embedding", struct($"vec_id"), queries,
      "qid", "qv", 4, "l2").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"query set not broadcast:\n$plan")
    assert(plan.contains("graft_topk"), s"no partial topk agg:\n$plan")
  }

  test("batch search shuffle volume is heap rows, never the corpus") {
    // the scaladoc claim: partial aggregation reduces each partition to
    // one heap per qid map-side, so shuffle volume is |queries|-scaled —
    // independent of corpus size. Measured, not argued.
    val n = 50000L
    val nq = 8
    val rec = shuffleRecords {
      val corpus = spark.range(n).select($"id",
        array(($"id" % 13).cast("float"), (($"id" * 7) % 17).cast("float")).as("vec"))
      val queries = spark.range(nq).select($"id".as("qid"),
        array(($"id" % 5).cast("float"), ($"id" % 3).cast("float")).as("qv"))
      Knn.searchBatch(corpus, $"vec", struct($"id"), queries,
        "qid", "qv", 5, "l2").count()
    }
    assert(rec > 0, "expected the per-partition heaps to shuffle")
    assert(rec < 1000,
      s"$rec shuffle records for a $n-row corpus — the corpus itself shuffled")
  }

  test("multi-vector conjunctive search intersects and weights") {
    val two = emb.select($"vec_id",
      slice($"embedding", 1, 32).as("v1"), slice($"embedding", 33, 32).as("v2"))
    val q1 = q0.take(32)
    val q2 = q0.drop(32)
    val r = Knn.multiVectorSearch(two, "vec_id",
      Seq(($"v1", q1), ($"v2", q2)), perFieldK = 100, k = 10, metric = "ip")
      .collect()
    assert(r.nonEmpty)
    // combined score = mean of per-field scores (default weights 1/N)
    r.foreach { row =>
      val s = (row.getDouble(1) + row.getDouble(2)) / 2.0
      assert(math.abs(s - row.getDouble(3)) < 1e-9)
    }
    // vec_id 0 must be in the intersection and first (it is the query itself)
    assert(r.head.getLong(0) == 0L)
  }

  test("roundTo is display-only: selection/order follow the RAW score") {
    // two scores that collide at 4 decimals but differ in raw value
    val d = Seq((1L, Seq(1.00001f)), (2L, Seq(1.00004f)), (3L, Seq(0.5f)))
      .toDF("id", "v").select($"id", $"v".cast("array<float>").as("v"))
    val r = Knn.search(d, $"v", Seq(1.0f), 2, "ip",
      tieBreak = Some($"id"), roundTo = Some(4)).collect()
    // raw order: id=2 (1.00004) before id=1 (1.00001), despite equal rounding
    assert(r.map(_.getLong(0)).toSeq == Seq(2L, 1L))
    assert(r.map(_.getAs[Double]("_score")).toSeq == Seq(1.0, 1.0)) // displayed rounded
  }

  test("single knn plan is TakeOrderedAndProject (bounded heap, no global sort)") {
    val plan = Knn.search(emb, $"embedding", q0, 10, "ip")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"unexpected plan:\n$plan")
  }
}
