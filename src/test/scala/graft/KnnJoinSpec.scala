package graft

import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, Knn, KnnJoin}

class KnnJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    .select($"vec_id", $"embedding", $"label")

  test("brute knn join matches per-query exact search") {
    val queries = emb.filter($"vec_id" < 3).select($"vec_id", $"embedding")
    val joined = KnnJoin.brute(queries, "vec_id", "embedding",
      emb, $"embedding", $"vec_id", k = 5, metric = "l2")
      .select($"_qid", $"_item".as("vec_id"), $"_score")
    queries.collect().foreach { r =>
      val qid = r.getLong(0)
      val q = r.getSeq[Float](1)
      val exact = Knn.search(emb, $"embedding", q, 5, "l2",
        tieBreak = Some($"vec_id"))
        .select($"vec_id", $"_score").as[(Long, Double)].collect().toSeq
      val got = joined.filter($"_qid" === qid)
        .select($"vec_id", $"_score").as[(Long, Double)].collect().toSeq
        .sortBy(x => (x._2, x._1))
      assert(got == exact.sortBy(x => (x._2, x._1)), s"qid=$qid")
    }
  }

  test("ivf knn join at nprobe=ncentroids equals the brute join") {
    val model = IvfIndex.train(emb, "embedding", ncentroids = 8)
    val assigned = IvfIndex.assign(emb, "embedding", model)
    val queries = emb.filter($"vec_id" < 5).select($"vec_id", $"embedding")
    val exact = KnnJoin.brute(queries, "vec_id", "embedding",
      emb, $"embedding", $"vec_id", k = 5, metric = "l2")
      .as[(Long, Long, Double)].collect().toSet
    val viaIvf = KnnJoin.ivf(queries, "vec_id", "embedding",
      assigned, $"embedding", $"vec_id", model, k = 5, nprobe = 8)
      .as[(Long, Long, Double)].collect().toSet
    assert(viaIvf == exact)
  }

  test("ivf knn join prunes: pruned candidate set, high recall") {
    val model = IvfIndex.train(emb, "embedding", ncentroids = 8)
    val assigned = IvfIndex.assign(emb, "embedding", model)
    val queries = emb.filter($"vec_id" < 20).select($"vec_id", $"embedding")
    val exact = KnnJoin.brute(queries, "vec_id", "embedding",
      emb, $"embedding", $"vec_id", k = 5, metric = "l2")
      .select($"_qid", $"_item").as[(Long, Long)].collect().toSet
    val approx = KnnJoin.ivf(queries, "vec_id", "embedding",
      assigned, $"embedding", $"vec_id", model, k = 5, nprobe = 4)
      .select($"_qid", $"_item").as[(Long, Long)].collect().toSet
    // probing half the lists keeps ≥80% of the exact neighbor pairs here
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall=$recall")
    // and each query still yields exactly k rows
    assert(approx.groupBy(_._1).forall(_._2.size == 5))
  }

  test("ivf knn join: ip metric ranks probes by inner product") {
    val model = IvfIndex.train(emb, "embedding", ncentroids = 8, metric = "ip")
    val assigned = IvfIndex.assign(emb, "embedding", model)
    val queries = emb.filter($"vec_id" < 5).select($"vec_id", $"embedding")
    val exact = KnnJoin.brute(queries, "vec_id", "embedding",
      emb, $"embedding", $"vec_id", k = 5, metric = "ip")
      .as[(Long, Long, Double)].collect().toSet
    val viaIvf = KnnJoin.ivf(queries, "vec_id", "embedding",
      assigned, $"embedding", $"vec_id", model, k = 5, nprobe = 8)
      .as[(Long, Long, Double)].collect().toSet
    assert(viaIvf == exact)
  }
}
