package graft

import org.apache.spark.sql.functions._
import graft.operators.{Documents, IvfIndex, Knn}

/** Degenerate inputs: empty corpora, k > N, null vectors, tiny training
  * sets — the shapes that crash engines in production.
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private val schema = "id bigint, v array<float>"

  test("knn over an empty corpus returns empty, no crash") {
    val empty = spark.read.schema(schema).json(spark.emptyDataset[String])
    val r = Knn.search(empty, $"v", Seq(1f, 2f), 10, "l2")
    assert(r.count() == 0)
  }

  test("k larger than N returns all N") {
    val d = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f))).toDF("id", "v")
      .select($"id", $"v".cast("array<float>").as("v"))
    assert(Knn.search(d, $"v", Seq(1f, 0f), 100, "ip").count() == 2)
  }

  test("null vectors are excluded, never rank first under L2 asc") {
    val d = Seq((1L, Some(Seq(1f, 0f))), (2L, None), (3L, Some(Seq(0.9f, 0.1f))))
      .toDF("id", "v").select($"id", $"v".cast("array<float>").as("v"))
    val r = Knn.search(d, $"v", Seq(1f, 0f), 3, "l2", tieBreak = Some($"id"))
      .select($"id").as[Long].collect().toSeq
    assert(r == Seq(1L, 3L)) // id=2 (null vector) absent, not first
  }

  test("ivf train clamps ncentroids to corpus size; empty corpus rejected") {
    val tiny = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f))).toDF("id", "v")
      .select($"id", $"v".cast("array<float>").as("v"))
    val m = IvfIndex.train(tiny, "v", ncentroids = 16)
    assert(m.ncentroids <= 2)
    val empty = spark.read.schema(schema).json(spark.emptyDataset[String])
    assertThrows[IllegalArgumentException](IvfIndex.train(empty, "v", 4))
  }

  test("null vectors excluded from multi-vector and shortlist paths too") {
    val d = Seq((1L, Some(Seq(1f, 0f)), Some(Seq(1f, 0f))),
      (2L, None, Some(Seq(0f, 1f))), (3L, Some(Seq(0.5f, 0.5f)), None))
      .toDF("id", "v1", "v2")
      .select($"id", $"v1".cast("array<float>").as("v1"), $"v2".cast("array<float>").as("v2"))
    val mv = Knn.multiVectorSearch(d, "id",
      Seq(($"v1", Seq(1f, 0f)), ($"v2", Seq(1f, 0f))), 10, 10, "l2")
    // intersection requires both fields non-null → only id=1 survives
    assert(mv.select($"id").as[Long].collect().toSeq == Seq(1L))

    val coded = graft.operators.BinaryIndex.encode(
      d.select($"id", $"v1".as("v")), "v")
    val bs = graft.operators.BinaryIndex.search(coded, $"v", Seq(1f, 0f),
      k = 5, shortlist = 5, idCol = $"id")
    assert(!bs.select($"id").as[Long].collect().contains(2L))
  }

  test("batch knn with an empty query set returns empty") {
    val d = Seq((1L, Seq(1f, 0f))).toDF("id", "v")
      .select($"id", $"v".cast("array<float>").as("v"))
    val noQueries = d.filter($"id" < 0).select($"id".as("qid"), $"v".as("qv"))
    val r = Knn.searchBatch(d, $"v", struct($"id"), noQueries, "qid", "qv", 5, "ip")
    assert(r.count() == 0)
  }

  test("upsert with empty updates / empty base") {
    val base = Seq((1L, "a")).toDF("_id", "x")
    val empty = base.filter($"_id" < 0)
    assert(Documents.upsert(base, empty, "_id").count() == 1)
    assert(Documents.upsert(empty, base, "_id").count() == 1)
  }

  test("getByIds with ids that do not exist") {
    val base = Seq((1L, "a")).toDF("_id", "x")
    assert(Documents.getByIds(base, "_id", Seq(99L, 1L, 98L)).count() == 1)
  }
}
