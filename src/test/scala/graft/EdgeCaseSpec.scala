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

  test("int8 and RaBitQ paths: nulls excluded, parameter bounds enforced") {
    val d = Seq((1L, Some(Seq(1f, 0f, 0f, 0f))), (2L, None), (3L, Some(Seq(0f, 1f, 0f, 0f))))
      .toDF("id", "v").select($"id", $"v".cast("array<float>").as("v"))
    val coded = d.withColumn("iv", graft.Graft.F.quantizeI8($"v"))
    val q = Array[Byte](127, 0, 0, 0)
    val got = Knn.searchInt8(coded, $"iv", q, k = 5, metric = "ip",
      tieBreak = Some($"id")).select($"id").as[Long].collect().toSeq
    assert(got == Seq(1L, 3L)) // null vector never appears
    // RaBitQ qb bounds
    val bcoded = graft.operators.BinaryIndex.encode(d, "v")
    assertThrows[IllegalArgumentException](
      graft.operators.BinaryIndex.search(bcoded, $"v", Seq(1f, 0f, 0f, 0f),
        k = 1, shortlist = 1, idCol = $"id", qb = 9))
    // constant query vector: quantizeQuery must not divide by zero
    val qq = graft.operators.BinaryIndex.quantizeQuery(Seq(0.5f, 0.5f), qb = 4)
    assert(qq.toSeq == Seq(0.5f, 0.5f))
    // qb=4 with nulls: null code rows never shortlist
    val bs = graft.operators.BinaryIndex.search(bcoded, $"v", Seq(1f, 0f, 0f, 0f),
      k = 5, shortlist = 5, idCol = $"id", qb = 4)
    assert(!bs.select($"id").as[Long].collect().contains(2L))
  }

  test("sort spec referencing an unknown field fails at analysis, not silently") {
    val space = graft.schema.Space.fromJson(
      """{"name":"s","fields":[{"name":"n","type":"long"}]}""")
    val corpus = Seq(("a", 1L), ("b", 2L)).toDF("_id", "n")
    assertThrows[org.apache.spark.sql.AnalysisException] {
      graft.api.SearchApi.query(corpus, space,
        """{"sort":[{"nope":{"order":"desc"}}],"limit":10}""").collect()
    }
  }

  test("batched IVF search with an empty query set returns empty") {
    val d = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val model = IvfIndex.train(d, "embedding", 2)
    val assigned = IvfIndex.assign(d, "embedding", model)
    val r = IvfIndex.searchBatch(assigned, $"embedding", struct($"vec_id"),
      Seq.empty, model, k = 3, nprobe = 2)
    assert(r.count() == 0)
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
