package graft

import org.apache.spark.sql.functions._
import graft.operators.Documents

class DocumentsSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("_id", "v")

  test("upsert replaces matched ids and inserts new ones") {
    val updates = Seq((2L, "B"), (9L, "i")).toDF("_id", "v")
    val r = Documents.upsert(base, updates, "_id").orderBy("_id")
      .as[(Long, String)].collect().toSeq
    assert(r == Seq((1L, "a"), (2L, "B"), (3L, "c"), (9L, "i")))
  }

  test("lastWinsById collapses a batch in order") {
    val batch = Seq((5L, "x", 0), (5L, "y", 1), (5L, "z", 2), (6L, "q", 0))
      .toDF("_id", "v", "seq")
    val r = Documents.lastWinsById(batch, "_id", "seq").orderBy("_id")
      .select("_id", "v").as[(Long, String)].collect().toSeq
    assert(r == Seq((5L, "z"), (6L, "q")))
  }

  test("deleteByIds / deleteByQuery") {
    assert(Documents.deleteByIds(base, "_id", Seq(1L, 3L))
      .select("_id").as[Long].collect().toSeq == Seq(2L))
    assert(Documents.deleteByQuery(base, $"v" === "b")
      .orderBy("_id").select("_id").as[Long].collect().toSeq == Seq(1L, 3L))
  }

  test("getByIds preserves request order incl. repeats") {
    val r = Documents.getByIds(base, "_id", Seq(3L, 1L, 3L))
      .select("_id").as[Long].collect().toSeq
    assert(r == Seq(3L, 1L, 3L))
  }

  test("withDefaultIds is deterministic on content") {
    val d = Seq((null.asInstanceOf[String], "x"), ("keep", "y")).toDF("_id", "v")
    val r1 = Documents.withDefaultIds(d, "_id").orderBy("v")
      .select("_id").as[String].collect().toSeq
    val r2 = Documents.withDefaultIds(d, "_id").orderBy("v")
      .select("_id").as[String].collect().toSeq
    assert(r1 == r2)
    assert(r1(1) == "keep")
    assert(r1(0).length == 32) // md5 hex
  }

  test("withDefaultIds: explicit-id rows never consume occurrence slots") {
    // ADVICE r3: a batch mixing an explicit-id row with content-identical
    // null-id rows must give the null rows the SAME generated ids no
    // matter which partition-arrival order the rows land in
    val d = Seq(("keep", "x"), (null.asInstanceOf[String], "x"),
      (null.asInstanceOf[String], "x")).toDF("_id", "v")
    val expected = {
      val h = d.sparkSession.range(1)
        .select(md5(to_json(struct(lit("x").as("v"))))).head().getString(0)
      Set("keep", h, s"$h-2")
    }
    // repartition shuffles arrival order; the id multiset must not move
    (1 to 4).foreach { n =>
      val ids = Documents.withDefaultIds(d.repartition(n), "_id")
        .select("_id").as[String].collect().toSet
      assert(ids == expected, s"with $n partitions")
    }
  }
}
