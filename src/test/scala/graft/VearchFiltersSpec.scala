package graft

import graft.operators.VearchFilters

class VearchFiltersSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, 10, "x", Seq("red", "blue")),
    (2L, 20, "y", Seq("green")),
    (3L, 30, "x", Seq("blue", "black")),
    (4L, 40, "z", Seq("red"))
  ).toDF("id", "n", "s", "tags")

  private def ids(json: String, arrayFields: Set[String] = Set.empty): Seq[Long] =
    df.filter(VearchFilters.parse(json, arrayFields))
      .orderBy("id").select("id").as[Long].collect().toSeq

  test("AND of range conditions merges to interval") {
    val j = """{"operator":"AND","conditions":[
      {"operator":">=","field":"n","value":15},
      {"operator":"<","field":"n","value":40}]}"""
    assert(ids(j) == Seq(2L, 3L))
  }

  test("OR across fields") {
    val j = """{"operator":"OR","conditions":[
      {"operator":"=","field":"s","value":"z"},
      {"operator":"<=","field":"n","value":10}]}"""
    assert(ids(j) == Seq(1L, 4L))
  }

  test("!= and <> are equivalent") {
    val a = """{"operator":"AND","conditions":[{"operator":"!=","field":"s","value":"x"}]}"""
    val b = """{"operator":"AND","conditions":[{"operator":"<>","field":"s","value":"x"}]}"""
    assert(ids(a) == Seq(2L, 4L))
    assert(ids(a) == ids(b))
  }

  test("IN / NOT IN on scalar field") {
    val j = """{"operator":"AND","conditions":[{"operator":"IN","field":"s","value":["x","z"]}]}"""
    assert(ids(j) == Seq(1L, 3L, 4L))
    val nj = """{"operator":"AND","conditions":[{"operator":"NOT IN","field":"s","value":["x","z"]}]}"""
    assert(ids(nj) == Seq(2L))
  }

  test("IN on stringArray field = any-element-matches (term semantics)") {
    val j = """{"operator":"AND","conditions":[{"operator":"IN","field":"tags","value":["red","black"]}]}"""
    assert(ids(j, Set("tags")) == Seq(1L, 3L, 4L))
    val nj = """{"operator":"AND","conditions":[{"operator":"NOT IN","field":"tags","value":["red","black"]}]}"""
    assert(ids(nj, Set("tags")) == Seq(2L))
  }

  test("date fields: epoch seconds ×1e9 and date strings → UnixNano") {
    // column stores ns-epoch longs, the vearch date convention
    val d = Seq((1L, 1700000000L * 1000000000L), (2L, 1800000000L * 1000000000L))
      .toDF("id", "created")
    // numeric value = epoch SECONDS (doc_query.go:1043-1045 scales ×1e9)
    val byEpoch = d.filter(VearchFilters.parse(
      """{"operator":"AND","conditions":[
           {"operator":">","field":"created","value":1750000000}]}""",
      dateFields = Set("created")))
      .select("id").as[Long].collect().toSeq
    assert(byEpoch == Seq(2L))
    // string value parsed as a date
    val byString = d.filter(VearchFilters.parse(
      """{"operator":"AND","conditions":[
           {"operator":"<","field":"created","value":"2024-01-01"}]}""",
      dateFields = Set("created")))
      .select("id").as[Long].collect().toSeq
    assert(byString == Seq(1L)) // 1700000000 ≈ 2023-11; 1800000000 ≈ 2027-01
  }

  test("empty conditions matches everything; bad operator throws") {
    assert(ids("""{"operator":"AND","conditions":[]}""") == Seq(1L, 2L, 3L, 4L))
    assertThrows[IllegalArgumentException] {
      ids("""{"operator":"AND","conditions":[{"operator":"LIKE","field":"s","value":"x"}]}""")
    }
  }
}
