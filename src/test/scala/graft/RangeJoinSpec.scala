package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val intervals = Seq(
    (1L, 10L, 20L, "a"),     // [10, 20)
    (1L, 15L, 40L, "b"),     // [15, 40) — overlaps a, spans buckets
    (2L, 0L, 100L, "c"),     // long interval, many buckets
    (1L, 50L, 50L, "empty")  // e <= s matches nothing
  ).toDF("k", "s", "e", "tag")

  private val points = Seq(
    (1L, 10L, "at-start"), (1L, 19L, "in-both"), (1L, 20L, "at-end"),
    (1L, 39L, "only-b"), (2L, 99L, "long"), (3L, 10L, "no-key")
  ).toDF("k", "t", "p")

  test("inclusive start, exclusive end, overlap and multi-bucket spans") {
    val out = RangeJoin.pointInInterval(points, intervals,
      Seq("k"), "t", "s", "e", bucketWidth = 8, intervalPrefix = "i_")
      .select($"p", $"i_tag").as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(out("at-start") == Seq("a"))              // s inclusive
    assert(out("in-both") == Seq("a", "b"))          // overlapping intervals
    assert(out("at-end") == Seq("b"))                // a's end exclusive; still in b
    assert(out("only-b") == Seq("b"))
    assert(out("long") == Seq("c"))                  // 13-bucket interval
    assert(!out.contains("no-key"))
  }

  test("each qualifying pair appears exactly once (no bucket duplicates)") {
    val out = RangeJoin.pointInInterval(points, intervals,
      Seq("k"), "t", "s", "e", bucketWidth = 3, intervalPrefix = "i_")
    assert(out.count() == out.dropDuplicates("p", "i_tag").count())
  }

  test("property: matches the brute-force range predicate") {
    val rnd = new scala.util.Random(13)
    val ps = Seq.fill(60)((rnd.nextInt(4).toLong, rnd.nextInt(100).toLong))
      .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
    val is = Seq.fill(30) {
      val s = rnd.nextInt(100).toLong
      (rnd.nextInt(4).toLong, s, s + rnd.nextInt(30).toLong, rnd.nextLong())
    }
    val got = RangeJoin.pointInInterval(
      ps.toDF("k", "t", "pid"), is.toDF("k", "s", "e", "iid"),
      Seq("k"), "t", "s", "e", bucketWidth = 7, intervalPrefix = "i_")
      .select($"pid", $"i_iid").as[(Long, Long)].collect().toSet
    val want = (for {
      (pk, t, pid) <- ps
      (ik, s, e, iid) <- is
      if pk == ik && s <= t && t < e
    } yield (pid, iid)).toSet
    assert(got == want)
  }

  test("plan is a hash equi-join on (key, bucket) — no BNLJ, no cartesian") {
    val out = RangeJoin.pointInInterval(points, intervals,
      Seq("k"), "t", "s", "e", bucketWidth = 8, intervalPrefix = "i_")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("ns-scale epochs: boundary points bucket exactly (no double rounding)") {
    // ~1.7e18 is past double's 2^53 exact range — a floor(c/w) through
    // double arithmetic can misplace boundary points by a whole bucket
    val w = 3600000000000L
    val b = 472241L * w
    val pts = Seq((1L, b, "at-boundary"), (1L, b - 1, "just-before"))
      .toDF("k", "t", "p")
    val ivs = Seq((1L, b - 1, b + 10, "win")).toDF("k", "s", "e", "tag")
    val out = RangeJoin.pointInInterval(pts, ivs, Seq("k"), "t", "s", "e",
      bucketWidth = w, intervalPrefix = "i_")
      .select($"p").as[String].collect().toSet
    assert(out == Set("at-boundary", "just-before"))
  }

  test("null times drop out (inner join on a null bucket matches nothing)") {
    val p = Seq((1L, Some(12L), "ok"), (1L, None, "null-t"))
      .toDF("k", "t", "p")
    val out = RangeJoin.pointInInterval(p, intervals,
      Seq("k"), "t", "s", "e", bucketWidth = 8, intervalPrefix = "i_")
      .select($"p").as[String].collect().toSet
    assert(out == Set("ok"))
  }

  test("sentinel open-ended intervals broadcast instead of exploding") {
    // end = Long.MaxValue would explode ~2^62 bucket rows without the
    // maxBucketsPerInterval guard; with it the interval joins broadcast
    val ivs = Seq(
      (1L, 10L, Long.MaxValue, "forever"),   // sentinel validity window
      (1L, 15L, 40L, "b")                    // normal exploded interval
    ).toDF("k", "s", "e", "tag")
    val pts = Seq((1L, 12L, "p1"), (1L, 20L, "p2"), (1L, 1000000L, "p3"),
      (2L, 50L, "p4")).toDF("k", "t", "p")
    val out = RangeJoin.pointInInterval(pts, ivs, Seq("k"), "t", "s", "e",
      bucketWidth = 8, intervalPrefix = "i_")
      .select($"p", $"i_tag").as[(String, String)].collect().toSet
    assert(out == Set(("p1", "forever"), ("p2", "forever"), ("p2", "b"),
      ("p3", "forever")))
    // keyless variant still completes and stays a hash join (constant key)
    val out2 = RangeJoin.pointInInterval(pts.drop("k"),
      ivs.filter($"tag" === "forever").drop("k"), Seq.empty,
      "t", "s", "e", bucketWidth = 8, intervalPrefix = "i_")
    assert(out2.count() == 4)
    val plan2 = out2.queryExecution.executedPlan.toString
    assert(!plan2.contains("BroadcastNestedLoopJoin") &&
      !plan2.contains("CartesianProduct"))
  }

  test("output name collision without a prefix fails loudly") {
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points,
        Seq((1L, 1L, 2L, "x")).toDF("k", "s", "e", "p"), // p collides
        Seq("k"), "t", "s", "e", bucketWidth = 8)
    }
  }
}
