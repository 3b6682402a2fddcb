package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // (key, time, id) right rows; (key, time, tag) left rows
  private val right = Seq(
    (1L, 10L, 100L, "r10"), (1L, 20L, 101L, "r20"), (1L, 20L, 102L, "r20b"),
    (2L, 50L, 103L, "r50")
  ).toDF("k", "rt", "rid", "rtag")

  private val left = Seq(
    (1L, 5L, "before-any"), (1L, 10L, "equal-ts"), (1L, 25L, "after-both"),
    (2L, 60L, "k2"), (3L, 7L, "no-right-key")
  ).toDF("k", "lt", "ltag")

  test("latest right row at or before each left time; inclusive at equal ts") {
    val out = AsOfJoin.leftAsOf(left, right, Seq("k"), "lt", "rt",
      rightTieBreak = Some("rid"))
      .collect().map(r => r.getAs[String]("ltag") ->
        Option(r.getAs[Any]("rtag")).orNull).toMap
    assert(out("before-any") == null)          // no right row yet
    assert(out("equal-ts") == "r10")           // rt <= lt is inclusive
    assert(out("after-both") == "r20b")        // latest ts wins; tie → max rid
    assert(out("k2") == "r50")
    assert(out("no-right-key") == null)        // key absent on right
  }

  test("rightPrefix renames payload; all left rows and columns survive") {
    val out = AsOfJoin.leftAsOf(left, right, Seq("k"), "lt", "rt",
      rightPrefix = "p_")
    assert(out.count() == left.count())
    assert(out.columns.toSet ==
      Set("k", "lt", "ltag", "p_rt", "p_rid", "p_rtag"))
  }

  test("string tie-break column orders correctly (no silent long cast)") {
    val r2 = Seq((1L, 20L, "a", "first"), (1L, 20L, "b", "second"))
      .toDF("k", "rt", "tid", "rtag")
    val l2 = Seq((1L, 30L, "x")).toDF("k", "lt", "ltag")
    val out = AsOfJoin.leftAsOf(l2, r2, Seq("k"), "lt", "rt",
      rightTieBreak = Some("tid")).head()
    assert(out.getAs[String]("rtag") == "second")   // max tid "b" wins
  }

  test("output name collision without a prefix fails loudly") {
    val r2 = Seq((1L, 10L, "r")).toDF("k", "lt", "ltag") // same names as left
    intercept[IllegalArgumentException] {
      AsOfJoin.leftAsOf(left, r2, Seq("k"), "lt", "lt")
    }
  }

  test("plan is one window over a union — no join node, no cartesian") {
    val out = AsOfJoin.leftAsOf(left, right, Seq("k"), "lt", "rt")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Window"))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }
}
