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

  test("as-of shuffles each input exactly once (union + one key exchange)") {
    // the scale claim vs a range-join formulation: |L| + |R| rows cross
    // the wire once, not |L| × |rows-in-range|
    val nL = 20000L
    val nR = 10000L
    val rec = shuffleRecords {
      val l = spark.range(nL).select(($"id" % 100).as("k"), ($"id" * 3).as("lt"))
      val r = spark.range(nR).select(($"id" % 100).as("k"), ($"id" * 7).as("rt"),
        $"id".as("rid"))
      // consume a window-derived column: a bare count() references
      // nothing the window computes, and Catalyst then prunes the whole
      // window + exchange (windows preserve cardinality)
      AsOfJoin.leftAsOf(l, r, Seq("k"), "lt", "rt",
        rightTieBreak = Some("rid")).agg(sum($"rt")).collect()
    }
    assert(rec >= nL + nR, s"expected one pass of both inputs, saw $rec")
    assert(rec <= nL + nR + 500,
      s"$rec shuffle records for ${nL + nR} input rows — an input shuffled twice")
  }

  test("null left time sorts before every right row — no match, row kept") {
    val l2 = Seq((1L, Some(25L), "t25"), (1L, None, "null-t"))
      .toDF("k", "lt", "ltag")
    val out = AsOfJoin.leftAsOf(l2, right, Seq("k"), "lt", "rt")
      .collect().map(r => r.getAs[String]("ltag") ->
        Option(r.getAs[Any]("rtag")).orNull).toMap
    assert(out.size == 2)              // left rows always survive
    assert(out("t25") == "r20b" || out("t25") == "r20")
    assert(out("null-t") == null)      // nulls-first: precedes all rights
  }

  test("composite key: both columns participate in the match") {
    val r2 = Seq((1L, "x", 10L, "r1x"), (1L, "y", 10L, "r1y"), (2L, "x", 10L, "r2x"))
      .toDF("k1", "k2", "rt", "rtag")
    val l2 = Seq((1L, "x", 20L), (1L, "y", 20L), (2L, "y", 20L))
      .toDF("k1", "k2", "lt")
    val out = AsOfJoin.leftAsOf(l2, r2, Seq("k1", "k2"), "lt", "rt")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        Option(r.getAs[Any]("rtag")).orNull).toMap
    assert(out((1L, "x")) == "r1x")
    assert(out((1L, "y")) == "r1y")
    assert(out((2L, "y")) == null)   // (2, y) has no right rows
  }

  test("null right time rows are ignored — never the latest-prior match") {
    val r2 = Seq((1L, Some(10L), "real"), (1L, Option.empty[Long], "null-rt"))
      .toDF("k", "rt", "rtag")
    val l2 = Seq((1L, 5L, "early"), (1L, 15L, "late")).toDF("k", "lt", "ltag")
    for (buckets <- Seq(1, 4)) {
      val out = AsOfJoin.leftAsOf(l2, r2, Seq("k"), "lt", "rt",
        skewBuckets = buckets)
        .collect().map(r => r.getAs[String]("ltag") ->
          Option(r.getAs[Any]("rtag")).orNull).toMap
      assert(out("early") == null, s"buckets=$buckets")  // null-rt must not match
      assert(out("late") == "real", s"buckets=$buckets")
    }
  }

  test("skewBuckets: nulls, ties and unmatched keys behave like the default path") {
    val l2 = left.unionByName(Seq((1L, Option.empty[Long], "null-t"))
      .toDF("k", "lt", "ltag"))
    val single = AsOfJoin.leftAsOf(l2, right, Seq("k"), "lt", "rt",
      rightTieBreak = Some("rid")).collect().map(_.toSeq).toSet
    val bucketed = AsOfJoin.leftAsOf(l2, right, Seq("k"), "lt", "rt",
      rightTieBreak = Some("rid"), skewBuckets = 4).collect().map(_.toSeq).toSet
    assert(bucketed == single)
  }

  test("skewBuckets: 90%-hot-key fixture matches brute force; hot key splits tasks") {
    val rnd = new scala.util.Random(11)
    val hot = 0L
    val lRows = Seq.tabulate(400) { i =>
      val k = if (i < 360) hot else (1 + rnd.nextInt(4)).toLong
      (k, rnd.nextInt(1000).toLong, i.toLong)
    }
    val rRows = Seq.tabulate(200) { i =>
      val k = if (i < 180) hot else (1 + rnd.nextInt(4)).toLong
      (k, rnd.nextInt(1000).toLong, (10000 + i).toLong)
    }
    val got = AsOfJoin.leftAsOf(lRows.toDF("k", "lt", "lid"),
      rRows.toDF("k", "rt", "rid"), Seq("k"), "lt", "rt",
      rightPrefix = "p_", rightTieBreak = Some("rid"), skewBuckets = 8)
    val gotMap = got.collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)) ->
        Option(x.getAs[Any]("p_rid")).map(_.asInstanceOf[Long])).toMap
    assert(gotMap.size == lRows.size)
    lRows.foreach { case (k, lt, lid) =>
      val want = rRows.filter(x => x._1 == k && x._2 <= lt)
        .sortBy(x => (x._2, x._3)).lastOption.map(_._3)
      assert(gotMap((k, lt, lid)) == want, s"k=$k lt=$lt")
    }
    // the hot key's rows land in >1 shuffle partition (the whole point);
    // AQE coalescing would merge these toy-sized partitions back together
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(coalesceKey, "true")
    try {
      spark.conf.set(coalesceKey, "false")
      val pids = AsOfJoin.leftAsOf(lRows.toDF("k", "lt", "lid"),
        rRows.toDF("k", "rt", "rid"), Seq("k"), "lt", "rt",
        rightPrefix = "p_", rightTieBreak = Some("rid"), skewBuckets = 8)
        .withColumn("pid", spark_partition_id())
        .filter(col("k") === hot).select("pid").distinct().count()
      assert(pids > 1, s"hot key confined to $pids partition(s)")
    } finally spark.conf.set(coalesceKey, prev)
  }

  test("skewAutoThreshold: triggers the bucketed path only past the key-count bar") {
    val rnd = new scala.util.Random(23)
    val lRows = Seq.tabulate(300)(i => (0L, rnd.nextInt(500).toLong, i.toLong))
    val rRows = Seq.tabulate(100)(i => (0L, rnd.nextInt(500).toLong, (5000 + i).toLong))
    // below threshold: single-window plan (no join node)
    val calm = AsOfJoin.leftAsOf(lRows.toDF("k", "lt", "lid"),
      rRows.toDF("k", "rt", "rid"), Seq("k"), "lt", "rt",
      rightPrefix = "p_", skewAutoThreshold = Some(100000L))
    assert(!calm.queryExecution.executedPlan.toString.contains("Join"))
    // past threshold: auto-bucketed, still matches brute force
    val auto = AsOfJoin.leftAsOf(lRows.toDF("k", "lt", "lid"),
      rRows.toDF("k", "rt", "rid"), Seq("k"), "lt", "rt",
      rightPrefix = "p_", rightTieBreak = Some("rid"),
      skewAutoThreshold = Some(50L))
    assert(auto.queryExecution.executedPlan.toString.contains("Join"))
    val got = auto.collect().map(x => (x.getLong(1), x.getLong(2)) ->
      Option(x.getAs[Any]("p_rid")).map(_.asInstanceOf[Long])).toMap
    lRows.foreach { case (_, lt, lid) =>
      val want = rRows.filter(_._2 <= lt).sortBy(x => (x._2, x._3)).lastOption.map(_._3)
      assert(got((lt, lid)) == want, s"lt=$lt")
    }
  }

  test("tolerance: matches older than the lookback drop to null, both paths") {
    val rnd = new scala.util.Random(31)
    val lRows = Seq.tabulate(120)(i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(200).toLong, i.toLong))
    val rRows = Seq.tabulate(60)(i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(200).toLong, (7000 + i).toLong))
    val tol = 25L
    for (buckets <- Seq(1, 4)) {
      val got = AsOfJoin.leftAsOf(lRows.toDF("k", "lt", "lid"),
        rRows.toDF("k", "rt", "rid"), Seq("k"), "lt", "rt",
        rightPrefix = "p_", rightTieBreak = Some("rid"),
        skewBuckets = buckets, tolerance = Some(tol))
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)) ->
          Option(x.getAs[Any]("p_rid")).map(_.asInstanceOf[Long])).toMap
      assert(got.size == lRows.size)
      lRows.foreach { case (k, lt, lid) =>
        val want = rRows.filter(x => x._1 == k && x._2 <= lt && lt - x._2 <= tol)
          .sortBy(x => (x._2, x._3)).lastOption.map(_._3)
        assert(got((k, lt, lid)) == want, s"buckets=$buckets k=$k lt=$lt")
      }
    }
  }

  test("forward: earliest right at-or-after; inclusive; tie → max rid; tolerance = lookahead") {
    val out = AsOfJoin.leftAsOf(left, right, Seq("k"), "lt", "rt",
      rightTieBreak = Some("rid"), direction = "forward")
      .collect().map(r => r.getAs[String]("ltag") ->
        Option(r.getAs[Any]("rtag")).orNull).toMap
    assert(out("before-any") == "r10")         // next right at rt=10
    assert(out("equal-ts") == "r10")           // rt >= lt inclusive
    assert(out("after-both") == null)          // nothing after lt=25
    assert(out("k2") == null)                  // purchase precedes
    assert(out("no-right-key") == null)
    // equal-future-time tie takes the greatest rid (r20b), like backward
    val tie = AsOfJoin.leftAsOf(Seq((1L, 15L, "t")).toDF("k", "lt", "ltag"),
      right, Seq("k"), "lt", "rt", rightTieBreak = Some("rid"),
      direction = "forward").head().getAs[String]("rtag")
    assert(tie == "r20b")
    // lookahead tolerance: next right further than tol drops to null
    val tol = AsOfJoin.leftAsOf(Seq((1L, 5L, "t")).toDF("k", "lt", "ltag"),
      right, Seq("k"), "lt", "rt", direction = "forward",
      tolerance = Some(3L)).head()
    assert(tol.getAs[Any]("rtag") == null)     // rt=10 is 5 > 3 away
  }

  test("nearest: closer side wins, ties to backward, one shuffle") {
    val l = Seq((1L, 18L, "closer-fwd"), (1L, 12L, "closer-back"),
      (1L, 15L, "equidistant"), (3L, 7L, "no-right-key")).toDF("k", "lt", "ltag")
    val out = AsOfJoin.leftAsOf(l, right, Seq("k"), "lt", "rt",
      rightTieBreak = Some("rid"), direction = "nearest")
      .collect().map(r => r.getAs[String]("ltag") ->
        Option(r.getAs[Any]("rtag")).orNull).toMap
    assert(out("closer-fwd") == "r20b")        // 18→20 (d=2) beats 18→10 (d=8); tie → max rid
    assert(out("closer-back") == "r10")        // 12→10 (d=2) beats 12→20 (d=8)
    assert(out("equidistant") == "r10")        // |15-10| == |15-20| → backward
    assert(out("no-right-key") == null)
    // exactly one Exchange: both carries share the key shuffle
    val plan = AsOfJoin.leftAsOf(l, right, Seq("k"), "lt", "rt",
      direction = "nearest").queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  test("property: forward and nearest match brute force") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 6) {
      val lRows = Seq.fill(40)((rnd.nextInt(5).toLong, rnd.nextInt(50).toLong,
        rnd.nextLong()))
      val rRows = Seq.fill(25)((rnd.nextInt(5).toLong, rnd.nextInt(50).toLong,
        rnd.nextLong()))
      val l = lRows.toDF("k", "lt", "lid")
      val r = rRows.toDF("k", "rt", "rid")
      def run(dir: String) = AsOfJoin.leftAsOf(l, r, Seq("k"), "lt", "rt",
        rightPrefix = "p_", rightTieBreak = Some("rid"), direction = dir)
        .collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)) ->
          Option(x.getAs[Any]("p_rid")).map(_.asInstanceOf[Long]))
        .toMap
      val fwd = run("forward"); val near = run("nearest")
      lRows.foreach { case (k, lt, lid) =>
        val back = rRows.filter(x => x._1 == k && x._2 <= lt)
          .sortBy(x => (x._2, x._3)).lastOption
        val fw = rRows.filter(x => x._1 == k && x._2 >= lt)
          .sortBy(x => (-x._2, x._3)).lastOption // min rt, then max rid
        assert(fwd((k, lt, lid)) == fw.map(_._3), s"fwd k=$k lt=$lt")
        val nr = (back, fw) match {
          case (None, f) => f
          case (b, None) => b
          case (Some(b), Some(f)) =>
            if (lt - b._2 <= f._2 - lt) Some(b) else Some(f)
        }
        assert(near((k, lt, lid)) == nr.map(_._3), s"near k=$k lt=$lt")
      }
    }
  }

  test("property: matches the brute-force latest-at-or-before reference") {
    // randomized small tables, fixed seeds — compare against a
    // driver-side O(|L|·|R|) reference implementation
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 8) {
      val lRows = Seq.fill(40)((rnd.nextInt(5).toLong, rnd.nextInt(50).toLong,
        rnd.nextLong()))
      val rRows = Seq.fill(25)((rnd.nextInt(5).toLong, rnd.nextInt(50).toLong,
        rnd.nextLong()))
      val l = lRows.toDF("k", "lt", "lid")
      val r = rRows.toDF("k", "rt", "rid")
      for (buckets <- Seq(1, 3)) {
        val got = AsOfJoin.leftAsOf(l, r, Seq("k"), "lt", "rt",
          rightPrefix = "p_", rightTieBreak = Some("rid"), skewBuckets = buckets)
          .collect()
          .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)) ->
            Option(x.getAs[Any]("p_rid")).map(_.asInstanceOf[Long]))
          .toMap
        lRows.foreach { case (k, lt, lid) =>
          // latest rt <= lt; ties on rt resolve to the greatest rid
          val want = rRows.filter(x => x._1 == k && x._2 <= lt)
            .sortBy(x => (x._2, x._3)).lastOption.map(_._3)
          assert(got((k, lt, lid)) == want,
            s"buckets=$buckets k=$k lt=$lt: got ${got((k, lt, lid))}, want $want")
        }
      }
    }
  }
}
