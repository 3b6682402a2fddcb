package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: each left row picks the LATEST right row
  * with the same key and rightTime ≤ leftTime — the standard temporal
  * lookup ("state of the dimension when the event happened") that an
  * equi-join can't express and a range join explodes on.
  *
  * Formulated as union → one window pass, the scalable shape:
  * both sides are tagged and unioned, sorted within each key by
  * (time, side, tieBreak) — right rows sort BEFORE left rows at equal
  * time, making the match inclusive — and a running
  * `last(right_payload, ignoreNulls)` carries the most recent right row
  * forward onto every left row. ONE shuffle on the key columns, no
  * time-range candidate explosion (a range-join formulation pays
  * |left| × |right-rows-in-range| intermediates; this pays
  * |left| + |right| rows total), no driver state.
  *
  * Hot-key skew: a key whose row count dwarfs the rest concentrates one
  * partition's sort — the carry-forward needs full key order, so salting
  * can't help. `skewBuckets > 1` switches to a two-pass time-bucketed
  * carry that splits every key across up to `skewBuckets` tasks:
  * pass 1 computes each (key, bucket)'s closing right row with a plain
  * map-side-combinable aggregate, then a tiny per-key window (≤ buckets
  * rows per key) carries the latest closing row forward as each bucket's
  * seed; pass 2 windows WITHIN (key, bucket) — bounded partitions — and
  * coalesces the in-bucket running match with the seed. Results are
  * identical to the single-window path (property-tested); the extra cost
  * is one bounded 2-scalar driver action (min/max time for bucket
  * boundaries) and one small equi-join.
  *
  * Right rows with a NULL `rightTime` are IGNORED (filtered before the
  * merge): a null time would sort before every real row and become the
  * "latest prior" match for left rows that precede any real right row,
  * violating the rightTime ≤ leftTime contract.
  */
object AsOfJoin {

  /** Left as-of join.
    *
    * @param keyCols       equi-join key column names (present both sides)
    * @param leftTime      left event-time column name
    * @param rightTime     right event-time column name (cast to the left
    *                      type for the merge ordering); null-time right
    *                      rows are ignored
    * @param rightPrefix   prefix for right payload columns in the output
    *                      (use when names collide with left columns)
    * @param rightTieBreak right column ordering ties at identical
    *                      (key, time): the row with the GREATEST tie-break
    *                      value wins, making duplicate-timestamp input
    *                      deterministic. None → ties resolve arbitrarily.
    * @param skewBuckets   1 (default) = single window per key; > 1 =
    *                      skew-safe two-pass bucketed carry splitting each
    *                      key across up to this many time buckets/tasks
    * @param tolerance     max lookback in the time column's own units:
    *                      a match older than `leftTime − tolerance` is
    *                      dropped (NULL payload) — the merge_asof
    *                      tolerance semantics; the latest prior row is
    *                      also the nearest, so "latest then check" equals
    *                      "filter then latest". Numeric time types only.
    * @param skewAutoThreshold when set (and skewBuckets == 1), one extra
    *                      map-side-combinable aggregate measures the max
    *                      per-key row count; past the threshold the
    *                      bucketed path triggers automatically with
    *                      ceil(max/threshold) buckets (capped at 256) so
    *                      each (key, bucket) task holds ~threshold rows
    * @param direction     "backward" (default): latest right with
    *                      rightTime ≤ leftTime. "forward": earliest right
    *                      with rightTime ≥ leftTime — implemented by
    *                      negating both time columns and running the
    *                      backward machinery (so skew bucketing, auto
    *                      trigger and tolerance all compose; tolerance
    *                      bounds the LOOKAHEAD). "nearest": the closer of
    *                      the backward and forward matches, ties to
    *                      backward — one extra window over the SAME sort
    *                      (no extra shuffle); single-window path only.
    *                      forward/nearest require numeric time columns
    *                      (the distance arithmetic and negation need
    *                      them; Long.MinValue times would overflow the
    *                      negation and are out of contract).
    * Output: every left row with all its columns, plus each right payload
    * column (all non-key right columns) as `rightPrefix + name` — NULL
    * when no right row matches in the chosen direction.
    */
  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPrefix: String = "",
      rightTieBreak: Option[String] = None,
      skewBuckets: Int = 1,
      skewAutoThreshold: Option[Long] = None,
      tolerance: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    require(keyCols.nonEmpty, "as-of join needs at least one key column")
    require(skewBuckets >= 1, s"skewBuckets must be >= 1: $skewBuckets")
    tolerance.foreach(t => require(t >= 0, s"tolerance must be >= 0: $t"))
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest: $direction")
    if (direction != "backward") {
      val numeric =
        left.schema(leftTime).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] &&
          right.schema(rightTime).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
      require(numeric, s"$direction as-of requires numeric time columns")
      require(!keyCols.contains(leftTime) && !keyCols.contains(rightTime),
        s"$direction as-of cannot use a time column as a join key")
    }
    if (direction == "forward") {
      // rt ≥ lt ⇔ −rt ≤ −lt; equal-time inclusivity and greatest-tie-break
      // semantics survive the flip, and the backward tolerance check
      // (−lt) − (−rt) ≤ tol is exactly the lookahead rt − lt ≤ tol
      return leftAsOf(
        left.withColumn(leftTime, -col(leftTime)),
        right.withColumn(rightTime, -col(rightTime)),
        keyCols, leftTime, rightTime, rightPrefix, rightTieBreak,
        skewBuckets, skewAutoThreshold, tolerance, "backward")
        .withColumn(leftTime, -col(leftTime))
        .withColumn(rightPrefix + rightTime, -col(rightPrefix + rightTime))
    }
    require(direction == "backward" || (skewBuckets == 1 && skewAutoThreshold.isEmpty),
      "nearest as-of supports the single-window path only (wrap hot keys upstream)")
    val lPayload = left.columns.toSeq.filterNot(keyCols.contains)
    val rPayload = right.columns.toSeq.filterNot(keyCols.contains)
    val outNames = keyCols ++ lPayload ++ rPayload.map(rightPrefix + _)
    require(outNames.distinct.size == outNames.size,
      s"as-of join output column collision: ${outNames.diff(outNames.distinct).distinct.mkString(", ")} " +
        "— set rightPrefix to disambiguate right payload columns")
    val tType = left.schema(leftTime).dataType
    val rTType = right.schema(rightTime).dataType
    // a timestamp→long cast silently yields SECONDS: merging a ns-long
    // left against a timestamp right would compare across units. Identical
    // types always work; differing types only when both are plain numerics
    require(rTType == tType ||
      (tType.isInstanceOf[org.apache.spark.sql.types.NumericType] &&
        rTType.isInstanceOf[org.apache.spark.sql.types.NumericType]),
      s"as-of time types must match or both be numeric: left $tType vs right $rTType")
    // _tie keeps the right tie-break column's OWN type (string ids order
    // correctly; a long cast would null them out); left rows carry a null
    // _tie, which never compares across sides — _side already separates
    val tieType = rightTieBreak.map(c => right.schema(c).dataType)
      .getOrElse(org.apache.spark.sql.types.LongType)
    val lSide = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTime).cast(tType).as("_t"),
        lit(1).as("_side"),
        lit(null).cast(tieType).as("_tie"),
        struct(lPayload.map(col): _*).as("_l")): _*)
    val rSide = right
      .filter(col(rightTime).isNotNull)   // see scaladoc: null-time rights ignored
      .select(
        keyCols.map(col) ++ Seq(
          col(rightTime).cast(tType).as("_t"),
          lit(0).as("_side"),
          rightTieBreak.map(col).getOrElse(lit(0L)).as("_tie"),
          // _r carries its own time so a tolerance bound can check the
          // matched row's age after the carry
          struct(col(rightTime).cast(tType).as("__rt"),
            struct(rPayload.map(col): _*).as("__rp")).as("_r")): _*)
    val unioned = lSide.unionByName(rSide, allowMissingColumns = true)
    val effBuckets =
      if (skewBuckets > 1) skewBuckets
      else skewAutoThreshold match {
        case Some(th) if th > 0 =>
          // bounded 1-scalar action; the count is map-side combinable
          val r = unioned.groupBy(keyCols.map(col): _*)
            .agg(count(lit(1)).as("_n")).agg(max(col("_n"))).head()
          val mx = if (r.isNullAt(0)) 0L else r.getLong(0)
          if (mx > th) math.min(256L, (mx + th - 1) / th).toInt else 1
        case _ => 1
      }
    val (matched, rm) =
      if (direction == "nearest") {
        val m = nearestWindow(unioned, keyCols)
        // bound each side by tolerance first, then take the closer match,
        // ties to backward; null left time keeps the no-match contract
        // (the forward frame would otherwise hand it the earliest right)
        def bounded(c: Column, dist: Column): Column = tolerance match {
          case Some(tol) => when(dist <= tol, c)
          case None => c
        }
        val rb = bounded(col("_rmB"), col("_t") - col("_rmB").getField("__rt"))
        val rf = bounded(col("_rmF"), col("_rmF").getField("__rt") - col("_t"))
        val pick = when(col("_t").isNull, col("_rmB"))
          .when(rb.isNull, rf)
          .when(rf.isNull, rb)
          .when(col("_t") - rb.getField("__rt") <= rf.getField("__rt") - col("_t"), rb)
          .otherwise(rf)
        (m, pick)
      } else {
        val m =
          if (effBuckets == 1) singleWindow(unioned, keyCols)
          else bucketedCarry(unioned, keyCols, effBuckets)
        val r = tolerance match {
          case Some(tol) =>
            require(tType.isInstanceOf[org.apache.spark.sql.types.NumericType],
              s"tolerance requires a numeric time column (got $tType)")
            when(col("_t") - col("_rm").getField("__rt") <= tol, col("_rm"))
          case None => col("_rm")
        }
        (m, r)
      }
    matched.select(
      keyCols.map(col) ++
        lPayload.map(c => col("_l").getField(c).as(c)) ++
        rPayload.map(c => rm.getField("__rp").getField(c).as(rightPrefix + c)): _*)
  }

  /** One running window per key — optimal when no key dominates. */
  private def singleWindow(unioned: DataFrame, keyCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_rm", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
  }

  /** Backward + forward carries over ONE shuffle: both windows partition
    * by the same keys, so Catalyst plans a single Exchange (the forward
    * window's tie-DESC ordering costs one extra in-partition Sort).
    * `_rmB` = latest right ≤ t (rights sort before lefts at equal time →
    * inclusive); `_rmF` = earliest right STRICTLY after t (equal-time
    * rights precede the left row and are already _rmB's distance-0
    * match, which nearest always prefers), greatest tie-break winning at
    * an equal future time — the same tie rule as the other directions.
    */
  private def nearestWindow(unioned: DataFrame, keyCols: Seq[String]): DataFrame = {
    val wB = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t"), col("_side"), col("_tie").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    unioned
      .withColumn("_rmB", last(col("_r"), ignoreNulls = true).over(wB))
      .withColumn("_rmF", first(col("_r"), ignoreNulls = true).over(wF))
      .filter(col("_side") === 1)
  }

  /** Skew-safe two-pass carry: split each key into `nBuckets` time ranges.
    *
    * Bucket boundaries come from a bounded min/max driver action; the
    * double cast is only used for bucket ASSIGNMENT, which needs
    * monotonicity, not exactness (equal times always share a bucket; the
    * within-bucket ordering uses the full-precision `_t`). Null `_t` rows
    * (left rows only — null rights are pre-filtered) go to sentinel
    * bucket -1, which orders before every real bucket and never receives
    * a seed — preserving the single-window "null left time → no match"
    * behavior. Key grouping is null-safe (`<=>`) to match window
    * partitioning semantics, where null keys form a group.
    */
  private def bucketedCarry(
      unioned: DataFrame, keyCols: Seq[String], nBuckets: Int): DataFrame = {
    val bounds = unioned.agg(
      min(col("_t").cast("double")), max(col("_t").cast("double"))).head()
    if (bounds.isNullAt(0)) return singleWindow(unioned, keyCols) // no real times
    val mn = bounds.getDouble(0)
    val mx = bounds.getDouble(1)
    val width = if (mx > mn) (mx - mn) / nBuckets else 1.0
    val bucket = when(col("_t").isNull, lit(-1L)).otherwise(
      least(floor((col("_t").cast("double") - lit(mn)) / lit(width)),
        lit(nBuckets - 1L)).cast("long"))
    val u = unioned.withColumn("_b", bucket)
    // pass 1: closing right row per (key, bucket) — map-side-combinable;
    // max_by skips rows whose ordering value is null (= all left rows)
    val kb = u.groupBy((keyCols :+ "_b").map(col): _*)
      .agg(max_by(when(col("_side") === 0, col("_r")),
        when(col("_side") === 0, struct(col("_t"), col("_tie")))).as("_close"))
    // carry the latest closing row from STRICTLY EARLIER buckets — a tiny
    // per-key frame (≤ nBuckets + 1 rows per key)
    val wB = Window.partitionBy(keyCols.map(col): _*).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val seeds = kb.withColumn("_seed", last(col("_close"), ignoreNulls = true).over(wB))
      .select(keyCols.map(c => col(c).as(s"_sk_$c")) ++
        Seq(col("_b").as("_sb"), col("_seed")): _*)
    // pass 2: window within (key, bucket) — partitions bounded by the
    // bucket split — seeded with the carry-in when the bucket has no
    // earlier in-bucket right row
    val cond: Column = (keyCols.map(c => col(c) <=> col(s"_sk_$c")) :+
      (col("_b") <=> col("_sb"))).reduce(_ && _)
    val w2 = Window.partitionBy((keyCols :+ "_b").map(col): _*)
      .orderBy(col("_t"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.join(seeds, cond)
      .withColumn("_rl", last(col("_r"), ignoreNulls = true).over(w2))
      .withColumn("_rm", coalesce(col("_rl"), col("_seed")))
      .filter(col("_side") === 1)
  }
}
