package graft.operators

import org.apache.spark.sql.DataFrame
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
  * |left| + |right| rows total), no driver state. A key whose row count
  * dwarfs the rest concentrates one partition's sort — the carry-forward
  * needs full key order, so the mitigation is range-partitioning within
  * the hot key by time (coarse time bucket in the key, bucket boundaries
  * seeded with the previous bucket's closing right row), not salting.
  */
object AsOfJoin {

  /** Left as-of join.
    *
    * @param keyCols       equi-join key column names (present both sides)
    * @param leftTime      left event-time column name
    * @param rightTime     right event-time column name (cast to the left
    *                      type for the merge ordering)
    * @param rightPrefix   prefix for right payload columns in the output
    *                      (use when names collide with left columns)
    * @param rightTieBreak right column ordering ties at identical
    *                      (key, time): the row with the GREATEST tie-break
    *                      value wins, making duplicate-timestamp input
    *                      deterministic. None → ties resolve arbitrarily.
    * Output: every left row with all its columns, plus each right payload
    * column (all non-key right columns) as `rightPrefix + name` — NULL
    * when no right row precedes the left row.
    */
  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPrefix: String = "",
      rightTieBreak: Option[String] = None): DataFrame = {
    require(keyCols.nonEmpty, "as-of join needs at least one key column")
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
    val rSide = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTime).cast(tType).as("_t"),
        lit(0).as("_side"),
        rightTieBreak.map(col).getOrElse(lit(0L)).as("_tie"),
        struct(rPayload.map(col): _*).as("_r")): _*)
    val unioned = lSide.unionByName(rSide, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("_rm", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    matched.select(
      keyCols.map(col) ++
        lPayload.map(c => col("_l").getField(c).as(c)) ++
        rPayload.map(c => col("_rm").getField(c).as(rightPrefix + c)): _*)
  }
}
