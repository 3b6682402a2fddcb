package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document CRUD re-expressed relationally (reference SURVEY §2.1):
  * vearch's upsert/delete/get-by-ids REST verbs become pure DataFrame
  * transforms here; against a transactional table format (Delta/Iceberg)
  * the same expressions drive `MERGE INTO`/`DELETE`. The reference write
  * path is POST /document/upsert → Engine::AddOrUpdate
  * (internal/engine/search/engine.cc:697-785); delete-by-query is
  * handler_document.go:498-555.
  *
  * Scale notes: upsert is an id-keyed anti-join — shuffles both sides on
  * the id hash (same layout vearch gets from murmur3 slot routing,
  * internal/entity/space.go:210-236). If the base table is bucketed by
  * `_id` the shuffle drops to the updates side only. getByIds broadcasts
  * the (tiny) request set — no corpus shuffle at all.
  */
object Documents {

  /** Insert-or-replace by id: rows in `updates` win over `base` (vearch
    * update path diffs fields; full-row replace is the relational
    * equivalent since updates carry the whole document).
    * `updates` must be unique per id (vearch applies batch items in order;
    * pre-dedupe with [[lastWinsById]] when needed).
    */
  def upsert(base: DataFrame, updates: DataFrame, idCol: String): DataFrame =
    base.join(updates.select(idCol), Seq(idCol), "left_anti")
      .unionByName(updates.select(base.columns.map(col).toIndexedSeq: _*))

  /** Collapse a batch with repeated ids to its last occurrence (vearch
    * applies items sequentially, last write wins).
    */
  def lastWinsById(updates: DataFrame, idCol: String, orderCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col(orderCol).desc)
    updates.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** Soft-delete-by-ids ≡ anti-filter (engine.cc:869-899 sets a bitmap;
    * relationally the rows just stop matching). NULL-safe: a null id
    * matches nothing, so the row survives (SQL DELETE deletes only rows
    * where the predicate IS TRUE).
    */
  def deleteByIds(df: DataFrame, idCol: String, ids: Seq[Any]): DataFrame =
    df.filter(!coalesce(col(idCol).isin(ids: _*), lit(false)))

  /** Delete-by-query: runs the filter, removes matches
    * (handler_document.go:498-555 does query→ids→delete; relationally one
    * negated predicate — same result, no id round-trip). NULL predicate
    * results keep the row: plain `!pred` would silently delete every row
    * where the predicate evaluates to NULL (e.g. a null-valued field).
    */
  def deleteByQuery(df: DataFrame, pred: Column): DataFrame =
    df.filter(!coalesce(pred, lit(false)))

  /** Point lookups preserving request order (router re-orders responses to
    * match the request id list, internal/client/client.go:1154-1170).
    * The id list becomes a broadcast inner join + order column.
    */
  def getByIds(df: DataFrame, idCol: String, ids: Seq[Long]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val req = ids.zipWithIndex.map { case (id, i) => (i, id) }.toDF("_ord", idCol)
    df.join(broadcast(req), Seq(idCol), "inner").orderBy(col("_ord"))
  }

  /** Default missing ids (vearch generates a UUID when `_id` is absent,
    * client.go:1197-1221). Deterministic flavor: content hash, so re-runs
    * of the same batch converge — the property the UUID path lacks.
    */
  def withDefaultIds(df: DataFrame, idCol: String): DataFrame = {
    val others = df.columns.filter(_ != idCol).map(col).toIndexedSeq
    df.withColumn(idCol, coalesce(col(idCol), md5(to_json(struct(others: _*)))))
  }
}
