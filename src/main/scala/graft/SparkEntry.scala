package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft.F
import graft.operators.Knn

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is one operator from SURVEY.md §2 (or a
  * beyond-reference pipeline operator); `oracleSql` holds the equivalent
  * DuckDB SQL over the same parquet tables. Column names are aliased
  * identically on both sides; every query has a deterministic total order.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Query vector = the embedding of vec_id 0 (deterministic fixture). */
  private def qvec(s: SparkSession, dir: String): Seq[Float] =
    t(s, dir, "embeddings").filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0)

  private def init(s: SparkSession): SparkSession = { Graft.registerFunctions(s); s }

  /** Flagship: hybrid search — scalar-filtered brute-force KNN, the vearch
    * hot path (SURVEY §3.1). Driver smoke-checks rows > 0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame = {
    init(spark)
    val dir = "/root/testdata/sf0.001"
    Knn.search(
      t(spark, dir, "embeddings"),
      vecCol = col("embedding"),
      query = qvec(spark, dir),
      k = 10,
      metric = "ip",
      filter = Some(col("label").isin(1, 3, 5, 7, 9)),
      tieBreak = Some(col("vec_id")),
      roundTo = Some(4))
      .select(col("vec_id"), col("label"), col("_score"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── §2.5 count: the only aggregation in the reference ──
    "q_count" -> ((s, dir) => {
      init(s)
      t(s, dir, "embeddings").agg(count(lit(1)).as("cnt"))
    }),

    // ── §2.1 get-by-ids (point lookup, request set) ──
    "q_get_by_ids" -> ((s, dir) => {
      init(s)
      t(s, dir, "embeddings")
        .filter(col("vec_id").isin(1L, 5L, 9L, 42L, 99L))
        .select(col("vec_id"), col("label"))
        .orderBy(col("vec_id"))
    }),

    // ── §2.3 range filters, AND-merged intervals ──
    "q_filter_range" -> ((s, dir) => {
      init(s)
      t(s, dir, "embeddings")
        .filter(col("label") >= 3 && col("label") < 7 && col("vec_id") < 200)
        .select(col("vec_id"), col("label"))
        .orderBy(col("vec_id"))
    }),

    // ── §2.3 OR across fields + != ──
    "q_filter_or" -> ((s, dir) => {
      init(s)
      t(s, dir, "events")
        .filter((col("event_type") === "error" || col("value") > 95.0) &&
          col("user_id") =!= 7)
        .select(col("event_id"), col("user_id"), col("event_type"),
          round(col("value"), 2).as("value"))
        .orderBy(col("event_id"))
    }),

    // ── §2.5 filtered scan with default limit 50 (doc_query.go:43) ──
    "q_scan_limit" -> ((s, dir) => {
      init(s)
      t(s, dir, "events")
        .filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"))
        .orderBy(col("event_id"))
        .limit(50)
    }),

    // ── §2.6 pagination: page_size=20, page_num=3 → offset 40 ──
    "q_scan_page" -> ((s, dir) => {
      init(s)
      t(s, dir, "events")
        .filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"))
        .orderBy(col("event_id"))
        .offset(40).limit(20)
    }),

    // ── §2.4 KNN brute-force, InnerProduct (desc) ──
    "q_knn_ip" -> ((s, dir) => {
      init(s)
      Knn.search(t(s, dir, "embeddings"), col("embedding"), qvec(s, dir),
        k = 10, metric = "ip", tieBreak = Some(col("vec_id")), roundTo = Some(4))
        .select(col("vec_id"), col("_score").as("score"))
    }),

    // ── §2.4 KNN brute-force, L2 (asc, sqrt'd — l2_sqrt semantics) ──
    "q_knn_l2" -> ((s, dir) => {
      init(s)
      Knn.search(t(s, dir, "embeddings"), col("embedding"), qvec(s, dir),
        k = 10, metric = "l2", tieBreak = Some(col("vec_id")), roundTo = Some(4))
        .select(col("vec_id"), col("_score").as("score"))
    }),

    // ── §2.4 KNN cosine ──
    "q_knn_cosine" -> ((s, dir) => {
      init(s)
      Knn.search(t(s, dir, "embeddings"), col("embedding"), qvec(s, dir),
        k = 10, metric = "cosine", tieBreak = Some(col("vec_id")), roundTo = Some(4))
        .select(col("vec_id"), col("_score").as("score"))
    }),

    // ── §2.4 hybrid: scalar pre-filter + KNN (the flagship shape) ──
    "q_knn_filtered" -> ((s, dir) => {
      init(s)
      Knn.search(t(s, dir, "embeddings"), col("embedding"), qvec(s, dir),
        k = 10, metric = "ip",
        filter = Some(col("label").isin(1, 3, 5) && col("vec_id") =!= 0),
        tieBreak = Some(col("vec_id")), roundTo = Some(4))
        .select(col("vec_id"), col("label"), col("_score").as("score"))
    }),

    // ── §2.4 score-range gate (min_score) ──
    "q_knn_score_range" -> ((s, dir) => {
      init(s)
      Knn.search(t(s, dir, "embeddings"), col("embedding"), qvec(s, dir),
        k = 100, metric = "cosine", minScore = Some(0.2),
        tieBreak = Some(col("vec_id")), roundTo = Some(4))
        .select(col("vec_id"), col("_score").as("score"))
    }),

    // ── beyond-reference: TPC-H Q1-style aggregation ──
    "q1_agg" -> ((s, dir) => {
      init(s)
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q_count" ->
      "SELECT count(*) AS cnt FROM embeddings",

    "q_get_by_ids" ->
      """SELECT vec_id, label FROM embeddings
         WHERE vec_id IN (1,5,9,42,99) ORDER BY vec_id""",

    "q_filter_range" ->
      """SELECT vec_id, label FROM embeddings
         WHERE label >= 3 AND label < 7 AND vec_id < 200 ORDER BY vec_id""",

    "q_filter_or" ->
      """SELECT event_id, user_id, event_type, round(value, 2) AS value
         FROM events
         WHERE (event_type = 'error' OR value > 95.0) AND user_id <> 7
         ORDER BY event_id""",

    "q_scan_limit" ->
      """SELECT event_id, user_id FROM events WHERE event_type = 'click'
         ORDER BY event_id LIMIT 50""",

    "q_scan_page" ->
      """SELECT event_id, user_id FROM events WHERE event_type = 'view'
         ORDER BY event_id LIMIT 20 OFFSET 40""",

    "q_knn_ip" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0)
         SELECT e.vec_id,
                round(list_dot_product(e.embedding::DOUBLE[], q.v), 4) AS score
         FROM embeddings e, q
         ORDER BY list_dot_product(e.embedding::DOUBLE[], q.v) DESC, e.vec_id
         LIMIT 10""",

    "q_knn_l2" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0)
         SELECT e.vec_id,
                round(list_distance(e.embedding::DOUBLE[], q.v), 4) AS score
         FROM embeddings e, q
         ORDER BY list_distance(e.embedding::DOUBLE[], q.v) ASC, e.vec_id
         LIMIT 10""",

    "q_knn_cosine" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0)
         SELECT e.vec_id,
                round(list_cosine_similarity(e.embedding::DOUBLE[], q.v), 4) AS score
         FROM embeddings e, q
         ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.v) DESC, e.vec_id
         LIMIT 10""",

    "q_knn_filtered" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0)
         SELECT e.vec_id, e.label,
                round(list_dot_product(e.embedding::DOUBLE[], q.v), 4) AS score
         FROM embeddings e, q
         WHERE e.label IN (1,3,5) AND e.vec_id <> 0
         ORDER BY list_dot_product(e.embedding::DOUBLE[], q.v) DESC, e.vec_id
         LIMIT 10""",

    "q_knn_score_range" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0)
         SELECT e.vec_id,
                round(list_cosine_similarity(e.embedding::DOUBLE[], q.v), 4) AS score
         FROM embeddings e, q
         WHERE list_cosine_similarity(e.embedding::DOUBLE[], q.v) >= 0.2
         ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.v) DESC, e.vec_id
         LIMIT 100""",

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
                round(sum(l_quantity), 2) AS sum_qty,
                round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                count(*) AS cnt
         FROM lineitem
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
  )
}
