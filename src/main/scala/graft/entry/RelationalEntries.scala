package graft.entry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft.F
import graft.SparkEntry._
import graft.api.SearchApi
import graft.operators.{Dedup, Documents, HnswIndex, IvfIndex, Knn, KnnJoin, Multimodal, Packing, PqIndex, Sampling, Skew, TextOps, VearchFilters}
import graft.schema.Space

/** relational/OLAP queries: TPC-H-shaped aggregates and joins, windows, set ops, as-of/range joins, events.
  *
  * Split from SparkEntry (round 18) purely mechanically — same entries,
  * same helper surface (imported from [[graft.SparkEntry]]), no behavior
  * change. Declared-query docs and reference citations live on the
  * entries themselves.
  */
private[graft] object RelationalEntries {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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

    // ── beyond-reference: 3-table join (broadcast dim, shuffled fact) ──
    "q3_join" -> ((s, dir) => {
      init(s)
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), col("c_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    // ── beyond-reference: window top-N per group ──
    "q_window_topn" -> ((s, dir) => {
      init(s)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
    }),

    // ── beyond-reference: event-time tumbling-window aggregation ──
    "q_events_hourly" -> ((s, dir) => {
      init(s)
      events(s, dir)
        .groupBy(col("event_type"), expr("ts div 3600000000000").as("hr"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("event_type"), col("hr"))
    }),

    // ── beyond-reference: exact distinct aggregation ──
    "q_distinct" -> ((s, dir) => {
      init(s)
      events(s, dir)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("users"), count(lit(1)).as("cnt"))
        .orderBy(col("event_type"))
    }),

    // ── pipeline CAPSTONE (oracle-checked end to end): the TRAINING-DATA
    //    flow COMPOSED — token-count quality gate → exact dedup (keep
    //    min-id copy) → temperature rebalance across langs → sequence
    //    packing (q_pipeline_e2e is the SEARCH-side twin: quality →
    //    dedup → embedding join → KNN). Every stage is the real
    //    operator; the oracle re-derives all four stages in one SQL
    //    query, so the COMPOSITION is verified, not just each stage ──
    "q_pipeline_train" -> ((s, dir) => {
      init(s)
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
      val gated = docs.filter(col("n_tokens") >= 20)
      val keep = Dedup.exact(gated, "doc_id", "text")
        .select(col("keep_id").as("doc_id"))
      val deduped = gated.join(keep, "doc_id")
      val sampled = Sampling.temperatureSample(deduped, col("lang"),
          col("doc_id"), alpha = 0.5, targetFrac = 0.5)
        .localCheckpoint() // two consumers (pack + lang re-join) must see
                           // ONE sample; also fixes range bounds for pack
      Packing.packAssignments(sampled.select("doc_id", "n_tokens"),
          "doc_id", "n_tokens", seqLen = 256, numParts = 8)
        .join(sampled.select(col("doc_id"), col("lang")), "doc_id")
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          col("start_offset"), col("seq_id"), col("end_seq"), col("n_seqs"))
        .orderBy(col("doc_id"))
    }),

    // ── beyond-reference: 5-table star join, dims broadcast ──
    "q5_join" -> ((s, dir) => {
      init(s)
      val dims = t(s, dir, "region").filter(col("r_name") === "ASIA")
        .join(t(s, dir, "nation"), col("n_regionkey") === col("r_regionkey"))
        .join(t(s, dir, "customer"), col("c_nationkey") === col("n_nationkey"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("n_name"))
    }),

    // ── beyond-reference: semi join (EXISTS) ──
    "q_semi_join" -> ((s, dir) => {
      init(s)
      val withP = t(s, dir, "orders").filter(col("o_orderstatus") === "P")
        .select(col("o_custkey").as("c_custkey"))
      t(s, dir, "customer").join(withP, Seq("c_custkey"), "left_semi")
        .agg(count(lit(1)).as("cnt"))
    }),

    // ── beyond-reference: anti join (NOT EXISTS) ──
    "q_anti_join" -> ((s, dir) => {
      init(s)
      val withP = t(s, dir, "orders").filter(col("o_orderstatus") === "P")
        .select(col("o_custkey").as("c_custkey"))
      t(s, dir, "customer").join(withP, Seq("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("cnt"))
    }),

    // ── beyond-reference: HAVING + conditional aggregation ──
    "q_having_case" -> ((s, dir) => {
      init(s)
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"),
          sum(when(col("o_totalprice") > 150000.0, 1).otherwise(0)).as("big_orders"))
        .filter(col("cnt") >= 100)
        .orderBy(col("o_orderpriority"))
    }),

    // ── beyond-reference: gap-based sessionization (lag + cumsum window) ──
    "q_sessionize" -> ((s, dir) => {
      init(s)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"))
      events(s, dir)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_ts").isNull || col("ts") - col("prev_ts") > 1800000000000L, 1)
            .otherwise(0))
        .withColumn("sess_id", sum(col("new_sess")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"))
        .agg(max(col("sess_id")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    }),

    // ── beyond-reference: ROLLUP hierarchy aggregation ──
    "q_rollup" -> ((s, dir) => {
      init(s)
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("cnt"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("sum_qty"), col("cnt"))
        .orderBy(col("rf"), col("ls"))
    }),

    // ── beyond-reference: UNION + DISTINCT set semantics ──
    "q_union_distinct" -> ((s, dir) => {
      init(s)
      val e = events(s, dir)
      e.filter(col("event_type") === "click").select(col("user_id"))
        .union(e.filter(col("value") > 90.0).select(col("user_id")))
        .distinct()
        .orderBy(col("user_id"))
    }),

    // ── beyond-reference: explode + re-aggregate (word frequencies) ──
    "q_explode_words" -> ((s, dir) => {
      init(s)
      t(s, dir, "part")
        .select(explode(split(col("p_name"), " ")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("word"))
    }),

    // ── beyond-reference: correlated-average filter (window form) ──
    "q_above_avg" -> ((s, dir) => {
      init(s)
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("o_custkey"))
      t(s, dir, "orders")
        .withColumn("cust_avg", avg(col("o_totalprice")).over(w))
        .filter(col("o_totalprice") > col("cust_avg") * 1.5)
        .select(col("o_orderkey"), col("o_custkey"))
        .orderBy(col("o_orderkey"))
    }),

    // ── beyond-reference: scalar string functions ──
    "q_string_funcs" -> ((s, dir) => {
      init(s)
      t(s, dir, "part")
        .select(col("p_partkey"),
          upper(col("p_name")).as("uname"),
          substring(col("p_type"), 1, 5).as("t5"),
          regexp_replace(col("p_brand"), "#", "-").as("brand2"),
          length(col("p_name")).cast("long").as("ln"))
        .orderBy(col("p_partkey"))
    }),

    // ── beyond-reference: NULL-semantics expressions (nullif/coalesce) ──
    "q_null_semantics" -> ((s, dir) => {
      init(s)
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          coalesce(nullif(col("l_discount"), lit(0.0)), lit(-1.0)).as("d"))
        // (orderkey, linenumber) is NOT unique in this fixture — order by
        // every output column so the sort is total over row content
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("d"))
        .limit(500)
    }),

    // ── beyond-reference: date-part extraction + aggregation ──
    "q_date_parts" -> ((s, dir) => {
      init(s)
      t(s, dir, "lineitem")
        .groupBy(year(col("l_shipdate")).cast("long").as("y"),
          month(col("l_shipdate")).cast("long").as("m"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("y"), col("m"))
    }),

    // ── beyond-reference: semi-structured JSON extraction ──
    "q_json_extract" -> ((s, dir) => {
      init(s)
      events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          round(avg(col("k")), 4).as("avg_k"),
          max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    }),

    // ── pipeline showcase: quality-filter → dedup-survivors → embedding
    //    join → KNN, one composed DataFrame flow (fully oracle-checked) ──
    "q_pipeline_e2e" -> ((s, dir) => {
      init(s)
      val docs = t(s, dir, "documents")
      val emb = t(s, dir, "embeddings")
      val quality = TextOps.qualityFeatures(col("text"), TextOps.EnStopwords)
      val good = docs.withColumn("q", quality)
        .filter(col("q.n_tokens") >= 20 && col("q.stopword_ratio") < 0.5)
        .select(col("doc_id"), col("text"))
      val survivors = Dedup.exact(good, "doc_id", "text")
        .select(col("keep_id").as("doc_id"))
      val corpus = good.join(survivors, "doc_id")
        .join(emb, col("doc_id") === col("vec_id"))
      Knn.search(corpus, col("embedding"), qvec(s, dir), 10, "cosine",
        tieBreak = Some(col("doc_id")), roundTo = Some(4))
        .select(col("doc_id"), col("_score").as("score"))
    }),

    // ── pipeline: Gopher-style repetition filters — per-row expressions
    //    only (most-frequent unigram/bigram fraction, distinct-token
    //    fraction), embarrassingly parallel at any scale ──
    "q_rep_signals" -> ((s, dir) => {
      init(s)
      val r = TextOps.repetitionSignals(col("text"))
      t(s, dir, "documents").select(col("doc_id"), r.as("r"))
        .select(col("doc_id"),
          col("r.n_tokens").cast("long").as("n_tokens"),
          round(col("r.distinct_frac"), 4).as("distinct_frac"),
          round(col("r.top_unigram_frac"), 4).as("top_unigram_frac"),
          round(col("r.top_bigram_frac"), 4).as("top_bigram_frac"))
        .orderBy(col("doc_id"))
    }),

    // ── beyond-reference: as-of join — each click picks the user's most
    //    recent prior purchase via union + one running-window pass (one
    //    shuffle, no time-range candidate explosion) ──
    "q_asof_join" -> ((s, dir) => {
      init(s)
      asofClicksToPurchases(s, dir, skewBuckets = 1)
    }),

    // ── same as-of semantics through the skew-safe two-pass bucketed
    //    carry (hot keys split across time buckets) — shares
    //    q_asof_join's oracle, proving path equivalence ──
    "q_asof_skew" -> ((s, dir) => {
      init(s)
      asofClicksToPurchases(s, dir, skewBuckets = 8)
    }),

    // ── same semantics with the AUTO skew trigger live: the max-per-key
    //    probe measures ~30-45 events/user on every fixture, so a
    //    threshold of 20 actually FIRES the ceil(max/20)-bucket path —
    //    trigger + bucketed carry compose under q_asof_join's oracle ──
    "q_asof_auto_skew" -> ((s, dir) => {
      init(s)
      asofClicksToPurchases(s, dir, skewBuckets = 1,
        skewAutoThreshold = Some(20L))
    }),

    // ── as-of with a 1-hour max-lookback tolerance (merge_asof
    //    semantics): a latest-prior purchase older than the bound drops
    //    to the no-match sentinel ──
    "q_asof_tolerance" -> ((s, dir) => {
      init(s)
      asofClicksToPurchases(s, dir, skewBuckets = 1,
        tolerance = Some(3600000000L))
    }),

    // ── FORWARD as-of: earliest purchase at-or-after each click (the
    //    "next event" lookup) — negated-time reuse of the backward
    //    machinery, tolerance bounds the lookahead ──
    "q_asof_forward" -> ((s, dir) => {
      init(s)
      asofClicksToPurchases(s, dir, skewBuckets = 1, direction = "forward")
    }),

    // ── NEAREST as-of: the closer of the prior and next purchase, ties
    //    to the prior — both carries ride one shuffle ──
    "q_asof_nearest" -> ((s, dir) => {
      init(s)
      asofClicksToPurchases(s, dir, skewBuckets = 1, direction = "nearest")
    }),

    // ── beyond-reference: grouped top-k through the custom bounded-heap
    //    aggregate (graft_topk) — direct oracle check of the
    //    TypedImperativeAggregate against SQL row_number ──
    "q_group_topk" -> ((s, dir) => {
      init(s)
      events(s, dir)
        .groupBy(col("event_type"))
        .agg(F.topK(col("value"), struct(col("event_id")), k = 3,
          asc = false).as("_tk"))
        .select(col("event_type"), explode(col("_tk")).as("_e"))
        .select(col("event_type"),
          col("_e.item.event_id").as("event_id"),
          round(col("_e.score"), 2).as("value"))
        .orderBy(col("event_type"), col("value").desc, col("event_id"))
    }),

    // ── beyond-reference: INTERSECT — users who both clicked and
    //    purchased ──
    "q_intersect" -> ((s, dir) => {
      init(s)
      val ev = events(s, dir)
      ev.filter(col("event_type") === "click").select(col("user_id"))
        .intersect(
          ev.filter(col("event_type") === "purchase").select(col("user_id")))
        .orderBy(col("user_id"))
    }),

    // ── beyond-reference: EXCEPT — users who clicked but never
    //    purchased ──
    "q_except" -> ((s, dir) => {
      init(s)
      val ev = events(s, dir)
      ev.filter(col("event_type") === "click").select(col("user_id"))
        .except(
          ev.filter(col("event_type") === "purchase").select(col("user_id")))
        .orderBy(col("user_id"))
    }),

    // ── beyond-reference: range (point-in-interval) join — each click
    //    matched to the purchase windows containing it via bucketed
    //    equi-join (the naive key-only join materializes every per-key
    //    pair before the range filter) ──
    "q_range_join" -> ((s, dir) => {
      init(s)
      // µs-truncated BEFORE the join — matches the oracle's epoch_us
      // precision so boundary comparisons can't disagree on ns residues
      val hourUs = 3600000000L
      val ev = events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), expr("ts div 1000").as("ts_us"))
      val windows = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("w_id"),
          expr("ts div 1000").as("w_start_us"),
          expr("ts div 1000 + 3600000000").as("w_end_us"))
      graft.operators.RangeJoin.pointInInterval(clicks, windows,
        Seq("user_id"), "ts_us", "w_start_us", "w_end_us", bucketWidth = hourUs)
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("w_id"), col("w_start_us"))
        .orderBy(col("event_id"), col("w_id"))
    }),

    // ── beyond-reference: PIVOT — lang × source count matrix with an
    //    explicit value list (no extra pass to discover columns; absent
    //    cells are true zeros) ──
    "q_pivot" -> ((s, dir) => {
      init(s)
      val srcs = (0 until 20).map(i => s"src$i")
      t(s, dir, "documents").groupBy(col("lang"))
        .pivot("source", srcs).count()
        .na.fill(0L, srcs)
        .orderBy(col("lang"))
    }),

    // ── beyond-reference: statistical aggregates (corr / stddev / covar —
    //    one-pass partial-mergeable moments, map-side combined) ──
    "q_stats" -> ((s, dir) => {
      init(s)
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"),
          round(avg(col("l_extendedprice")), 2).as("avg_price"),
          round(stddev_samp(col("l_extendedprice")), 2).as("sd_price"),
          round(corr(col("l_extendedprice"), col("l_discount")), 4).as("corr_pd"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 4).as("cov_qd"))
        .orderBy(col("l_returnflag"))
    }),

    // ── pipeline: global top-k n-grams — corpus boilerplate discovery
    //    (explode → count → top-k, map-side partial aggregation) ──
    "q_top_ngrams" -> ((s, dir) => {
      init(s)
      val docs = t(s, dir, "documents")
      // projection boundary: tokenize once per row, THEN shingle — the
      // one-select formulation re-tokenizes inside the transform lambda
      docs.select(TextOps.tokens(col("text")).as("_toks"))
        .select(explode(Dedup.shinglesFromTokens(col("_toks"), 2)).as("ngram"))
        .groupBy("ngram").agg(count(lit(1)).as("doc_freq"))
        .orderBy(col("doc_freq").desc, col("ngram"))
        .limit(20)
    }),

    // ── pipeline: per-doc top-3 TF-IDF keywords (salient-term
    //    extraction; tf and df shuffles keyed on the term) ──
    "q_tfidf" -> ((s, dir) => {
      init(s)
      TextOps.tfidfKeywords(t(s, dir, "documents"), "doc_id", "text", k = 3)
        .select(col("id").as("doc_id"), col("rank"), col("term"),
          col("tf"), round(col("tfidf"), 4).as("tfidf"))
        .orderBy(col("doc_id"), col("rank"))
    }),

    // ── pipeline: unigram-LM quality score — corpus-trained token
    //    distribution, per-doc avg log probability (perplexity proxy) ──
    "q_lm_score" -> ((s, dir) => {
      init(s)
      TextOps.unigramLogProb(t(s, dir, "documents"), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_tokens"),
          round(col("avg_logp"), 4).as("avg_logp"))
        .orderBy(col("doc_id"))
    }),

    // ── beyond-reference: salted two-phase aggregation — the hot-GROUP-BY
    //    shape AQE can't split; oracle-checked against the plain GROUP BY,
    //    proving the salt is semantics-preserving ──
    "q_salted_agg" -> ((s, dir) => {
      init(s)
      Skew.saltedAgg(
        events(s, dir).select(col("event_type"), col("value")),
        Seq(col("event_type")), salts = 8)(
        Seq(sum(col("value")).as("_s"), count(lit(1)).as("_c")),
        Seq(round(sum(col("_s")), 2).as("sum_value"), sum(col("_c")).as("cnt")))
        .orderBy(col("event_type"))
    }),

    // ── beyond-reference: CUBE aggregation (all grouping-set combinations
    //    in one shuffle) ──
    "q_cube" -> ((s, dir) => {
      init(s)
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          count(lit(1)).as("cnt"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("sum_qty"), col("cnt"))
        .orderBy(col("rf"), col("ls"))
    }),
  )

  def oracles: Map[String, String] = Map(

    // most-frequent unigram/bigram via group-by counts — same numbers as
    // the Spark side's sorted-run-length per-row formulation
    "q_rep_signals" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
                    FROM documents),
         uni AS (SELECT doc_id, max(c) AS top FROM (
                   SELECT doc_id, tok, count(*) AS c FROM (
                     SELECT doc_id, unnest(w) AS tok FROM t)
                   GROUP BY doc_id, tok)
                 GROUP BY doc_id),
         bg AS (SELECT doc_id,
                       [w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))] AS b
                FROM t),
         bi AS (SELECT doc_id, max(c) AS top FROM (
                  SELECT doc_id, g, count(*) AS c FROM (
                    SELECT doc_id, unnest(b) AS g FROM bg)
                  GROUP BY doc_id, g)
                GROUP BY doc_id)
         SELECT t.doc_id, len(w) AS n_tokens,
                round(len(list_distinct(w))::DOUBLE / len(w), 4) AS distinct_frac,
                round(uni.top::DOUBLE / len(w), 4) AS top_unigram_frac,
                round(bi.top::DOUBLE / (len(w) - 1), 4) AS top_bigram_frac
         FROM t JOIN uni USING (doc_id) JOIN bi USING (doc_id)
         ORDER BY t.doc_id""",

    // portable as-of formulation: left join on key + time bound, keep the
    // latest right row (ties by greatest event_id — the Spark side's
    // rightTieBreak). Unmatched clicks keep -1 sentinels, matching the
    // Spark coalesce (avoids NULL-int → float dtype drift in the compare).
    "q_asof_join" -> asofOracle,
    // identical oracle: the skew-safe bucketed path must produce the
    // exact same rows as the single-window path
    "q_asof_skew" -> asofOracle,
    // identical oracle again with the AUTO trigger active (threshold 20 <
    // max per-key count on every fixture): trigger detection + bucketed
    // path must be invisible in the result
    "q_asof_auto_skew" -> asofOracle,
    // tolerance bound folds into the join predicate: the latest prior row
    // is also the nearest, so filter-then-latest ≡ latest-then-check
    "q_asof_tolerance" ->
      """WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
                    FROM events WHERE event_type = 'click'),
         p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                      round(value, 2) AS value
               FROM events WHERE event_type = 'purchase'),
         j AS (SELECT c.event_id, c.user_id, c.ts_us,
                      p.event_id AS p_event_id, p.ts_us AS p_ts_us,
                      p.value AS p_value,
                      row_number() OVER (PARTITION BY c.event_id
                        ORDER BY p.ts_us DESC, p.event_id DESC) AS rn
               FROM c LEFT JOIN p
                 ON c.user_id = p.user_id AND p.ts_us <= c.ts_us
                    AND c.ts_us - p.ts_us <= 3600000000)
         SELECT event_id, user_id, ts_us,
                coalesce(p_event_id, -1) AS p_event_id,
                coalesce(p_ts_us, -1) AS p_ts_us,
                coalesce(p_value, -1.0) AS p_value
         FROM j WHERE rn = 1 ORDER BY event_id""",

    // forward: earliest purchase at-or-after, greatest event_id at ties
    "q_asof_forward" ->
      """WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
                    FROM events WHERE event_type = 'click'),
         p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                      round(value, 2) AS value
               FROM events WHERE event_type = 'purchase'),
         j AS (SELECT c.event_id, c.user_id, c.ts_us,
                      p.event_id AS p_event_id, p.ts_us AS p_ts_us,
                      p.value AS p_value,
                      row_number() OVER (PARTITION BY c.event_id
                        ORDER BY p.ts_us ASC, p.event_id DESC) AS rn
               FROM c LEFT JOIN p
                 ON c.user_id = p.user_id AND p.ts_us >= c.ts_us)
         SELECT event_id, user_id, ts_us,
                coalesce(p_event_id, -1) AS p_event_id,
                coalesce(p_ts_us, -1) AS p_ts_us,
                coalesce(p_value, -1.0) AS p_value
         FROM j WHERE rn = 1 ORDER BY event_id""",

    // nearest: min |Δt|, ties to the prior side, then greatest event_id —
    // the same rule the two-carry window picks
    "q_asof_nearest" ->
      """WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
                    FROM events WHERE event_type = 'click'),
         p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                      round(value, 2) AS value
               FROM events WHERE event_type = 'purchase'),
         j AS (SELECT c.event_id, c.user_id, c.ts_us,
                      p.event_id AS p_event_id, p.ts_us AS p_ts_us,
                      p.value AS p_value,
                      row_number() OVER (PARTITION BY c.event_id
                        ORDER BY abs(p.ts_us - c.ts_us) ASC,
                                 (p.ts_us <= c.ts_us) DESC,
                                 p.event_id DESC) AS rn
               FROM c LEFT JOIN p ON c.user_id = p.user_id)
         SELECT event_id, user_id, ts_us,
                coalesce(p_event_id, -1) AS p_event_id,
                coalesce(p_ts_us, -1) AS p_ts_us,
                coalesce(p_value, -1.0) AS p_value
         FROM j WHERE rn = 1 ORDER BY event_id""",

    // distinct bigrams per doc (Dedup.shingles array_distinct semantics)
    // → count = document frequency
    "q_top_ngrams" ->
      """WITH t AS (SELECT doc_id,
              -- canonical tokenizer twin (TextOps.tokens): trim +
              -- \s+ split, empty text = ZERO tokens — DuckDB's
              -- split would mint phantom ''-tokens on empty text,
              -- doubled spaces, or tabs
              CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                   ELSE string_split_regex(trim(text), '\s+') END AS w
       FROM documents),
         sh AS (SELECT doc_id,
                       CASE WHEN len(w) >= 2
                            THEN list_distinct([w[i] || ' ' || w[i+1]
                                                FOR i IN range(1, len(w))])
                            ELSE [array_to_string(w, ' ')] END AS s
                FROM t),
         e AS (SELECT unnest(s) AS ngram FROM sh)
         SELECT ngram, count(*) AS doc_freq FROM e GROUP BY ngram
         ORDER BY doc_freq DESC, ngram LIMIT 20""",

    // raw-score ranking (rounding only on output); ties resolve to the
    // lexicographically smaller term on both sides
    "q_tfidf" ->
      """WITH u AS (SELECT doc_id,
                           unnest(string_split_regex(trim(text), '\s+')) AS term
                    FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM u GROUP BY doc_id, term),
         df AS (SELECT term, count(DISTINCT doc_id) AS df FROM u GROUP BY term),
         n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
         s AS (SELECT tf.doc_id, tf.term, tf.tf,
                      tf.tf * ln(n.n_docs / df.df) AS tfidf,
                      row_number() OVER (PARTITION BY tf.doc_id
                        ORDER BY tf.tf * ln(n.n_docs / df.df) DESC, tf.term)
                        AS rank
               FROM tf JOIN df USING (term), n)
         SELECT doc_id, CAST(rank AS INT) AS rank, term, tf,
                round(tfidf, 4) AS tfidf
         FROM s WHERE rank <= 3
         ORDER BY doc_id, rank""",

    "q_lm_score" ->
      """WITH u AS (SELECT doc_id,
                           unnest(string_split_regex(trim(text), '\s+')) AS tok
                    FROM documents),
         c AS (SELECT tok, count(*) AS cnt FROM u GROUP BY tok),
         n AS (SELECT sum(cnt)::DOUBLE AS n_total FROM c)
         SELECT u.doc_id, count(*) AS n_tokens,
                round(avg(log10(c.cnt / n.n_total)), 4) AS avg_logp
         FROM u JOIN c USING (tok), n
         GROUP BY u.doc_id ORDER BY u.doc_id""",

    "q_group_topk" ->
      """WITH r AS (SELECT event_type, event_id, value,
                row_number() OVER (PARTITION BY event_type
                  ORDER BY value DESC, event_id) AS rn
         FROM events)
         SELECT event_type, event_id, round(value, 2) AS value
         FROM r WHERE rn <= 3
         ORDER BY event_type, round(value, 2) DESC, event_id""",

    "q_intersect" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
         INTERSECT
         SELECT user_id FROM events WHERE event_type = 'purchase'
         ORDER BY user_id""",

    "q_except" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
         EXCEPT
         SELECT user_id FROM events WHERE event_type = 'purchase'
         ORDER BY user_id""",

    "q_range_join" ->
      """WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
                    FROM events WHERE event_type = 'click'),
         p AS (SELECT event_id AS w_id, user_id, epoch_us(ts) AS ws_us
               FROM events WHERE event_type = 'purchase')
         SELECT c.event_id, c.user_id, c.ts_us, p.w_id,
                p.ws_us AS w_start_us
         FROM c JOIN p ON c.user_id = p.user_id
           AND p.ws_us <= c.ts_us AND c.ts_us < p.ws_us + 3600000000
         ORDER BY c.event_id, p.w_id""",

    "q_pivot" ->
      ("""SELECT lang, """ +
        (0 until 20).map(i =>
          s"count(*) FILTER (WHERE source = 'src$i') AS src$i").mkString(", ") +
        """ FROM documents GROUP BY lang ORDER BY lang"""),

    "q_stats" ->
      """SELECT l_returnflag, count(*) AS cnt,
                round(avg(l_extendedprice), 2) AS avg_price,
                round(stddev_samp(l_extendedprice), 2) AS sd_price,
                round(corr(l_extendedprice, l_discount), 4) AS corr_pd,
                round(covar_samp(l_quantity, l_discount), 4) AS cov_qd
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q_salted_agg" ->
      """SELECT event_type, round(sum(value), 2) AS sum_value,
                count(*) AS cnt
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
                coalesce(l_linestatus, 'ALL') AS ls,
                round(sum(l_quantity), 2) AS sum_qty, count(*) AS cnt
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY rf, ls""",

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
                round(sum(l_quantity), 2) AS sum_qty,
                round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                count(*) AS cnt
         FROM lineitem
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "q3_join" ->
      """SELECT o.o_orderkey, c.c_name,
                round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
         FROM lineitem l
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN customer c ON o.o_custkey = c.c_custkey
         GROUP BY o.o_orderkey, c.c_name
         ORDER BY revenue DESC, o.o_orderkey LIMIT 10""",

    "q_window_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) WHERE rn <= 3
         ORDER BY o_custkey, o_totalprice DESC, o_orderkey""",

    "q_events_hourly" ->
      """SELECT event_type, epoch_ns(ts) // 3600000000000 AS hr,
                count(*) AS cnt, round(sum(value), 2) AS sum_value
         FROM events GROUP BY event_type, hr ORDER BY event_type, hr""",

    "q_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS users, count(*) AS cnt
         FROM events GROUP BY event_type ORDER BY event_type""",

    // all four pipeline stages re-derived in one query: token gate,
    // md5 keep-first dedup, exponentiated-share rates + the portable
    // uniform, and the ORDER BY doc_id prefix-sum packing arithmetic
    "q_pipeline_train" ->
      s"""WITH toks AS (SELECT doc_id, lang, text,
                           CASE WHEN trim(text) = '' THEN 0
                                ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens
                    FROM documents),
         g AS (SELECT * FROM toks WHERE n_tokens >= 20),
         k AS (SELECT min(doc_id) AS doc_id FROM g GROUP BY md5(text)),
         d AS (SELECT g.* FROM g JOIN k USING (doc_id)),
         c AS (SELECT lang, count(*)::DOUBLE AS n FROM d GROUP BY lang),
         r AS (SELECT lang, least(1.0, 0.5 * (SELECT sum(n) FROM c)
                        * (pow(n, 0.5) / (SELECT sum(pow(n, 0.5)) FROM c))
                        / n) AS rate
               FROM c),
         s AS (SELECT d.doc_id, d.lang, d.n_tokens
               FROM d JOIN r USING (lang)
               WHERE ${portableUniformSql("d.doc_id::VARCHAR")} < r.rate),
         c2 AS (SELECT doc_id, lang, n_tokens,
                       coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS start_offset
                FROM s)
         SELECT doc_id, lang, n_tokens, start_offset,
                start_offset // 256 AS seq_id,
                CASE WHEN n_tokens = 0 THEN start_offset // 256
                     ELSE (start_offset + n_tokens - 1) // 256 END AS end_seq,
                CASE WHEN n_tokens = 0 THEN 0
                     ELSE (start_offset + n_tokens - 1) // 256
                            - start_offset // 256 + 1 END AS n_seqs
         FROM c2 ORDER BY doc_id""",

    "q_pipeline_e2e" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0),
         f AS (SELECT doc_id, text,
                      string_split_regex(trim(text), '\s+') AS w FROM documents),
         good AS (SELECT doc_id, text FROM f
                  WHERE len(w) >= 20
                    AND CAST(len(list_filter(w, x -> x IN ('the','a','an','of','and','to','in','is','it','that','for','on','with','as','at','by'))) AS DOUBLE)
                        / len(w) < 0.5),
         surv AS (SELECT min(doc_id) AS doc_id FROM good GROUP BY md5(text))
         SELECT g.doc_id,
                round(list_cosine_similarity(e.embedding::DOUBLE[], q.v), 4) AS score
         FROM good g JOIN surv s ON g.doc_id = s.doc_id
         JOIN embeddings e ON e.vec_id = g.doc_id, q
         ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.v) DESC, g.doc_id
         LIMIT 10""",

    "q_string_funcs" ->
      """SELECT p_partkey, upper(p_name) AS uname, substr(p_type, 1, 5) AS t5,
                replace(p_brand, '#', '-') AS brand2, length(p_name) AS ln
         FROM part ORDER BY p_partkey""",

    "q_null_semantics" ->
      """SELECT l_orderkey, l_linenumber,
                coalesce(nullif(l_discount, 0.0), -1.0) AS d
         FROM lineitem ORDER BY l_orderkey, l_linenumber, d LIMIT 500""",

    "q_date_parts" ->
      """SELECT CAST(year(l_shipdate) AS BIGINT) AS y,
                CAST(month(l_shipdate) AS BIGINT) AS m, count(*) AS cnt
         FROM lineitem GROUP BY y, m ORDER BY y, m""",

    "q_json_extract" ->
      """SELECT event_type, count(*) AS cnt,
                round(avg(CAST(props->>'k' AS BIGINT)), 4) AS avg_k,
                CAST(max(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS max_k
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
                coalesce(l_linestatus, 'ALL') AS ls,
                round(sum(l_quantity), 2) AS sum_qty, count(*) AS cnt
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY rf, ls""",

    "q_union_distinct" ->
      """SELECT DISTINCT user_id FROM (
           SELECT user_id FROM events WHERE event_type = 'click'
           UNION ALL SELECT user_id FROM events WHERE value > 90.0)
         ORDER BY user_id""",

    "q_explode_words" ->
      """SELECT word, count(*) AS cnt
         FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
         GROUP BY word ORDER BY word""",

    "q_above_avg" ->
      """WITH w AS (SELECT o_orderkey, o_custkey, o_totalprice,
                           avg(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_avg
                    FROM orders)
         SELECT o_orderkey, o_custkey FROM w
         WHERE o_totalprice > cust_avg * 1.5 ORDER BY o_orderkey""",

    "q5_join" ->
      """SELECT n_name,
                round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM region
         JOIN nation ON n_regionkey = r_regionkey
         JOIN customer ON c_nationkey = n_nationkey
         JOIN orders ON o_custkey = c_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         WHERE r_name = 'ASIA'
         GROUP BY n_name ORDER BY n_name""",

    "q_semi_join" ->
      """SELECT count(*) AS cnt FROM customer
         WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')""",

    "q_anti_join" ->
      """SELECT count(*) AS cnt FROM customer
         WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')""",

    "q_having_case" ->
      """SELECT o_orderpriority, count(*) AS cnt,
                CAST(sum(CASE WHEN o_totalprice > 150000.0 THEN 1 ELSE 0 END) AS BIGINT) AS big_orders
         FROM orders GROUP BY o_orderpriority
         HAVING count(*) >= 100 ORDER BY o_orderpriority""",

    "q_sessionize" ->
      """WITH e AS (
           SELECT user_id, epoch_ns(ts) AS tsn,
                  lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
           FROM events),
         f AS (
           SELECT user_id, tsn,
                  CASE WHEN prev_ts IS NULL OR tsn - prev_ts > 1800000000000 THEN 1 ELSE 0 END AS new_sess
           FROM e),
         g AS (
           SELECT user_id,
                  sum(new_sess) OVER (PARTITION BY user_id ORDER BY tsn
                                      ROWS UNBOUNDED PRECEDING) AS sess_id
           FROM f)
         SELECT user_id, CAST(max(sess_id) AS BIGINT) AS n_sessions,
                count(*) AS n_events
         FROM g GROUP BY user_id ORDER BY user_id""",
  )
}
