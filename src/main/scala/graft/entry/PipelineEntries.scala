package graft.entry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft.F
import graft.SparkEntry._
import graft.api.SearchApi
import graft.operators.{Dedup, Documents, HnswIndex, IvfIndex, Knn, KnnJoin, Multimodal, Packing, PqIndex, Sampling, Skew, TextOps, VearchFilters}
import graft.schema.Space

/** training-data pipeline queries: dedup family, text analysis, quality model, BPE, packing, sampling, multimodal.
  *
  * Split from SparkEntry (round 18) purely mechanically — same entries,
  * same helper surface (imported from [[graft.SparkEntry]]), no behavior
  * change. Declared-query docs and reference citations live on the
  * entries themselves.
  */
private[graft] object PipelineEntries {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── pipeline: exact dedup by content hash ──
    "q_dedup_exact" -> ((s, dir) => {
      init(s)
      Dedup.exact(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("content_hash"))
    }),

    // ── pipeline: EXACT-SUBSTRING duplication signals (Lee et al.
    //    ACL'22, shuffle-native): w-token sliding windows, corpus-wide
    //    occurrence count, per-doc duplicated-window count + token
    //    coverage — catches a boilerplate paragraph shared by otherwise
    //    unrelated docs, which whole-doc jaccard misses ──
    "q_window_dedup" -> ((s, dir) => {
      init(s)
      Dedup.windowDupSignals(t(s, dir, "documents"), "doc_id", "text", w = 10)
        .orderBy(col("doc_id"))
    }),

    // ── pipeline: substring-dedup REMOVAL (keep global first occurrence,
    //    cut every later duplicated-window placement, rebuild the text) ──
    "q_dedup_strip" -> ((s, dir) => {
      init(s)
      Dedup.stripDupWindows(t(s, dir, "documents"), "doc_id", "text", w = 10)
        .orderBy(col("doc_id"))
    }),

    // ── pipeline: training-sequence packing (concat-and-chunk) via a
    //    DISTRIBUTED prefix sum — range partition → local cumsum →
    //    per-partition totals (≤ numParts rows) broadcast back; the
    //    oracle's single ORDER BY window proves the multi-partition
    //    (numParts = 8) path exact ──
    "q_pack_sequences" -> ((s, dir) => {
      init(s)
      val docs = t(s, dir, "documents")
        .select(col("doc_id"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
      Packing.packAssignments(docs, "doc_id", "n_tokens",
          seqLen = 512, numParts = 8)
        .orderBy(col("doc_id"))
    }),

    // ── pipeline: the loader-ready packing MANIFEST — each doc's span
    //    cut at sequence boundaries, one row per (sequence, doc) slice ──
    "q_pack_manifest" -> ((s, dir) => {
      init(s)
      val docs = t(s, dir, "documents")
        .select(col("doc_id"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
      Packing.packManifest(docs, "doc_id", "n_tokens",
          seqLen = 512, numParts = 8)
        .orderBy(col("seq_id"), col("doc_id"))
    }),

    // ── pipeline: EXACT n-gram Jaccard similarity join (inverted index) ──
    "q_dedup_jaccard" -> ((s, dir) => {
      init(s)
      Dedup.jaccardPairs(t(s, dir, "documents"), "doc_id", "text", n = 3, threshold = 0.8)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ── pipeline: PII detection + redaction — the fixture has no natural
    //    PII, so deterministic synthetic spans (email/phone/IP derived
    //    from doc_id) are injected into every 10th doc IDENTICALLY here
    //    and in the oracle, then detected and redacted; pure map-side
    //    regex expressions ──
    "q_pii" -> ((s, dir) => {
      init(s)
      val injected = when(pmod(col("doc_id"), lit(10)) === 0,
        concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"), lit("@example.com"),
          lit(" or call 555-01"),
          lpad(pmod(col("doc_id"), lit(100)).cast("string"), 2, "0"),
          lit(" from 192.168."), pmod(col("doc_id"), lit(256)).cast("string"), lit(".7")))
        .otherwise(col("text"))
      t(s, dir, "documents")
        .select(col("doc_id"), TextOps.piiSignals(injected).as("_p"),
          TextOps.redactPii(injected).as("redacted"))
        .select(col("doc_id"),
          col("_p.n_emails").cast("long").as("n_emails"),
          col("_p.n_ips").cast("long").as("n_ips"),
          col("_p.n_phones").cast("long").as("n_phones"),
          col("redacted"))
        .orderBy(col("doc_id"))
    }),

    // ── pipeline: near-CONTAINMENT pairs (overlap/min ≥ t) — doc-inside-
    //    doc near-dup that symmetric jaccard misses; smaller-prefix ×
    //    full-relation equi-join, exact verify ──
    "q_dedup_containment" -> ((s, dir) => {
      init(s)
      Dedup.containmentPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, threshold = 0.8)
        .select(col("id_a"), col("id_b"),
          round(col("containment"), 4).as("containment"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ── pipeline: token counting ──
    "q_token_count" -> ((s, dir) => {
      init(s)
      val d = t(s, dir, "documents")
      d.select(col("doc_id"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("len_chars"))
        .orderBy(col("doc_id"))
    }),

    // ── pipeline: quality scoring ──
    "q_text_quality" -> ((s, dir) => {
      init(s)
      val q = TextOps.qualityFeatures(col("text"), TextOps.EnStopwords)
      t(s, dir, "documents")
        .select(col("doc_id"), q.as("q"))
        .select(col("doc_id"),
          col("q.n_tokens").cast("long").as("n_tokens"),
          round(col("q.avg_token_len"), 4).as("avg_token_len"),
          round(col("q.stopword_ratio"), 4).as("stopword_ratio"),
          round(col("q.punct_ratio"), 4).as("punct_ratio"))
        .orderBy(col("doc_id"))
    }),

    // ── pipeline: language distribution ──
    "q_lang_count" -> ((s, dir) => {
      init(s)
      t(s, dir, "documents").groupBy(col("lang"))
        .agg(count(lit(1)).as("cnt")).orderBy(col("lang"))
    }),

    // ── pipeline: n-gram-heuristic language ID per document ──
    "q_lang_id" -> ((s, dir) => {
      init(s)
      t(s, dir, "documents")
        .select(col("doc_id"), TextOps.langId(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))
    }),

    // ── pipeline: MinHash-LSH near-dup, exact-verified. At 8 bands × 2
    //    rows, P(miss | j=0.8) = (1-0.8²)⁸ ≈ 3e-4 and the banding is
    //    seeded/deterministic, so the output equals the exact jaccard
    //    pairs and shares their oracle ──
    "q_minhash_lsh" -> ((s, dir) => {
      init(s)
      Dedup.minhashLshPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, numHashes = 16, bands = 8, threshold = 0.8)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ── pipeline: SimHash near-dup (hamming ≤ 3), portable md5 hashing so
    //    the DuckDB oracle recomputes the identical fingerprint ──
    "q_simhash_pairs" -> ((s, dir) => {
      init(s)
      Dedup.simhashPairsPortable(t(s, dir, "documents"), "doc_id", "text", maxHamming = 3)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ── pipeline: full text profile (tokens, subwords, lang-id,
    //    fingerprint) — every column portable, fully oracle-checked ──
    "q_text_profile" -> ((s, dir) => {
      init(s)
      TextOps.profile(t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"),
          col("n_tokens").cast("long").as("n_tokens"),
          col("n_subwords").cast("long").as("n_subwords"),
          col("lang_pred"), col("fingerprint"))
        .orderBy(col("doc_id"))
    }),

    // ── multimodal (oracle-checked): REAL decode of the stored media
    //    corpus → typed metadata. The synthesizer's parameters are pure
    //    functions of media_id, so DuckDB re-derives every decoded value
    //    analytically — decode correctness gets a true oracle ──
    "q_media_metadata" -> ((s, dir) => {
      init(s)
      val media = graft.sources.IndexStore.media(s, dir)
      val imgs = Multimodal.decodeImages(media).toDF()
        .select(col("media_id"), col("width"), col("height"), col("channels"))
      val auds = Multimodal.decodeAudio(media).toDF()
        .select(col("media_id"), col("sample_rate"),
          col("n_frames").cast("long").as("n_frames"))
      media.select(col("media_id"), col("media_type"))
        .join(imgs, Seq("media_id"))
        .join(auds, Seq("media_id"))
        .select(col("media_id"), col("media_type"), col("width"),
          col("height"), col("channels"), col("sample_rate"), col("n_frames"))
        .orderBy(col("media_id"))
    }),

    // ── multimodal (rows-only): stored media corpus → real decode →
    //    color-histogram features → KNN. Reads the build-once fixture, so
    //    the timed work is decode+features+search, not PNG encoding ──
    "q_media_pipeline" -> ((s, dir) => {
      init(s)
      val media = graft.sources.IndexStore.media(s, dir)
      // REAL decode: the fixture holds true PNG/WAV payloads, so image rows
      // carry genuine dims + decoded-pixel checksums and audio rows genuine
      // rates — the fallback fingerprint only covers the declared video stub
      val feats = Multimodal.extractFeatures(media, dim = 16).toDF()
        .select(col("media_id"), col("feature").cast("array<float>").as("feature"))
      // the query feature is computed DRIVER-side from the request payload
      // (the real API shape: a query image arrives as bytes with the
      // request) — the only Spark work before the scan is a one-row
      // pushdown fetch of those bytes
      val qBytes = media.filter(col("media_id") === 0)
        .select(col("payload")).head().getAs[Array[Byte]](0)
      val q = Multimodal.featureOf(qBytes, 16).toSeq
      // k-bounded collect (k = 10, the request's topk — same contract as
      // the req_num query pickups): one full-corpus decode+topk pass, and
      // checksum-decode touches ONLY the k survivors, as an id filter
      // pushed down to the payload table's parquet scan. Re-using the
      // lazy top-k frame on both sides of the join would recompute the
      // corpus decode twice.
      import s.implicits._
      val top = Knn.search(feats, col("feature"), q, 10, "cosine",
        tieBreak = Some(col("media_id")), roundTo = Some(4))
        .select(col("media_id"), col("_score").as("score")).collect()
      val topDf = top.map(r => (r.getLong(0), r.getDouble(1))).toSeq
        .toDF("media_id", "score")
      val surv = media.filter(col("media_id").isin(top.map(_.getLong(0)): _*))
      val imgs = Multimodal.decodeImages(surv).toDF()
        .select(col("media_id"), col("width"), col("height"), col("pixel_checksum"))
      val auds = Multimodal.decodeAudio(surv).toDF()
        .select(col("media_id"), col("sample_rate"), col("n_frames"))
      topDf.join(imgs, Seq("media_id"))
        .join(auds, Seq("media_id"))
        .select(col("media_id"), col("score"),
          col("width"), col("height"), col("pixel_checksum"),
          col("sample_rate"), col("n_frames"))
        .orderBy(col("score").desc, col("media_id"))
    }),

    // ── pipeline: near-dup CLUSTERING — exact jaccard pairs → connected
    //    components (min-label propagation) → canonical survivor flag.
    //    Answers "which copies form one group" when duplicates chain
    //    A~B~C without A~C qualifying directly ──
    "q_dedup_clusters" -> ((s, dir) => {
      init(s)
      val docs = t(s, dir, "documents")
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.8)
      val cl = Dedup.clusters(docs, "doc_id", pairs)
      // clusters' own checkpoint has materialized by now and truncates
      // lineage, so the final-frame free can't reach the pairs blocks —
      // release them here (consume-then-free contract, as in Stress)
      graft.operators.Checkpoints.free(pairs)
      cl.select(col("id").as("doc_id"), col("cluster_id"),
          col("is_canonical").cast("int").as("is_canonical"))
        .orderBy(col("doc_id"))
    }),

    // ── pipeline: deterministic hash sample — content-keyed membership,
    //    map-side only (re-runs and stage retries pick identical rows) ──
    // ── pipeline: keep-best dedup — the canonical flow (near-dup
    //    clusters → one surviving representative per cluster, here the
    //    LONGEST doc, ties by min id) composed from jaccardPairs +
    //    clusters + a per-cluster window ──
    "q_dedup_keep_best" -> ((s, dir) => {
      init(s)
      val docs = t(s, dir, "documents")
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.8)
      val cl = Dedup.clusters(docs, "doc_id", pairs)
      // same consume-then-free as q_dedup_clusters: clusters has already
      // materialized its checkpoint, pairs blocks are otherwise orphaned
      graft.operators.Checkpoints.free(pairs)
      // keep pick = min(struct(-len, id)) inside a cluster-keyed aggregate
      // (longest doc, ties to min id) — map-side combinable, shuffles one
      // row per cluster per task where a row_number window shuffles and
      // sorts the whole labeled corpus (semanticDedup's keep uses the
      // same shape)
      cl.join(docs.select(col("doc_id").as("id"), col("n_chars")), "id")
        .groupBy(col("cluster_id"))
        .agg(min(struct((-col("n_chars")).as("_neg"), col("id").as("_id"))).as("_k"))
        .select(col("cluster_id"), col("_k._id").as("keep_id"),
          (-col("_k._neg")).as("n_chars"))
        .orderBy(col("cluster_id"))
    }),

    "q_sample_hash" -> ((s, dir) => {
      init(s)
      Sampling.hashSample(t(s, dir, "documents"), col("doc_id"), 0.3)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // ── pipeline: stratified cap — every lang stratum capped at 20 rows
    //    chosen by key hash (the class-balancing step of a data recipe) ──
    "q_sample_stratified" -> ((s, dir) => {
      init(s)
      Sampling.stratifiedCap(t(s, dir, "documents"), col("lang"), col("doc_id"),
        cap = 20)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // ── pipeline: temperature (α=0.5) re-sampling across languages —
    //    mT5-style exponentiated-share rebalancing; per-group rate
    //    derived from corpus counts, membership the same portable
    //    md5-uniform the oracle re-derives ──
    "q_sample_temperature" -> ((s, dir) => {
      init(s)
      Sampling.temperatureSample(t(s, dir, "documents"), col("lang"),
          col("doc_id"), alpha = 0.5, targetFrac = 0.3)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // ── pipeline: SemDeDup — cluster the embedding space, connect
    //    within-cluster near-dups, keep the least-centroid-similar
    //    member per component. DETERMINISTIC centroid seed (the
    //    oracle-able operating point): the first 16 embeddings ARE the
    //    centroids and assignment is IvfIndex.assign's argmin-L2
    //    quantizer — closed-form in SQL, so the whole survivor rule
    //    (within-list cosine pairs → components → least-centroid-sim
    //    keep) is hash-checked end-to-end. The KMeans-trained twin of
    //    the same semanticDedupPrebuilt path rides DedupSpec and the
    //    q_embed_neardup family ──
    "q_semantic_dedup" -> ((s, dir) => {
      init(s)
      val emb = t(s, dir, "embeddings")
      val cents = emb.filter(col("vec_id") < 16).orderBy("vec_id")
        .select("embedding").collect().map(_.getSeq[Float](0).toArray)
      val model = IvfIndex.Model(cents, "cosine")
      Dedup.semanticDedupPrebuilt(emb,
          IvfIndex.assign(emb, "embedding", model), model,
          "vec_id", "embedding", threshold = 0.4)
        .withColumn("centroid_sim", round(col("centroid_sim"), 4))
        .orderBy(col("id"))
    }),

    // ── pipeline: BPE trainer stage 1 — weighted adjacent char-pair
    //    counts over the DISTINCT-word relation (the corpus-sized pass
    //    happens once; merge rounds run on vocab-sized data). ASCII
    //    fixture text keeps Spark's code-unit chars == DuckDB's
    //    codepoint substr ──
    "q_bpe_pairs" -> ((s, dir) => {
      init(s)
      graft.operators.Bpe.pairCounts(
          graft.operators.Bpe.vocab(t(s, dir, "documents"), "text"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(20)
    }),

    // ── pipeline: the learned merge list itself (30 rounds). The
    //    iterative argmax IS oracle-checked: a DuckDB recursive CTE
    //    carries the whole vocab as one list-typed row (words encoded
    //    with symbol markers so string replace() is exactly the greedy
    //    leftmost non-overlapping merge fold) and replays every round's
    //    (max count, lexicographic tie-break) pick ──
    "q_bpe_merges" -> ((s, dir) => {
      init(s)
      val (merges, vocab) = graft.operators.Bpe.train(
        t(s, dir, "documents"), "text", numMerges = 30, minFreq = 2)
      graft.operators.Checkpoints.free(vocab)
      import s.implicits._
      merges.zipWithIndex
        .map { case ((a, b), r) => (r.toLong, a, b, a + b) }
        .toDF("rank", "a", "b", "merged")
        .orderBy(col("rank"))
    }),

    // ── pipeline: model-based quality filter (CCNet bootstrap: weak
    //    labels from the heuristic tails → hashed-BoW logistic model →
    //    score the corpus). ROWS-ONLY: L-BFGS coefficients aren't
    //    DuckDB-re-derivable; the heuristic feature space itself is
    //    oracle-checked by q_text_quality, and QualityModelSpec pins
    //    separation + the map-side scoring plan ──
    "q_quality_model" -> ((s, dir) => {
      init(s)
      val docs = t(s, dir, "documents")
      val lab = graft.operators.QualityModel.weakLabels(docs, "text")
      val model = graft.operators.QualityModel.train(lab, "text", "label",
        logFeatures = 12)
      graft.operators.QualityModel.score(docs, model, "text")
        .groupBy(floor(col("quality_prob") * 10).cast("int").as("band"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("band"))
    }),

    // ── pipeline: per-language quality quantiles (threshold picking for a
    //    filtering recipe); exact percentile shares DuckDB quantile_cont's
    //    p·(n−1) linear interpolation, so values oracle-check ──
    "q_quality_quantiles" -> ((s, dir) => {
      init(s)
      TextOps.qualityQuantiles(t(s, dir, "documents"), col("lang"),
        length(col("text")), Seq(0.5, 0.9, 0.99))
        .orderBy(col("lang"))
    }),

    // ── pipeline: cross-document shingle novelty (boilerplate /
    //    contamination fraction) — explode → df-count → re-join, both
    //    shuffles keyed on the shingle ──
    "q_shingle_novelty" -> ((s, dir) => {
      init(s)
      TextOps.shingleNovelty(t(s, dir, "documents"), "doc_id", "text", n = 3)
        .select(col("id").as("doc_id"),
          col("n_shingles"), col("n_shared"),
          round(col("shared_frac"), 4).as("shared_frac"))
        .orderBy(col("doc_id"))
    }),

    // ── pipeline: benchmark decontamination — corpus docs sharing any
    //    3-gram with a (deterministic) held-out benchmark subset; the
    //    benchmark's distinct shingle hashes broadcast, corpus probe is
    //    map-side ──
    "q_decontaminate" -> ((s, dir) => {
      init(s)
      val docs = t(s, dir, "documents")
      TextOps.decontaminate(
        docs.filter(col("doc_id") % 20 =!= 0), "doc_id", "text",
        docs.filter(col("doc_id") % 20 === 0), "text", n = 3)
        .select(col("id").as("doc_id"), col("n_shingles"),
          col("n_contaminated"), col("is_contaminated"))
        .orderBy(col("doc_id"))
    }),

    // ── pipeline: unicode normalization (NFC + accent strip + lowercase
    //    + whitespace collapse) — custom codegen'd expression, DuckDB
    //    recomputes the identical string ──
    "q_text_normalize" -> ((s, dir) => {
      init(s)
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextOps.normalize(col("text")).as("norm_text"),
          length(TextOps.normalize(col("text"))).cast("long").as("norm_len"))
        .orderBy(col("doc_id"))
    }),

    // ── pipeline: weighted data mix — per-source deterministic hash
    //    sampling, map-side membership only ──
    "q_sample_mix" -> ((s, dir) => {
      init(s)
      val docs = t(s, dir, "documents")
      Sampling.mix(Seq(
        (docs.filter(col("lang") === "en"), 0.4),
        (docs.filter(col("lang") =!= "en"), 0.1)), "doc_id")
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),
  )

  def oracles: Map[String, String] = Map(

    "q_dedup_clusters" -> dedupClustersSql,
    "q_dedup_keep_best" -> dedupKeepBestSql,

    "q_sample_hash" ->
      s"""SELECT doc_id, lang FROM documents
         WHERE ${portableUniformSql("doc_id::VARCHAR")} < 0.3
         ORDER BY doc_id""",

    "q_sample_stratified" ->
      s"""WITH h AS (SELECT doc_id, lang,
                ${portableUniformSql("doc_id::VARCHAR")} AS u
              FROM documents),
         r AS (SELECT doc_id, lang,
                row_number() OVER (PARTITION BY lang ORDER BY u, doc_id) AS rn
              FROM h)
         SELECT doc_id, lang FROM r WHERE rn <= 20
         ORDER BY doc_id""",

    // char pairs weighted by word frequency; ASCII fixture makes
    // code-unit and codepoint segmentation coincide
    "q_bpe_pairs" ->
      """WITH t AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
                    FROM documents),
         f AS (SELECT w, count(*) AS freq FROM t
               WHERE len(w) >= 2 GROUP BY w),
         e AS (SELECT w, freq, unnest(range(1, len(w))) AS i FROM f),
         p AS (SELECT substr(w, i::INT, 1) AS a, substr(w, (i+1)::INT, 1) AS b,
                      freq
               FROM e)
         SELECT a, b, sum(freq)::BIGINT AS cnt FROM p GROUP BY a, b
         ORDER BY cnt DESC, a, b LIMIT 20""",

    // the 30-round greedy merge loop replayed in SQL: state is ONE row
    // carrying the vocab as a list of (encoded word, freq) structs —
    // each symbol wrapped in chr(31)/chr(30) markers, so replace() of
    // the marked pair is exactly Bpe.train's leftmost non-overlapping
    // merge fold — plus the accumulated merge list. Each round's argmax
    // (max weighted count, ties to the lexicographically smallest pair,
    // minFreq 2) comes from a scalar subquery grouping the unnested
    // adjacent pairs. Terminates on numMerges or no eligible pair, like
    // the trainer.
    "q_bpe_merges" ->
      """WITH RECURSIVE
         v0 AS (SELECT w, count(*)::BIGINT AS freq
                FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
                      FROM documents)
                WHERE len(w) >= 1 GROUP BY w),
         it AS (
           SELECT 0 AS r,
                  (SELECT list({'e': regexp_replace(w, '(.)',
                                  chr(31) || '\1' || chr(30), 'g'),
                                'f': freq}) FROM v0) AS words,
                  []::STRUCT(a VARCHAR, b VARCHAR)[] AS merges
           UNION ALL
           SELECT r + 1,
                  list_transform(words, w -> {
                    'e': replace(w['e'],
                           chr(31) || best['a'] || chr(30) ||
                             chr(31) || best['b'] || chr(30),
                           chr(31) || best['a'] || best['b'] || chr(30)),
                    'f': w['f']}),
                  list_append(merges, best)
           FROM (
             SELECT r, words, merges,
               (SELECT {'a': a, 'b': b} FROM (
                  SELECT p['a'] AS a, p['b'] AS b, sum(p['f']) AS cnt
                  FROM (SELECT unnest(flatten(list_transform(words, w ->
                          list_transform(
                            range(1, len(string_split(
                              trim(w['e'], chr(31) || chr(30)),
                              chr(30) || chr(31)))),
                            i -> {'a': string_split(
                                    trim(w['e'], chr(31) || chr(30)),
                                    chr(30) || chr(31))[i],
                                  'b': string_split(
                                    trim(w['e'], chr(31) || chr(30)),
                                    chr(30) || chr(31))[i+1],
                                  'f': w['f']})))) AS p)
                  GROUP BY 1, 2 HAVING sum(p['f']) >= 2
                  ORDER BY cnt DESC, a, b LIMIT 1)) AS best
             FROM it) t
           WHERE r < 30 AND best IS NOT NULL
         )
         SELECT (i - 1)::BIGINT AS rank, m[i]['a'] AS a, m[i]['b'] AS b,
                m[i]['a'] || m[i]['b'] AS merged
         FROM (SELECT m, unnest(generate_series(1, len(m))) AS i
               FROM (SELECT merges AS m FROM it ORDER BY r DESC LIMIT 1))
         ORDER BY rank""",

    // deterministic-seed SemDeDup: centroids = embeddings of vec_id<16,
    // assignment = argmin L2 (the IvfAssign quantizer), within-list
    // cosine pairs at >= 0.4, components via the reachability closure,
    // keep = least (centroid_sim, id) per cluster
    "q_semantic_dedup" ->
      """WITH RECURSIVE
         cent AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
                  FROM embeddings WHERE vec_id < 16),
         asg AS (SELECT id, v, cid AS list_id FROM (
                   SELECT e.vec_id AS id, e.embedding::DOUBLE[] AS v, c.cid,
                          row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY list_distance(e.embedding::DOUBLE[], c.cv),
                                     c.cid) AS rn
                   FROM embeddings e, cent c)
                 WHERE rn = 1),
         sim AS (SELECT a.id, a.v, a.list_id,
                        list_cosine_similarity(a.v, c.cv) AS centroid_sim
                 FROM asg a JOIN cent c ON c.cid = a.list_id),
         p AS (SELECT x.id AS id_a, y.id AS id_b
               FROM asg x JOIN asg y
                 ON x.list_id = y.list_id AND x.id < y.id
               WHERE list_cosine_similarity(x.v, y.v) >= 0.4),
         edges AS (SELECT id_a AS u, id_b AS v FROM p
                   UNION SELECT id_b, id_a FROM p),
         reach AS (SELECT u, v FROM edges
                   UNION SELECT r.u, e2.v FROM reach r JOIN edges e2 ON r.v = e2.u),
         lbl AS (SELECT u AS id, least(u, min(v)) AS cl FROM reach GROUP BY u),
         cl AS (SELECT s.id, s.list_id, coalesce(l.cl, s.id) AS cluster_id,
                       s.centroid_sim
                FROM sim s LEFT JOIN lbl l ON l.id = s.id),
         k AS (SELECT *, row_number() OVER (PARTITION BY cluster_id
                 ORDER BY centroid_sim, id) AS rn FROM cl)
         SELECT id, list_id::INT AS list_id, cluster_id,
                round(centroid_sim, 4) AS centroid_sim,
                (rn = 1) AS is_kept
         FROM k ORDER BY id""",

    // same exponentiated-share rate derivation; the N^α factors cancel in
    // p_g = n^α/Σn^α, and membership is the shared md5 uniform
    "q_sample_temperature" ->
      s"""WITH c AS (SELECT lang, count(*)::DOUBLE AS n FROM documents GROUP BY lang),
         r AS (SELECT lang,
                      least(1.0, 0.3 * (SELECT sum(n) FROM c)
                                 * (pow(n, 0.5) / (SELECT sum(pow(n, 0.5)) FROM c))
                                 / n) AS rate
               FROM c)
         SELECT d.doc_id, d.lang FROM documents d JOIN r USING (lang)
         WHERE ${portableUniformSql("d.doc_id::VARCHAR")} < r.rate
         ORDER BY d.doc_id""",

    "q_quality_quantiles" ->
      """WITH t AS (SELECT lang, length(text) AS n FROM documents)
         SELECT lang, count(*) AS cnt,
                round(quantile_cont(n::DOUBLE, 0.5), 4) AS p50,
                round(quantile_cont(n::DOUBLE, 0.9), 4) AS p90,
                round(quantile_cont(n::DOUBLE, 0.99), 4) AS p99
         FROM t GROUP BY lang ORDER BY lang""",

    "q_shingle_novelty" ->
      """WITH t AS (SELECT doc_id,
              -- canonical tokenizer twin (TextOps.tokens): trim +
              -- \s+ split, empty text = ZERO tokens — DuckDB's
              -- split would mint phantom ''-tokens on empty text,
              -- doubled spaces, or tabs
              CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                   ELSE string_split_regex(trim(text), '\s+') END AS w
       FROM documents),
         sh AS (SELECT doc_id,
                       CASE WHEN len(w) >= 3
                            THEN list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                                FOR i IN range(1, len(w) - 1)])
                            ELSE [array_to_string(w, ' ')] END AS s
                FROM t),
         e AS (SELECT doc_id, unnest(s) AS sh1 FROM sh),
         d AS (SELECT sh1, count(*) AS df FROM e GROUP BY sh1)
         SELECT e.doc_id, count(*) AS n_shingles,
                count(*) FILTER (WHERE d.df >= 2) AS n_shared,
                round(count(*) FILTER (WHERE d.df >= 2)::DOUBLE / count(*), 4)
                  AS shared_frac
         FROM e JOIN d USING (sh1)
         GROUP BY e.doc_id ORDER BY e.doc_id""",

    // same string-shingle derivation as the jaccard oracle; the Spark side
    // joins on kernel hashes — counts agree modulo 64-bit collisions
    "q_decontaminate" ->
      """WITH t AS (SELECT doc_id,
              -- canonical tokenizer twin (TextOps.tokens): trim +
              -- \s+ split, empty text = ZERO tokens — DuckDB's
              -- split would mint phantom ''-tokens on empty text,
              -- doubled spaces, or tabs
              CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                   ELSE string_split_regex(trim(text), '\s+') END AS w
       FROM documents),
         sh AS (SELECT doc_id,
                       CASE WHEN len(w) >= 3
                            THEN list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                                FOR i IN range(1, len(w) - 1)])
                            ELSE [array_to_string(w, ' ')] END AS s
                FROM t),
         c AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 20 <> 0),
         b AS (SELECT DISTINCT g FROM
                 (SELECT unnest(s) AS g FROM sh WHERE doc_id % 20 = 0)),
         hits AS (SELECT c.doc_id, count(*) AS n_contaminated
                  FROM c JOIN b USING (g) GROUP BY c.doc_id),
         tot AS (SELECT doc_id, len(s) AS n_shingles FROM sh
                 WHERE doc_id % 20 <> 0)
         SELECT tot.doc_id, tot.n_shingles,
                coalesce(hits.n_contaminated, 0) AS n_contaminated,
                CAST(coalesce(hits.n_contaminated, 0) > 0 AS INT)
                  AS is_contaminated
         FROM tot LEFT JOIN hits USING (doc_id) ORDER BY tot.doc_id""",

    "q_text_normalize" ->
      """WITH n AS (SELECT doc_id,
                trim(regexp_replace(lower(strip_accents(nfc_normalize(text))),
                     '\s+', ' ', 'g')) AS norm_text
         FROM documents)
         SELECT doc_id, norm_text, length(norm_text) AS norm_len
         FROM n ORDER BY doc_id""",

    // the two branches partition the table, so the mix is one filtered
    // scan with a per-branch uniform threshold
    "q_sample_mix" ->
      s"""SELECT doc_id, lang FROM documents
         WHERE (lang = 'en' AND ${portableUniformSql("doc_id::VARCHAR")} < 0.4)
            OR (lang <> 'en' AND ${portableUniformSql("doc_id::VARCHAR")} < 0.1)
         ORDER BY doc_id""",
    "q_minhash_lsh" -> jaccardPairsSql,

    "q_simhash_pairs" ->
      """WITH t AS (SELECT doc_id,
             list_transform(list_filter(string_split_regex(text, '\s+'),
                                        x -> length(x) > 0),
                            x -> md5(x)) AS hs
           FROM documents),
         sig AS (SELECT doc_id,
             [CASE WHEN coalesce(list_sum(
                 [CASE WHEN ((strpos('0123456789abcdef',
                                     substr(hx, 15 - (b//4), 1)) - 1)
                             >> (b%4)) & 1 = 1
                       THEN 1 ELSE -1 END FOR hx IN hs]), 0) > 0
                   THEN 1 ELSE 0 END
              FOR b IN range(60)] AS s
           FROM t)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                CAST(len(list_filter(range(60), i -> a.s[i+1] <> b.s[i+1])) AS BIGINT) AS hamming
         FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         WHERE len(list_filter(range(60), i -> a.s[i+1] <> b.s[i+1])) <= 3
         ORDER BY id_a, id_b""",

    "q_dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
                count(*) AS dup_cnt
         FROM documents GROUP BY md5(text) ORDER BY content_hash""",

    "q_dedup_jaccard" -> jaccardPairsSql,

    // same window derivation content-wise: the Spark side keys windows by
    // the 64-bit positional hash kernel, the oracle by the raw window
    // string — counts agree absent a 64-bit collision (~1e-11 at this
    // corpus). Parallel unnests zip positionally in DuckDB, pairing each
    // window with its 1-based start.
    "q_window_dedup" ->
      """WITH t AS (SELECT doc_id,
              -- canonical tokenizer twin (TextOps.tokens): trim +
              -- \s+ split, empty text = ZERO tokens — DuckDB's
              -- split would mint phantom ''-tokens on empty text,
              -- doubled spaces, or tabs
              CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                   ELSE string_split_regex(trim(text), '\s+') END AS w
       FROM documents),
         b AS (SELECT doc_id, len(w) AS n, greatest(len(w) - 9, 1) AS nw,
                      CASE WHEN len(w) >= 10
                           THEN [array_to_string(w[i:i+9], ' ')
                                 FOR i IN range(1, len(w) - 8)]
                           ELSE [array_to_string(w, ' ')] END AS wins
               FROM t),
         e AS (SELECT doc_id, n, unnest(wins) AS win,
                      unnest(range(1, nw + 1)) AS st
               FROM b),
         occ AS (SELECT win, count(*) AS occ FROM e GROUP BY win),
         dup AS (SELECT e.doc_id, e.n, e.st
                 FROM e JOIN occ USING (win) WHERE occ.occ >= 2),
         dupc AS (SELECT doc_id, count(*) AS dup_windows FROM dup GROUP BY doc_id),
         cov AS (SELECT doc_id, count(DISTINCT p) AS dup_tokens
                 FROM (SELECT doc_id, unnest(range(st, least(st + 10, n + 1))) AS p
                       FROM dup)
                 GROUP BY doc_id)
         SELECT b.doc_id, b.n AS n_tokens, b.nw AS n_windows,
                coalesce(dupc.dup_windows, 0) AS dup_windows,
                coalesce(cov.dup_tokens, 0) AS dup_tokens
         FROM b LEFT JOIN dupc USING (doc_id) LEFT JOIN cov USING (doc_id)
         ORDER BY b.doc_id""",

    // same window derivation; canonical first occurrence = row_number 1
    // over (doc_id, start) — matches Spark's min(struct(doc_id, start))
    "q_dedup_strip" ->
      """WITH t AS (SELECT doc_id,
              -- canonical tokenizer twin (TextOps.tokens): trim +
              -- \s+ split, empty text = ZERO tokens — DuckDB's
              -- split would mint phantom ''-tokens on empty text,
              -- doubled spaces, or tabs
              CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                   ELSE string_split_regex(trim(text), '\s+') END AS w
       FROM documents),
         b AS (SELECT doc_id, w, len(w) AS n, greatest(len(w) - 9, 1) AS nw,
                      CASE WHEN len(w) >= 10
                           THEN [array_to_string(w[i:i+9], ' ')
                                 FOR i IN range(1, len(w) - 8)]
                           ELSE [array_to_string(w, ' ')] END AS wins
               FROM t),
         e AS (SELECT doc_id, n, unnest(wins) AS win,
                      unnest(range(1, nw + 1)) AS st
               FROM b),
         r AS (SELECT doc_id, n, st,
                      count(*) OVER (PARTITION BY win) AS occ,
                      row_number() OVER (PARTITION BY win
                                         ORDER BY doc_id, st) AS rn
               FROM e),
         cut AS (SELECT doc_id, n, st FROM r WHERE occ >= 2 AND rn > 1),
         cov AS (SELECT doc_id, list(DISTINCT p) AS cov
                 FROM (SELECT doc_id, unnest(range(st, least(st + 10, n + 1))) AS p
                       FROM cut WHERE n >= 1)
                 GROUP BY doc_id)
         SELECT b.doc_id, b.n AS n_tokens,
                coalesce(len(cov.cov), 0)::BIGINT AS removed_tokens,
                -- coalesce: a fully-wiped doc's empty list renders NULL in
                -- DuckDB, '' in Spark's concat_ws
                coalesce(array_to_string(
                  [b.w[i] FOR i IN range(1, b.n + 1)
                   IF cov.cov IS NULL OR NOT list_contains(cov.cov, i)],
                  ' '), '') AS text_clean
         FROM b LEFT JOIN cov USING (doc_id)
         ORDER BY b.doc_id""",

    // single ORDER BY window — the oracle for the distributed
    // (range-partition + local cumsum + broadcast prefix) formulation
    "q_pack_sequences" ->
      """WITH t AS (SELECT doc_id,
                           -- empty/whitespace text is 0 tokens (DuckDB's
                           -- split of '' yields [''] = phantom token)
                           CASE WHEN trim(text) = '' THEN 0
                                ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens
                    FROM documents),
         c AS (SELECT doc_id, n_tokens,
                      -- ::BIGINT: DuckDB widens window sums to HUGEINT
                      coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS start_offset
               FROM t)
         SELECT doc_id, n_tokens, start_offset,
                start_offset // 512 AS seq_id,
                CASE WHEN n_tokens = 0 THEN start_offset // 512
                     ELSE (start_offset + n_tokens - 1) // 512 END AS end_seq,
                CASE WHEN n_tokens = 0 THEN 0
                     ELSE (start_offset + n_tokens - 1) // 512
                            - start_offset // 512 + 1 END AS n_seqs
         FROM c ORDER BY doc_id""",

    // the manifest explodes each doc over its sequence range with
    // boundary-clipped spans — identical arithmetic to the Spark side
    "q_pack_manifest" ->
      """WITH t AS (SELECT doc_id,
                           CASE WHEN trim(text) = '' THEN 0
                                ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens
                    FROM documents),
         c AS (SELECT doc_id, n_tokens,
                      coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS start_offset
               FROM t),
         m AS (SELECT doc_id, n_tokens, start_offset,
                      unnest(range(start_offset // 512,
                                   (start_offset + n_tokens - 1) // 512 + 1)) AS seq_id
               FROM c WHERE n_tokens > 0)
         SELECT seq_id, doc_id,
                greatest(start_offset, seq_id * 512) - start_offset + 1 AS doc_from,
                least(start_offset + n_tokens, (seq_id + 1) * 512) - start_offset AS doc_to,
                greatest(start_offset, seq_id * 512) - seq_id * 512 + 1 AS seq_from,
                least(start_offset + n_tokens, (seq_id + 1) * 512) - seq_id * 512 AS seq_to,
                least(start_offset + n_tokens, (seq_id + 1) * 512)
                  - greatest(start_offset, seq_id * 512) AS slice_tokens
         FROM m ORDER BY seq_id, doc_id""",

    // identical synthetic-PII injection, then RE2 equivalents of the Java
    // patterns (restricted to the shared-dialect subset) in the same
    // redaction order
    "q_pii" ->
      """WITH d AS (
           SELECT doc_id,
                  CASE WHEN doc_id % 10 = 0
                       THEN text || ' contact user' || doc_id || '@example.com' ||
                            ' or call 555-01' || lpad((doc_id % 100)::VARCHAR, 2, '0') ||
                            ' from 192.168.' || (doc_id % 256) || '.7'
                       ELSE text END AS t2
           FROM documents)
         SELECT doc_id,
                len(regexp_extract_all(t2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
                len(regexp_extract_all(t2, '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS n_ips,
                len(regexp_extract_all(t2, '\b[0-9]{3}-[0-9]{4}\b')) AS n_phones,
                regexp_replace(regexp_replace(regexp_replace(t2,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                  '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
                  '\b[0-9]{3}-[0-9]{4}\b', '<PHONE>', 'g') AS redacted
         FROM d ORDER BY doc_id""",

    // same shingle derivation; containment = overlap / min set size
    "q_dedup_containment" ->
      s"""WITH $jaccardCtes
         SELECT id_a, id_b,
                round(common::DOUBLE / least(za.sz, zb.sz), 4) AS containment
         FROM c JOIN z za ON za.doc_id = c.id_a JOIN z zb ON zb.doc_id = c.id_b
         WHERE common::DOUBLE / least(za.sz, zb.sz) >= 0.8
         ORDER BY id_a, id_b""",

    "q_token_count" ->
      """SELECT doc_id,
                len(string_split_regex(trim(text), '\s+')) AS n_tokens,
                length(text) AS len_chars
         FROM documents ORDER BY doc_id""",

    "q_text_quality" ->
      """WITH t AS (SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS w
                    FROM documents)
         SELECT doc_id,
                len(w) AS n_tokens,
                round(CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE)
                      / len(w), 4) AS avg_token_len,
                round(CAST(len(list_filter(w, x -> x IN ('the','a','an','of','and','to','in','is','it','that','for','on','with','as','at','by'))) AS DOUBLE)
                      / len(w), 4) AS stopword_ratio,
                round(CAST(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS DOUBLE)
                      / length(text), 4) AS punct_ratio
         FROM t ORDER BY doc_id""",

    "q_lang_count" ->
      """SELECT lang, count(*) AS cnt FROM documents GROUP BY lang ORDER BY lang""",

    "q_text_profile" ->
      """WITH t AS (SELECT doc_id, text,
             string_split_regex(trim(text), '\s+') AS w FROM documents),
         s AS (SELECT doc_id, text, w,
           len(list_intersect(w, ['der','die','das','und','ist','nicht','mit','ein','eine','zu'])) AS h_de,
           len(list_intersect(w, ['the','and','of','to','is','that','it','with','for','was'])) AS h_en,
           len(list_intersect(w, ['el','la','los','y','es','una','por','para','que','no'])) AS h_es,
           len(list_intersect(w, ['le','la','les','et','est','une','pour','dans','que','pas'])) AS h_fr
           FROM t)
         SELECT doc_id,
           CAST(len(w) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+'))
              + len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS BIGINT) AS n_subwords,
           CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
                WHEN h_fr = greatest(h_de, h_en, h_es, h_fr) THEN 'fr'
                WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
                WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
                ELSE 'de' END AS lang_pred,
           CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS fingerprint
         FROM s ORDER BY doc_id""",

    // the synthesizer's outputs are pure functions of the id (media_id%3
    // picks the modality; PNGs are 16x12 RGB, WAVs 400 frames @16kHz
    // mono), so the oracle re-derives every DECODED value analytically —
    // matching hashes prove javax.imageio/javax.sound read back exactly
    // what the synthesizer declared
    "q_media_metadata" ->
      """SELECT vec_id AS media_id,
                CASE vec_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                     ELSE 'video' END AS media_type,
                CASE WHEN vec_id % 3 = 0 THEN 16 ELSE 0 END AS width,
                CASE WHEN vec_id % 3 = 0 THEN 12 ELSE 0 END AS height,
                CASE WHEN vec_id % 3 = 0 THEN 3 ELSE 0 END AS channels,
                CASE WHEN vec_id % 3 = 1 THEN 16000 ELSE 0 END AS sample_rate,
                (CASE WHEN vec_id % 3 = 1 THEN 400 ELSE 0 END)::BIGINT AS n_frames
         FROM embeddings
         ORDER BY media_id""",

    // marker-overlap language heuristic; ties resolve to the
    // lexicographically greatest language (Spark array_max struct order)
    "q_lang_id" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
                    FROM documents),
         s AS (SELECT doc_id,
           len(list_intersect(w, ['der','die','das','und','ist','nicht','mit','ein','eine','zu'])) AS h_de,
           len(list_intersect(w, ['the','and','of','to','is','that','it','with','for','was'])) AS h_en,
           len(list_intersect(w, ['el','la','los','y','es','una','por','para','que','no'])) AS h_es,
           len(list_intersect(w, ['le','la','les','et','est','une','pour','dans','que','pas'])) AS h_fr
           FROM t)
         SELECT doc_id,
           CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
                WHEN h_fr = greatest(h_de, h_en, h_es, h_fr) THEN 'fr'
                WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
                WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
                ELSE 'de' END AS lang_pred
         FROM s ORDER BY doc_id""",
  )
}
