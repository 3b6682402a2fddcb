package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (beyond-reference
  * surface): token counting, quality features, n-gram-heuristic language
  * ID, and document fingerprinting. All pure codegen'd column expressions
  * — per-row work only, embarrassingly parallel at any scale.
  */
object TextOps {

  /** Canonical tokenizer (shared with [[Dedup.tokens]]): non-empty
    * whitespace tokens. The empty-string filter matters only for
    * empty/whitespace-only text, where split(trim("")) yields [""] and a
    * size-based token count would report 1 token for an empty document.
    */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish sub-word count: alphanumeric runs + individual punctuation
    * characters — the way byte-pair tokenizers coarsely segment; a cheap,
    * deterministic proxy for "LLM tokens" (≈ chars/4 heuristics are
    * worse). Formulated without lookarounds so an RE2-based SQL engine
    * (the oracle) computes the identical number.
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z0-9]+"), lit(0))) +
      size(regexp_extract_all(text, lit("[^a-zA-Z0-9\\s]"), lit(0)))

  /** Quality features (length / punctuation / stopword ratios — the usual
    * pre-training quality-filter signals).
    */
  def qualityFeatures(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    val nTok = size(toks)
    val nChar = length(text)
    val punctChars = length(regexp_replace(text, "[a-zA-Z0-9\\s]", ""))
    val stopCnt = size(filter(toks, t => t.isInCollection(stopwords)))
    val totalTokLen = aggregate(transform(toks, t => length(t)), lit(0), (a, x) => a + x)
    struct(
      nTok.as("n_tokens"),
      nChar.as("n_chars"),
      (totalTokLen.cast("double") / nTok).as("avg_token_len"),
      (stopCnt.cast("double") / nTok).as("stopword_ratio"),
      (punctChars.cast("double") / nChar).as("punct_ratio"))
  }

  val EnStopwords: Seq[String] = Seq("the", "a", "an", "of", "and", "to", "in",
    "is", "it", "that", "for", "on", "with", "as", "at", "by")

  /** Per-language marker stopword lists for the n-gram/stopword language
    * heuristic. Tiny on purpose: language ID at corpus scale wants a
    * cheap, fully-codegen'd discriminator, not a model.
    */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "it", "with", "for", "was"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "pour", "dans", "que", "pas"),
    "es" -> Seq("el", "la", "los", "y", "es", "una", "por", "para", "que", "no"))

  /** Heuristic language ID: the language whose marker set overlaps the
    * token set most wins; zero evidence → "und" (undetermined); equal-hit
    * ties resolve to the lexicographically greatest language code (the
    * struct ordering of array_max — the SQL oracle mirrors this exactly).
    * One pass, pure expressions: max_by over a literal language array.
    */
  def langId(text: Column, markers: Map[String, Seq[String]] = LangMarkers): Column = {
    val toks = tokens(text)
    val scored = markers.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(size(array_intersect(toks, array(words.map(lit): _*))).as("hits"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*)) // struct compare: hits first, lang tiebreak
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Winnowing-style document fingerprint: min-k sketch over n-gram
    * shingle hashes. Two docs sharing content share sketch entries; the
    * full 64-bit xxhash of the text is an exact-match fingerprint.
    */
  def fingerprintSketch(text: Column, n: Int, k: Int): Column =
    slice(array_sort(transform(Dedup.shingles(text, n), s => xxhash64(s))), 1, k)

  /** Exact-match fingerprint: the first 60 bits of md5 as a long —
    * portable (a SQL oracle recomputes it from `md5(text)` hex), and at
    * 60 bits collision odds stay ~n²/2⁶¹. The xxhash64 alternative is
    * marginally faster but reproducible by nothing else.
    */
  def exactFingerprint(text: Column): Column =
    conv(substring(md5(text), 1, 15), 16, 10).cast("long")

  /** PII patterns shared by detection and redaction — restricted to
    * syntax Java regex and RE2 (the SQL oracle's engine) interpret
    * identically: ASCII classes, bounded repetition, `\b`, and
    * non-capturing groups only.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val IpRe = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val PhoneRe = "\\b[0-9]{3}-[0-9]{4}\\b"

  /** PII detection signals: per-row counts of email / IPv4 / phone-shaped
    * spans. Pure codegen'd regex expressions — map-side only, the
    * pre-redaction audit pass of a training-data pipeline.
    */
  def piiSignals(text: Column): Column = struct(
    size(regexp_extract_all(text, lit(EmailRe), lit(0))).as("n_emails"),
    size(regexp_extract_all(text, lit(IpRe), lit(0))).as("n_ips"),
    size(regexp_extract_all(text, lit(PhoneRe), lit(0))).as("n_phones"))

  /** PII redaction: replace detected spans with typed placeholder tokens.
    * Email → IP → phone, in that fixed order (order matters — redaction
    * output feeds exact-dedup hashes, so it must be deterministic and
    * reproducible by the SQL oracle applying the same sequence).
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        IpRe, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Full profile DataFrame helper. */
  def profile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(col(idCol),
      tokenCount(t).as("n_tokens"),
      subwordCount(t).as("n_subwords"),
      qualityFeatures(t, EnStopwords).as("quality"),
      langId(t).as("lang_pred"),
      exactFingerprint(t).as("fingerprint"))
  }

  /** Count of the most frequent element of a string array, computed as the
    * longest run of the sorted array — one pass per row, no shuffle, no
    * per-row hash map (the HOF state is a 3-field struct).
    */
  private def topCount(arr: Column): Column =
    aggregate(array_sort(arr),
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(acc.getField("prev") <=> x, acc.getField("run") + 1)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** Gopher-style repetition signals (Rae et al. 2021 §A1.1): documents
    * dominated by one token / one bigram, or with a low distinct-token
    * fraction, are boilerplate or degenerate generations — the standard
    * pre-training repetition filters. Pure per-row expressions
    * (embarrassingly parallel): fractions of the most frequent unigram and
    * bigram plus the distinct-token fraction, all over the canonical
    * whitespace tokens.
    */
  def repetitionSignals(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks)
    val bigrams = transform(sequence(lit(1), n - 1),
      i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1)))
    struct(
      n.as("n_tokens"),
      // empty/whitespace-only text: 0/0 would be NaN — pin to 0.0
      when(n > 0, size(array_distinct(toks)).cast("double") / n)
        .otherwise(lit(0.0)).as("distinct_frac"),
      when(n > 0, topCount(toks).cast("double") / n)
        .otherwise(lit(0.0)).as("top_unigram_frac"),
      // n=1 has no bigram — and sequence(1, 0) would DESCEND to [1, 0],
      // so the guard must keep the branch unevaluated, not just mask it
      when(n >= 2, topCount(bigrams).cast("double") / (n - 1))
        .otherwise(lit(0.0)).as("top_bigram_frac"))
  }

  /** Fraction of each document's distinct n-gram shingles occurring in at
    * least `minDf` documents corpus-wide — the cross-document boilerplate /
    * benchmark-contamination signal (a doc whose shingles all appear
    * elsewhere is a copy; one sharing none is novel). Corpus-level by
    * nature: explode → document-frequency count → re-join, both shuffles
    * keyed on the shingle, so the plan is a pair of hash aggregations that
    * scale out like any term-frequency job. Shingles travel as 64-bit
    * hashes from the codegen'd [[graft.functions.ShingleHashes]] kernel —
    * one tokenize per row (the HOF string formulation re-tokenizes inside
    * every lambda call: 7× slower at sf0.1) and 8-byte shuffle keys;
    * document-frequency counts match string-shingle semantics exactly
    * modulo ~n²/2⁶⁵ hash collisions, so a string-keyed SQL oracle
    * reproduces every count.
    */
  def shingleNovelty(
      df: DataFrame, idCol: String, textCol: String, n: Int,
      minDf: Int = 2): DataFrame = {
    val ex = df.select(col(idCol).as("id"),
      explode(graft.Graft.F.shingleHashes(tokens(col(textCol)), n)).as("sh"))
    val dfreq = ex.groupBy("sh").agg(count(lit(1)).as("df"))
    ex.join(dfreq, "sh")
      .groupBy("id")
      .agg(count(lit(1)).as("n_shingles"),
        count(when(col("df") >= minDf, lit(1))).as("n_shared"))
      .select(col("id"), col("n_shingles"), col("n_shared"),
        (col("n_shared").cast("double") / col("n_shingles")).as("shared_frac"))
  }

  /** Unicode normalization — the pre-tokenization cleanup every text
    * pipeline runs first: NFC compose, optional accent strip, lowercase,
    * whitespace collapse. One codegen'd kernel call per row
    * ([[graft.functions.TextNormalize]]; Spark has no built-in unicode
    * normalizer), mirroring DuckDB's `nfc_normalize`/`strip_accents`
    * composition bit-for-bit so downstream hashes/fingerprints agree
    * across engines.
    */
  def normalize(text: Column, stripAccents: Boolean = true): Column =
    graft.Graft.F.textNormalize(text, stripAccents)

  /** Unigram language-model score: average log10 probability of a
    * document's tokens under the corpus's own unigram distribution (MLE)
    * — the cheap perplexity proxy for ranking fluency / flagging
    * outliers when no external LM is available (docs of rare tokens score
    * low; repetitive common-token docs score high; combine with
    * [[repetitionSignals]]). Corpus-level: token explode → global counts
    * (one term-frequency shuffle), then per-doc average of log p(token)
    * (token-keyed join + one per-doc aggregate) — the same scale shape as
    * any TF job. The total-token scalar stays in the plan as a broadcast
    * single-row aggregate (no driver action).
    */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toksEx = df.select(col(idCol).as("id"),
      explode(tokens(col(textCol))).as("tok"))
    val counts = toksEx.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val totalDf = counts.agg(sum(col("cnt")).cast("double").as("n_total"))
    toksEx.join(counts, "tok")
      .crossJoin(broadcast(totalDf))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        avg(log10(col("cnt").cast("double") / col("n_total"))).as("avg_logp"))
  }

  /** Per-document top-k TF-IDF keywords — the classic salient-term
    * extractor (tf = in-doc term count, idf = ln(N/df) over the corpus).
    * Corpus-level: one term-frequency shuffle for df, one (doc, term)
    * aggregate for tf, a term-keyed join, and a per-doc top-k window.
    * The document count N rides as a broadcast single-row aggregate.
    * Ties at equal score resolve to the lexicographically smaller term
    * (deterministic output).
    */
  def tfidfKeywords(
      df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val toksEx = df.select(col(idCol).as("id"),
      explode(tokens(col(textCol))).as("term"))
    val tf = toksEx.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    // df derived FROM the tf aggregate (round 22, guide §2.2/§2.4): tf is
    // already one row per distinct (doc, term), so counting its rows per
    // term IS the document frequency — the former explode→distinct→count
    // branch re-tokenized the corpus and paid two extra shuffles for a
    // relation tf already materializes; the shared (id, term) exchange is
    // reused across both consumers.
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = df.agg(count(lit(1)).cast("double").as("n_docs"))
    // per-doc top-k via the bounded-heap aggregate (round 22, guide §2.3
    // aggregate-before-shuffle): the former row_number window shuffled and
    // SORTED every (doc, term) row; the heap's partial aggregation ships
    // at most k rows per doc per map task and never materializes a
    // per-doc sort. Tie semantics unchanged — TopKAgg breaks exact score
    // ties by the payload struct's native SQL order, (term, tf) ascending,
    // which is the window's `ORDER BY tfidf DESC, term`.
    tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", col("tf") * log(col("n_docs") / col("df")))
      .groupBy(col("id"))
      .agg(graft.Graft.F.topK(col("tfidf"),
        struct(col("term"), col("tf")), k, asc = false).as("_tk"))
      .select(col("id"), posexplode(col("_tk")))
      .select(col("id"), (col("pos") + 1).as("rank"),
        col("col.item.term").as("term"), col("col.item.tf").as("tf"),
        col("col.score").as("tfidf"))
  }

  /** Benchmark decontamination (the n-gram overlap check every serious
    * pre-training pipeline runs against its eval sets): per corpus
    * document, how many of its distinct n-gram shingles appear anywhere in
    * the benchmark corpus, plus a contamination flag. Shingles travel as
    * 64-bit kernel hashes; the benchmark's distinct shingle set is
    * broadcast (eval sets are small next to a training corpus), so the
    * probe is a map-side broadcast join — the corpus shuffles only its
    * (id, hit) pairs into one per-doc count. A benchmark too large to
    * broadcast degrades to the same shuffled equi-join automatically
    * (drop the hint); nothing in the shape is driver-resident.
    */
  def decontaminate(
      corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int): DataFrame = {
    val shingled = corpus.select(col(idCol).as("id"),
      graft.Graft.F.shingleHashes(tokens(col(textCol)), n).as("sharr"))
    val ex = shingled.select(col("id"), explode(col("sharr")).as("sh"))
    val bsh = benchmark.select(
      explode(graft.Graft.F.shingleHashes(tokens(col(benchTextCol)), n)).as("sh"))
      .distinct()
    val hits = ex.join(broadcast(bsh), Seq("sh"))
      .groupBy("id").agg(count(lit(1)).as("n_contaminated"))
    shingled.select(col("id"), size(col("sharr")).cast("long").as("n_shingles"))
      .join(hits, Seq("id"), "left")
      .select(col("id"), col("n_shingles"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      .withColumn("is_contaminated", (col("n_contaminated") > 0).cast("int"))
  }

  /** Per-stratum quantiles of a quality metric — the threshold-picking
    * step of a filtering pipeline ("keep docs above the p10 quality of
    * their language"). `exact = true` uses `percentile` (linear
    * interpolation at index p·(n−1) — the definition DuckDB's
    * `quantile_cont` shares, so results oracle-check bit-for-bit);
    * at 100 TB switch `exact = false` for `approx_percentile`, whose
    * sketch memory is bounded per group while exact percentile holds a
    * per-group value-count map.
    */
  def qualityQuantiles(
      df: DataFrame, strata: Column, value: Column, ps: Seq[Double],
      exact: Boolean = true): DataFrame = {
    val fn = if (exact) "percentile" else "approx_percentile"
    // name by rounded per-mille when not a whole percent: (p*100).toInt
    // truncates float error (0.29*100 → 28) and collides 0.99/0.999
    def nameOf(p: Double): String = {
      val mille = math.round(p * 1000).toInt
      if (mille % 10 == 0) s"p${mille / 10}" else s"p${mille}m"
    }
    val names = ps.map(nameOf)
    require(names.distinct.size == names.size,
      s"duplicate quantile names from $ps: $names")
    val qs = ps.zip(names).map { case (p, nm) =>
      round(call_function(fn, value.cast("double"), lit(p)), 4).as(nm)
    }
    df.groupBy(strata)
      .agg(count(lit(1)).as("cnt"), qs: _*)
  }
}
