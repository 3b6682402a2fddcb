package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM-scale training-data pipelines — the
  * beyond-reference surface (builder brief): exact, exact-jaccard
  * similarity join, MinHash-LSH, SimHash, and embedding near-dup.
  *
  * Design rules for 100 TB:
  *  - everything is expressed with codegen'd built-ins + shuffles on
  *    content-derived keys; no driver-resident state, no collect();
  *  - candidate generation is always a key-equality join (shingle /
  *    band-hash / simhash-chunk / LSH bucket), never a cross join;
  *  - per-doc feature extraction uses higher-order array functions
  *    (transform/aggregate/zip_with) — one pass over each document, no
  *    row explosion for the per-doc part.
  */
object Dedup {

  /** Hot-shingle sets up to this many distinct entries are collapsed to a
    * broadcast array for a map-side `array_except` subtract (~32 MB of
    * longs at the bound); beyond it the anti-join formulation takes over.
    */
  private val MaxHotBroadcast = 4000000L

  /** Parallelism floor for the CPU-dense fingerprint kernels (round 22,
    * guide §2.5/§6: reader parallelism bounds compute parallelism): a
    * narrow local fixture scans as few splits, and every kernel stage —
    * tokenize+shingle, minhash signatures, simhash md5-per-token — plus
    * the candidate-join map sides run at that width (measured: 8 tasks on
    * 32 cores, the jaccard candidate-join map stage burning 38 s of
    * executor time at 8-way). Widen to cluster width when narrower; at
    * scale inputs arrive with ≥ cores splits and this is a no-op.
    */
  private def widen(df: DataFrame): DataFrame = {
    val width = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < width) df.repartition(width) else df
  }

  /** Canonical tokenizer — non-empty whitespace tokens, shared with
    * [[TextOps.tokens]] so dedup fingerprints and profile metrics see the
    * same token stream (an untrimmed split leaks a "" token for text with
    * leading whitespace, which would vote on every simhash bit).
    */
  def tokens(text: Column): Column = TextOps.tokens(text)

  /** Distinct n-word shingles of a document, as "w1 w2 ... wn" strings.
    * Documents shorter than n words yield their full token join (so every
    * doc has ≥1 shingle and dedup never silently drops short docs).
    *
    * NOTE the expression-reuse trap: `toks` below is an expression TREE,
    * and the transform lambda re-evaluates it (split + trim + filter) per
    * shingle position — interpreted HOF lambdas get no common-
    * subexpression elimination. Fine for one-off per-row use; anything
    * corpus-scale should either use the codegen'd
    * [[graft.Graft.F.shingleHashes]] kernel (when 64-bit hashes suffice)
    * or materialize tokens behind a projection boundary and call
    * [[shinglesFromTokens]].
    */
  def shingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(text), n)

  /** [[shingles]] over an already-materialized token ARRAY column: with
    * `toks` bound to an attribute (a prior `select`), the lambda's slice
    * is O(n) array access instead of a re-tokenization of the text.
    */
  def shinglesFromTokens(toks: Column, n: Int): Column = {
    val full = array(concat_ws(" ", toks))
    val sh = transform(
      sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws(" ", slice(toks, i, lit(n))))
    array_distinct(when(size(toks) >= n, sh).otherwise(full))
  }

  /** Exact dedup by content hash: one row per distinct text with the
    * canonical survivor (min id) and the duplicate count.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_cnt"))

  /** EXACT n-gram Jaccard similarity self-join with PREFIX FILTERING
    * (AllPairs/PPJoin): shingle-hash sets are kept sorted (a global total
    * order); for threshold t only each set's first |S| − ⌈t·|S|⌉ + 1
    * hashes can witness a qualifying pair — if jacc(a,b) ≥ t and the
    * prefixes were disjoint, the overlap would fit inside one suffix of
    * size ⌈t·|S|⌉ − 1 < ⌈t·|S|⌉ ≤ |a∩b|, a contradiction. So the
    * candidate equi-join explodes only prefixes (~(1−t)·|S| hashes per
    * doc; candidate PAIRS shrink ~(1−t)²), and exact verification runs an
    * allocation-free sorted-merge count over the full sorted sets for
    * candidates only.
    * Zero false negatives by the lemma; zero false positives by the
    * verify.
    *
    * `maxShingleDf` drops shingles occurring in more than that many
    * documents (skew guard: one boilerplate shingle at corpus scale makes
    * any candidate join quadratic in its document frequency). Sizes AND
    * intersections are computed over the same capped sets — a pair whose
    * only shared shingles are hot is missed by design (they carry no
    * discriminating signal). Pass None to disable for small corpora.
    */
  def jaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      maxShingleDf: Option[Int] = Some(10000)): DataFrame = {
    val (out, intermediates) = jaccardPairsPlan(df, idCol, textCol, n, threshold, maxShingleDf)
    // materialize the (output-sized) pair list, then deterministically free
    // the corpus-scale shingle/hot-set checkpoints — the returned
    // checkpoint's own blocks go to the context cleaner on GC (same
    // contract as Ingest.conform).
    try out.localCheckpoint(eager = true)
    finally intermediates.foreach(Checkpoints.free)
  }

  /** Lazy-plan variant of [[jaccardPairs]]: returns the un-materialized
    * pair plan (its prefix-filter equi-join + verify structure stays
    * inspectable for plan evidence) plus the corpus-scale checkpoints the
    * plan reads. Callers MUST materialize the plan at most once and then
    * free each returned checkpoint via [[Checkpoints.free]].
    */
  /** Shared front half of the shingle-set joins: per-doc distinct sorted
    * 64-bit shingle-hash sets with the hot-shingle (document-frequency)
    * cap applied. Returns (sets `(id, ss)`, corpus-scale checkpoints the
    * caller must free after its output materializes).
    */
  private def cappedShingleSets(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      maxShingleDf: Option[Int]): (DataFrame, Seq[DataFrame]) = {
    // one codegen'd kernel per row: distinct SORTED 64-bit shingle hashes
    // (== xxhash64 of the space-joined shingle strings) — 8-byte shuffle
    // keys, no per-shingle string objects, collision odds ~|shingles|²/2⁶⁵.
    // Materialized once: the hot-set count, the prefix explode and both
    // verify joins all read it — without the checkpoint each branch
    // re-runs the tokenize→shingle→hash kernel over the corpus.
    // [[widen]] before the kernel: the checkpoint's partition count is
    // what every downstream map stage (prefix explode, verify joins) runs
    // at, and the kernel itself is the hottest per-row work.
    val src = widen(df.select(col(idCol).as("id"), col(textCol).as("_t")))
    val shingled = src.select(col("id"),
      graft.Graft.F.shingleHashes(tokens(col("_t")), n).as("sharr"))
      .localCheckpoint(eager = true)
    var hotCp: Option[DataFrame] = None
    val sets = maxShingleDf match {
      case Some(cap) =>
        // capped sets = per-doc set minus the hot-shingle set. Finding the
        // hot set costs one explode→groupBy shuffle (unavoidable — df is a
        // corpus-wide count); the SUBTRACTION is map-side when the hot set
        // is broadcast-sized: collapsed to one sorted-array row and
        // subtracted with `array_except` (order-preserving, which the
        // prefix lemma needs). The common no-hot-shingles case skips the
        // subtract entirely. A pathological corpus (Zipfian shingles with
        // a tiny cap) can make the hot set itself huge — collect_list of
        // millions of hashes into one row would OOM where a join degrades
        // gracefully — so past `MaxHotBroadcast` distinct hot shingles the
        // anti-join + regroup formulation takes over.
        val sh0 = shingled.select(col("id"), explode(col("sharr")).as("sh"))
        val hotAgg = sh0.groupBy("sh").agg(count(lit(1)).as("df"))
          .filter(col("df") > cap).select(col("sh"))
        // count BEFORE checkpointing: the common no-hot-shingles case then
        // pays one aggregate job and no corpus-scale checkpoint write; a
        // non-empty hot set re-runs the groupBy once (over the shingled
        // checkpoint's blocks, not the raw corpus) to materialize it for
        // the subtract branches
        val nHot = hotAgg.count()
        if (nHot == 0L) shingled.select(col("id"), col("sharr").as("ss"))
        else {
          val hot = hotAgg.localCheckpoint(eager = true)
          hotCp = Some(hot)
          if (nHot <= MaxHotBroadcast) {
            val hotArr = hot.agg(sort_array(collect_list(col("sh"))).as("_hot"))
            shingled.crossJoin(broadcast(hotArr))
              .select(col("id"), array_except(col("sharr"), col("_hot")).as("ss"))
          } else {
            sh0.join(hot, Seq("sh"), "left_anti")
              .groupBy("id").agg(sort_array(collect_list(col("sh"))).as("ss"))
          }
        }
      case None => shingled.select(col("id"), col("sharr").as("ss"))
    }
    (sets, shingled +: hotCp.toSeq)
  }

  private[graft] def jaccardPairsPlan(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      maxShingleDf: Option[Int] = Some(10000)): (DataFrame, Seq[DataFrame]) = {
    val (sets, intermediates) =
      cappedShingleSets(df, idCol, textCol, n, maxShingleDf)
    val withSz = sets.withColumn("sz", size(col("ss")))
    // prefix = first sz - ceil(t*sz) + 1 elements of the sorted set
    val prefixLen = (col("sz") - ceil(col("sz") * lit(threshold)).cast("int") + 1)
    val pre = withSz.select(col("id"), col("sz"),
      posexplode(slice(col("ss"), lit(1), greatest(prefixLen, lit(0)))))
      .select(col("id"), col("sz"), (col("pos") + 1).as("p"), col("col").as("psh"))
    // POSITIONAL filter (PPJoin, Xiao et al. WWW'08): candidate rows carry
    // each side's set size and the shared hash's 1-based position in the
    // sorted set; the overlap can only use elements at ≥ that position, so
    // common ≤ ub = 1 + min(sz_a − p_a, sz_b − p_b). A qualifying pair's
    // FIRST common element provably sits inside both prefixes (the prefix
    // lemma above), and at that occurrence ub ≥ common — so filtering each
    // occurrence with the verify's own inequality (same double arithmetic,
    // monotone in the numerator: c ≤ ub ⇒ ub/(S−ub) ≥ c/(S−c)) keeps at
    // least one occurrence of every true pair. Zero false negatives;
    // measured at the 10× fixture: 21.45M candidate occurrences → 2.85M,
    // verify stage 562 s of executor time → ~80 s, identical 1254 pairs.
    val ub = lit(1) + least(col("a.sz") - col("a.p"), col("b.sz") - col("b.p"))
    val cand = pre.as("a").join(pre.as("b"), Seq("psh"))
      .filter(col("a.id") < col("b.id"))
      .filter(ub.cast("double") / (col("a.sz") + col("b.sz") - ub) >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    // a pair can surface once per shared prefix hash; dedup AFTER the
    // verify (round 22): the pre-verify dropDuplicates was a hash
    // aggregate over the full candidate set (measured ~4.6 s on 25M
    // candidate rows at the 10× fixture) bought to avoid re-verifying
    // duplicates — but the positional filter keeps ~1.02 occurrences per
    // pair here, and the duplication is BOUNDED by the prefix length
    // (~(1−t)·|S|+1 shared hashes can generate a pair), so the worst-case
    // re-verify is a small constant factor while the saved aggregate is
    // paid on every row. Post-verify rows of one pair are identical, so
    // the output-sized dropDuplicates below returns the same set.
    val out = cand
      .join(withSz.select(col("id").as("id_a"), col("ss").as("ss_a"), col("sz").as("sz_a")), "id_a")
      .join(withSz.select(col("id").as("id_b"), col("ss").as("ss_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("common", graft.Graft.F.commonCount(col("ss_a"), col("ss_b")))
      .withColumn("jaccard",
        col("common").cast("double") / (col("sz_a") + col("sz_b") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .dropDuplicates("id_a", "id_b")
    (out, intermediates)
  }

  /** Near-CONTAINMENT pairs: overlap / min(|a|, |b|) ≥ threshold — the
    * doc-inside-doc near-dup that symmetric Jaccard misses (a short doc
    * copied into a long one has high containment but low Jaccard).
    *
    * Candidate generation stays an equi-join but is necessarily
    * asymmetric: the smallest shared shingle provably lies in the SMALLER
    * set's prefix (if it didn't, overlap ≤ ⌈t·|s|⌉ − 1 < t·min — the
    * prefix lemma applied to the smaller side), yet it can sit anywhere
    * in the larger set — so each set's prefix joins against the full
    * shingle relation, not prefix×prefix. Cost: Σ_sh prefixCount(sh) ×
    * df(sh), bounded by the same `maxShingleDf` hot-shingle cap (which a
    * containment join needs even more than Jaccard does). Exact output:
    * zero false negatives by the lemma, zero false positives by the
    * sorted-merge-count verify over the full capped sets.
    */
  def containmentPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      maxShingleDf: Option[Int] = Some(10000)): DataFrame = {
    val (out, intermediates) =
      containmentPairsPlan(df, idCol, textCol, n, threshold, maxShingleDf)
    try out.localCheckpoint(eager = true)
    finally intermediates.foreach(Checkpoints.free)
  }

  /** Lazy-plan variant of [[containmentPairs]] (plan-evidence contract of
    * [[jaccardPairsPlan]]): materialize at most once, then free each
    * returned checkpoint.
    */
  private[graft] def containmentPairsPlan(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      maxShingleDf: Option[Int] = Some(10000)): (DataFrame, Seq[DataFrame]) = {
    val (sets, intermediates) =
      cappedShingleSets(df, idCol, textCol, n, maxShingleDf)
    val withSz = sets.withColumn("sz", size(col("ss")))
    val prefixLen = (col("sz") - ceil(col("sz") * lit(threshold)).cast("int") + 1)
    val pre = withSz.select(col("id"), col("sz"),
      posexplode(slice(col("ss"), lit(1), greatest(prefixLen, lit(0)))))
      .select(col("id"), col("sz"), (col("pos") + 1).as("p"), col("col").as("psh"))
    val inv = withSz.select(col("id"), col("sz"), posexplode(col("ss")))
      .select(col("id"), col("sz"), (col("pos") + 1).as("p"), col("col").as("psh"))
    // the lemma only needs the SMALLER set's prefix, so restrict the
    // prefix side to the smaller of each pair (ids break size ties):
    // without the ordering every pair is generated from BOTH directions
    // and the duplicate half is shuffled just to be dropDuplicates'd away.
    // POSITIONAL filter (same device as [[jaccardPairsPlan]]): the overlap
    // only uses elements at ≥ the shared hash's position on each side, so
    // common ≤ ub = 1 + min(sz_a − p_a, sz_b − p_b) at the pair's first
    // common element (which the join provably generates: it lies in the
    // smaller side's prefix by the lemma, and the full side explodes every
    // position). Filtering with the verify's own inequality (double
    // division by the same min-size denominator, monotone in the
    // numerator) keeps that occurrence of every true pair — zero false
    // negatives, and the dedup/verify shuffles shrink by the pruned bulk.
    val ub = lit(1) + least(col("a.sz") - col("a.p"), col("b.sz") - col("b.p"))
    val cand = pre.as("a").join(inv.as("b"), Seq("psh"))
      .filter(col("a.sz") < col("b.sz") ||
        (col("a.sz") === col("b.sz") && col("a.id") < col("b.id")))
      .filter(ub.cast("double") / least(col("a.sz"), col("b.sz")) >= threshold)
      .select(least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"))
    // dedup AFTER the verify (the [[jaccardPairsPlan]] argument): the
    // candidate-scale hash aggregate cost more than the bounded re-verify
    // of duplicate occurrences (≤ the smaller side's prefix length per
    // pair); post-verify rows of one pair are identical, so the
    // output-sized dropDuplicates below returns the same set.
    val out = cand
      .join(withSz.select(col("id").as("id_a"), col("ss").as("ss_a"), col("sz").as("sz_a")), "id_a")
      .join(withSz.select(col("id").as("id_b"), col("ss").as("ss_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("common", graft.Graft.F.commonCount(col("ss_a"), col("ss_b")))
      .withColumn("containment",
        col("common").cast("double") / least(col("sz_a"), col("sz_b")))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("containment"))
      .dropDuplicates("id_a", "id_b")
    (out, intermediates)
  }

  /** MinHash signature as a per-row expression: element j = min over
    * shingles of xxhash64(shingle, seed=j). Takes the shingle ARRAY column
    * so the (expensive) shingle tree is computed once, not numHashes times.
    * For corpus-scale signatures prefer the explode+groupBy plan inside
    * [[minhashLshPairs]] (hashes each shingle exactly once, map-side
    * combine keeps the shuffle at one row per doc).
    */
  def minhashSignatureFromShingles(shingleArr: Column, numHashes: Int): Column =
    array((0 until numHashes).map(j =>
      array_min(transform(shingleArr, s => xxhash64(s, lit(j))))): _*)

  def minhashSignature(text: Column, n: Int, numHashes: Int): Column =
    minhashSignatureFromShingles(shingles(text, n), numHashes)

  /** MinHash-LSH near-dup pairs: signatures are cut into `bands` bands of
    * numHashes/bands rows; docs sharing any band hash become candidates
    * (equi-join on (band index, band hash) — the classic LSH bucket join);
    * candidates are verified with EXACT jaccard over their shingle sets,
    * so output contains no false positives (false negatives bounded by
    * the (bands, rows) S-curve).
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      numHashes: Int,
      bands: Int,
      threshold: Double): DataFrame = {
    val (out, intermediates) =
      minhashLshPairsPlan(df, idCol, textCol, n, numHashes, bands, threshold)
    // same lifecycle as jaccardPairs: materialize the output-sized pair
    // list, then free the corpus-scale signature checkpoint.
    try out.localCheckpoint(eager = true)
    finally intermediates.foreach(Checkpoints.free)
  }

  /** Lazy-plan variant of [[minhashLshPairs]] — see [[jaccardPairsPlan]]
    * for the contract.
    */
  private[graft] def minhashLshPairsPlan(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      numHashes: Int,
      bands: Int,
      threshold: Double): (DataFrame, Seq[DataFrame]) = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands
    // one kernel call per doc computes the whole signature (and the
    // distinct shingle-hash set used for exact verification); materialized
    // once — banding and both verify joins read it (same argument as the
    // localCheckpoint in jaccardPairs). [[widen]] before the signature
    // kernel (numHashes hashes per shingle): it and every downstream map
    // stage run at the checkpoint's width.
    val src = widen(df.select(col(idCol).as("id"), col(textCol).as("_t")))
    val shingled = src.select(col("id"),
      graft.Graft.F.shingleHashes(tokens(col("_t")), n).as("sh"),
      graft.Graft.F.minhashSig(tokens(col("_t")), n, numHashes).as("sig"))
      .localCheckpoint(eager = true)
    val sigCols: Seq[Column] = col("id") +:
      (0 until numHashes).map(j => element_at(col("sig"), j + 1).as(s"h$j"))
    val sig = shingled.select(sigCols: _*)
    val bandHashes = array((0 until bands).map { b =>
      val cols = (b * rows until (b + 1) * rows).map(j => col(s"h$j"))
      xxhash64(concat_ws(",", cols: _*))
    }: _*)
    // candidates travel as narrow (id, band, bh) rows; shingle sets are
    // re-joined by id only for the exact-verify stage.
    val banded = sig.select(col("id"), posexplode(bandHashes))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
    val cand = banded.as("a").join(banded.as("b"), Seq("band", "bh"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val out = cand
      .join(shingled.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(shingled.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("common", graft.Graft.F.commonCount(col("sh_a"), col("sh_b")))
      .withColumn("jaccard", col("common").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    (out, Seq(shingled))
  }

  /** 64-bit SimHash over whitespace tokens: per-token xxhash64 (Spark's
    * XXH64 seed 42), each bit votes ±1, sign of the vote vector forms the
    * fingerprint. A single codegen'd kernel call per row
    * ([[graft.functions.SimHash64]]) — the HOF formulation of the same
    * computation allocates a 64-element array per token and can't codegen.
    */
  def simhash(text: Column): Column = graft.Graft.F.simhash64(tokens(text))

  /** Portable 60-bit SimHash: per-token hash = the top 15 hex chars of
    * md5 (a function DuckDB shares bit-for-bit, unlike Spark's XXH64), so
    * the whole fingerprint is re-computable by the SQL oracle. A single
    * codegen'd kernel call per row ([[graft.functions.SimHashMd5]]) —
    * same speed class as [[simhash]], portable hash.
    */
  def simhashPortable(text: Column): Column =
    graft.Graft.F.simhashMd5(tokens(text))

  /** SimHash near-dup pairs over the PORTABLE fingerprint, Hamming ≤ 3:
    * pigeonhole over 4×15-bit chunks (a pair within distance 3 agrees on
    * ≥1 chunk), candidates equi-join on (chunk index, chunk value), exact
    * Hamming verifies via bit_count(xor). Output is exact — the pigeonhole
    * is lossless for maxHamming ≤ 3 — so a quadratic SQL re-implementation
    * is a true oracle. Skew-guarded: see [[simhashPairsImpl]].
    */
  def simhashPairsPortable(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int,
      hotBucketCap: Int = 10000): DataFrame = {
    val (out, sh) = simhashPairsImpl(
      widen(df.select(col(idCol).as("id"), col(textCol).as("_t")))
        .select(col("id"), simhashPortable(col("_t")).as("sh")),
      chunkBits = 15, hammingAsLong = true, maxHamming, hotBucketCap)
    try out.localCheckpoint(eager = true) finally Checkpoints.free(sh)
  }

  /** SimHash near-dup pairs with Hamming ≤ maxHamming ≤ 3: pigeonhole over
    * 4×16-bit chunks — pairs within distance 3 must agree on ≥1 chunk, so
    * the candidate join is an equi-join on (chunk index, chunk value);
    * exact Hamming verifies via bit_count(xor). Skew-guarded: see
    * [[simhashPairsImpl]].
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int,
      hotBucketCap: Int = 10000): DataFrame = {
    val (out, sh) = simhashPairsImpl(
      widen(df.select(col(idCol).as("id"), col(textCol).as("_t")))
        .select(col("id"), simhash(col("_t")).as("sh")),
      chunkBits = 16, hammingAsLong = false, maxHamming, hotBucketCap)
    try out.localCheckpoint(eager = true) finally Checkpoints.free(sh)
  }

  /** Shared skew-safe simhash pair plan. Two quadratic failure modes of
    * the naive (chunk, value) candidate join are removed WITHOUT changing
    * the (exact) output:
    *
    *  1. Identical fingerprints (a corpus of short/near-empty docs
    *     collapses onto few fingerprints) — the candidate join runs over
    *     DISTINCT fingerprints only; id pairs are expanded afterwards by
    *     joining fingerprint pairs back to the id table (intra-fingerprint
    *     pairs via a plain equi-join on the fingerprint). Both expansions
    *     are output-sized — a million true duplicates genuinely HAVE ~½M²
    *     pairs; no candidate-side blowup remains.
    *  2. A hot (chunk, value) bucket of many DISTINCT fingerprints —
    *     buckets past `hotBucketCap` re-apply the pigeonhole: members
    *     already agree on the bucket's `chunkBits` bits, so a qualifying
    *     pair's ≤ 3 differing bits all lie in the remaining 3·chunkBits
    *     bits, and splitting THOSE into 4 sub-chunks guarantees agreement
    *     on ≥ 1 (again lossless). The hot candidate join runs on
    *     (chunk, value, sub-chunk, sub-value) — each hot bucket splits by
    *     the sub-value fan-out instead of going quadratic.
    */
  /** Returns the (un-materialized) pair plan plus the fingerprint
    * checkpoint it reads; public wrappers materialize the output and free
    * the checkpoint (the jaccardPairsPlan lifecycle).
    */
  private def simhashPairsImpl(
      sh0: DataFrame,
      chunkBits: Int,
      hammingAsLong: Boolean,
      maxHamming: Int,
      hotBucketCap: Int): (DataFrame, DataFrame) = {
    require(maxHamming <= 3, "4-chunk pigeonhole supports maxHamming <= 3")
    require(hotBucketCap >= 1, s"hotBucketCap must be positive: $hotBucketCap")
    val ham = (a: Column, b: Column) => {
      val h = bit_count(a.bitwiseXOR(b))
      if (hammingAsLong) h.cast("long") else h
    }
    // fingerprints are recomputed by several branches below — materialize
    // once (id+fingerprint = 16 bytes/row); the public wrappers free this
    // checkpoint as soon as the output pair list materializes (wrappers
    // [[widen]] the input, so the md5/xxh64-per-token kernel runs wide)
    val sh = sh0.localCheckpoint(eager = true)
    val mask = (1L << chunkBits) - 1
    val fps = sh.select(col("sh")).distinct()
    val chunks = array((0 until 4).map(c =>
      shiftright(col("sh"), c * chunkBits).bitwiseAND(lit(mask))): _*)
    val chunked = fps.select(col("sh"), posexplode(chunks))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "cv")
    val counts = chunked.groupBy("chunk", "cv").agg(count(lit(1)).as("_n"))
    val withN = chunked.join(counts, Seq("chunk", "cv"))
    val cold = withN.filter(col("_n") <= hotBucketCap)
    val candCold = cold.as("a").join(cold.as("b"), Seq("chunk", "cv"))
      .filter(col("a.sh") < col("b.sh"))
      .select(col("a.sh").as("f1"), col("b.sh").as("f2"))
    // hot buckets: drop the bucket's own chunk bits, sub-chunk the rest.
    // shiftrightunsigned (not shiftright: 64-bit fingerprints are signed)
    // with a column shift amount; a shift of >= 64 wraps mod 64 in Java,
    // so the top chunk's "high remainder" is pinned to 0 explicitly.
    val w = lit(chunkBits)
    val subW = (3 * chunkBits + 3) / 4   // ceil(remaining / 4) sub-chunk width
    val lowMask = call_function("shiftleft", lit(1L), col("chunk") * w) - 1
    val high = when((col("chunk") + 1) * w >= 64, lit(0L)).otherwise(
      call_function("shiftrightunsigned", col("sh"), (col("chunk") + 1) * w))
    val rem = call_function("shiftleft", high, col("chunk") * w)
      .bitwiseOR(col("sh").bitwiseAND(lowMask))
    val subChunks = array((0 until 4).map(j =>
      shiftrightunsigned(rem, j * subW).bitwiseAND(lit((1L << subW) - 1))): _*)
    val hotSub = withN.filter(col("_n") > hotBucketCap)
      .select(col("sh"), col("chunk"), col("cv"), posexplode(subChunks))
      .withColumnRenamed("pos", "sub").withColumnRenamed("col", "sv")
    val candHot = hotSub.as("a").join(hotSub.as("b"), Seq("chunk", "cv", "sub", "sv"))
      .filter(col("a.sh") < col("b.sh"))
      .select(col("a.sh").as("f1"), col("b.sh").as("f2"))
    val fpPairs = candCold.unionByName(candHot)
      .dropDuplicates("f1", "f2")
      .withColumn("hamming", ham(col("f1"), col("f2")))
      .filter(col("hamming") <= maxHamming)
    // expand fingerprint pairs to id pairs (output-sized joins)
    val inter = fpPairs
      .join(sh.select(col("sh").as("f1"), col("id").as("_ia")), "f1")
      .join(sh.select(col("sh").as("f2"), col("id").as("_ib")), "f2")
      .select(least(col("_ia"), col("_ib")).as("id_a"),
        greatest(col("_ia"), col("_ib")).as("id_b"), col("hamming"))
    val intra = sh.as("a").join(sh.as("b"), Seq("sh"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        ham(col("sh"), col("sh")).as("hamming"))
    (inter.unionByName(intra), sh)
  }

  /** Exact embedding near-dup: all pairs with cosine ≥ threshold.
    * Quadratic — correct baseline and the verification oracle for the LSH
    * variant; use [[embeddingNearDupLsh]] at scale.
    */
  def embeddingNearDupExact(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", graft.Graft.F.vecCosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** Scale-safe embedding near-dup over an IVF coarse quantization: the
    * corpus is assigned to `ncentroids` lists once; each row then probes
    * its `nprobe` nearest lists with a per-row quantizer expression and
    * candidates come from a plain `list_id` EQUI-JOIN — hash-partitioned
    * on both sides, never a BroadcastNestedLoopJoin, so it survives a
    * corpus that does not fit one executor (the failure mode of
    * [[embeddingNearDupExact]]). Exact verification (true cosine ≥
    * threshold) runs on candidates only, so there are no false positives;
    * `nprobe = ncentroids` probes every list and reproduces the exact
    * all-pairs result through the distributed join (the oracle-parity
    * configuration), while `nprobe < ncentroids` trades recall for a
    * (nprobe/ncentroids)-fraction of the pair work — the 100 TB path.
    * An unordered pair can surface from both directions (a probes b's
    * list and b probes a's); canonicalizing to id_a < id_b AFTER the
    * threshold filter keeps the dedup shuffle output-sized.
    */
  def embeddingNearDupKnn(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      ncentroids: Int = 64,
      nprobe: Int = 64,
      seed: Long = 42L): DataFrame = {
    // few Lloyd iterations on purpose: centroid quality only shapes list
    // LOAD BALANCE here — at nprobe=ncentroids every pair is examined
    // regardless, and the exact cosine verify governs the output at any
    // nprobe, so paying full KMeans convergence buys nothing
    val model = IvfIndex.train(df, vecCol, ncentroids, metric = "cosine",
      seed = seed, maxIter = 8)
    val corpus = IvfIndex.assign(
      df.select(col(idCol).as("_id_c"), col(vecCol).as("_v_c"))
        .filter(col("_v_c").isNotNull), "_v_c", model)
    val probes = df
      .select(col(idCol).as("_id_q"), col(vecCol).as("_v_q"))
      .filter(col("_v_q").isNotNull)
    neardupJoin(probes, corpus, model, threshold, nprobe)
  }

  /** Search half of [[embeddingNearDupKnn]] over a PREBUILT `list_id`
    * assignment — the reference's build-vs-search lifecycle split
    * (`internal/engine/engine.cc:972-1012`: index BUILD is a separate
    * step; SEARCH never trains). `corpus` is an
    * [[graft.sources.IndexStore.neardupIvf]] layout carrying `idCol`,
    * `vecCol` and `list_id` assigned by `model`; query-time work is the
    * probe-explode → equi-join → exact cosine verify only. Output is
    * identical to the in-query-train path for the same model config —
    * and at nprobe = ncentroids identical REGARDLESS of the model, since
    * every list is probed and the exact verify governs the pairs.
    */
  def embeddingNearDupKnnPrebuilt(
      corpus: DataFrame,
      model: IvfIndex.Model,
      idCol: String,
      vecCol: String,
      threshold: Double,
      nprobe: Int): DataFrame = {
    val assigned = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("_id_c"), col(vecCol).as("_v_c"), col("list_id"))
    val probes = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("_id_q"), col(vecCol).as("_v_q"))
    neardupJoin(probes, assigned, model, threshold, nprobe)
  }

  /** Shared probe-join + exact-verify tail: candidates from a `list_id`
    * EQUI-JOIN (hash-partitioned both sides, never a BNLJ), unordered
    * pairs canonicalized AFTER the threshold filter.
    */
  private def neardupJoin(
      probes: DataFrame,
      corpus: DataFrame,
      model: IvfIndex.Model,
      threshold: Double,
      nprobe: Int): DataFrame = {
    val probed = probes.withColumn("list_id", explode(graft.Graft.columnOf(
      graft.functions.IvfProbeLists(graft.Graft.exprOf(col("_v_q")),
        model.centroids, math.min(nprobe, model.ncentroids), model.metric))))
    probed.join(corpus, Seq("list_id"))
      .filter(col("_id_q") =!= col("_id_c"))
      .withColumn("cos", graft.Graft.F.vecCosine(col("_v_q"), col("_v_c")))
      .filter(col("cos") >= threshold)
      .select(least(col("_id_q"), col("_id_c")).as("id_a"),
        greatest(col("_id_q"), col("_id_c")).as("id_b"), col("cos"))
      .dropDuplicates("id_a", "id_b")
  }

  /** Random-hyperplane LSH for embedding near-dup: sign bits of dot
    * products with `numPlanes` fixed pseudo-random hyperplanes form the
    * bucket key; only within-bucket pairs are scored exactly. Recall
    * rises with fewer planes per table and more tables; `numTables`
    * repetitions OR-combine. No false positives (exact verify).
    *
    * Scale policy: with a FIXED plane count, bucket count is constant, so
    * per-bucket occupancy — and the within-bucket pair join — grows
    * QUADRATICALLY with the corpus (measured 17× wall-clock at 10× rows,
    * BENCH_SCALING round-11). `targetBucketRows` derives the plane count
    * from the corpus instead: planes = max(numPlanes,
    * ceil(log2(n / target))), keeping expected occupancy ≈ target and
    * total candidate work ≈ numTables · n · target — LINEAR in n, the
    * same shards-∝-corpus policy as the clustered HNSW layout. The
    * per-table collision probability falls as planes grow (p^planes), so
    * at a held recall target `numTables` is the knob that pays for scale;
    * for true near-dup thresholds (cos ≥ 0.9) the default 8 tables hold
    * recall ≥ 0.9 through 9-plane tables.
    */
  def embeddingNearDupLsh(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double,
      numPlanes: Int = 8,
      numTables: Int = 4,
      seed: Long = 42L,
      targetBucketRows: Option[Long] = None,
      // deterministic-oracle operating point: caller-supplied plane
      // vectors (e.g. corpus rows) whose BIT DECISION runs in the int8-
      // quantized domain — integer dot signs are bit-for-bit replayable
      // by a SQL oracle (no float-accumulation sign flips), and the
      // quantized projection is 4x cheaper per bit at scale. Candidate
      // semantics unchanged: buckets only GENERATE pairs, the exact
      // cosine verify below decides membership.
      quantPlanes: Option[Seq[Seq[Array[Float]]]] = None): DataFrame = {
    // caller-supplied tables must each be non-empty and fit the long
    // bucket key — checking only the FIRST table would let a >62-plane
    // table silently wrap `1L << i` into bogus bucket collisions
    quantPlanes.foreach(tbls => require(
      tbls.nonEmpty && tbls.forall(t => t.nonEmpty && t.size <= 62),
      s"quantPlanes needs >=1 table of 1..62 planes each, " +
        s"got sizes ${tbls.map(_.size).mkString("[", ",", "]")}"))
    val effPlanes = quantPlanes.map(_.head.size).getOrElse(targetBucketRows match {
      case Some(t) =>
        val n = df.count()
        val needed = math.ceil(math.log(math.max(1L, n / math.max(1L, t)).toDouble)
          / math.log(2.0)).toInt
        math.max(numPlanes, needed)
      case None => numPlanes
    })
    require(effPlanes <= 62, s"plane count $effPlanes overflows the long bucket key")
    // [[widen]] the (id, vector) projection once: the per-row bucket
    // computation (tables × planes dot products) and every downstream map
    // stage run at this relation's width — measured 8-task bucket stages
    // on 32 cores against a narrow local fixture. No-op at scale.
    val base = widen(df.select(col(idCol).as("id"), col(vecCol).as("_v")))
    val v = col("_v")
    val bucketCols = quantPlanes match {
      case Some(tbls) =>
        val vq = graft.Graft.F.quantizeI8(v)
        tbls.map { tbl =>
          val bits = tbl.zipWithIndex.map { case (p, i) =>
            val pCode = graft.functions.VecKernels.quantizeI8(
              new org.apache.spark.sql.catalyst.util.GenericArrayData(p))
            val d = Knn.scoreInt8("ip", vq, lit(pCode))
            when(d >= 0, lit(1L << i)).otherwise(0L)
          }
          bits.reduceLeft((a, b) => a.bitwiseXOR(b))
        }
      case None =>
        val rnd = new scala.util.Random(seed)
        // fixed hyperplanes as literal columns (tiny: tables × planes × dim)
        val planes: Seq[Seq[Array[Float]]] = Seq.fill(numTables)(
          Seq.fill(effPlanes)(Array.fill(dim)((rnd.nextGaussian()).toFloat)))
        planes.map { tbl =>
          val bits = tbl.zipWithIndex.map { case (p, i) =>
            val d = graft.Graft.F.vecDot(v, typedLit(p.toSeq).cast("array<float>"))
            when(d >= 0, lit(1L << i)).otherwise(0L)
          }
          bits.reduceLeft((a, b) => a.bitwiseXOR(b))
        }
    }
    // one exploded (table_idx, bucket) join instead of numTables
    // self-joins: buckets computed once per side, the join key is
    // (table, bucket) — identical candidate set, 1/numTables the scans.
    val keyed = base.select(col("id"), posexplode(array(bucketCols: _*)))
      .withColumnRenamed("pos", "t").withColumnRenamed("col", "bucket")
    val cand = keyed.as("a").join(keyed.as("b"), Seq("t", "bucket"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val vecs = base.select(col("id"), v.as("v"))
    cand
      .join(vecs.select(col("id").as("id_a"), col("v").as("v_a")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("v").as("v_b")), "id_b")
      .withColumn("cos", graft.Graft.F.vecCosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** Connected components over a near-dup pair list: every vertex gets the
    * MIN id reachable from it — the cluster label dedup canonicalization
    * needs (pairs alone don't answer "which copies form one group" when
    * duplicates chain A~B~C without A~C qualifying directly).
    *
    * Algorithm: alternating LARGE-STAR / SMALL-STAR (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14) — each round
    * rewires every vertex's strictly-larger (large-star) or
    * smaller-or-equal (small-star) neighbors to the minimum of its
    * neighborhood; the edge set converges to one star per component rooted
    * at the component minimum in O(log n) rounds on ANY graph shape, where
    * plain min-label propagation needs O(longest path to the min) — a 10k
    * path graph converges in ~5 rounds here vs 10k there. Each round is
    * two groupBy shuffles + one distinct; no driver-resident graph state
    * (the driver only compares a (count, hash) convergence fingerprint).
    * `localCheckpoint` per round truncates the growing lineage; round
    * N−1's blocks are freed as soon as round N materializes, so the loop
    * holds at most two generations of executor storage at any moment.
    * Vertex ids may be any orderable type (longs, strings).
    *
    * Output: (id, cc) for every id that appears in `pairs`.
    */
  def connectedComponents(
      pairs: DataFrame, aCol: String, bCol: String, maxIter: Int = 25,
      localEdgeLimit: Long = 100000L): DataFrame = {
    // Bounded local fast path (the Bpe ≤200k-word pattern): near-dup
    // edge sets are output-sized — usually orders of magnitude smaller
    // than the corpus — and the O(log n) loop's fixed per-round job costs
    // (4+ shuffles × rounds) dwarf a union-find over a few thousand
    // collected edges. ≤ localEdgeLimit edges (~1.6 MB at the default)
    // are solved on the driver, bit-identical to the loop (spec-asserted);
    // above the limit — the 100 TB regime — the distributed loop runs
    // unchanged. Integral id types only: Spark's min on strings is binary
    // UTF-8 order, which JVM String ordering does not match for
    // supplementary code points, so string ids always take the loop.
    // The edge count is one cheap job: every caller hands an eager
    // output-sized checkpoint (jaccardPairs/minhash/simhash contract).
    {
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val idType = pairs.schema(aCol).dataType
      val integral: Set[org.apache.spark.sql.types.DataType] =
        Set(ByteType, ShortType, IntegerType, LongType)
      if (localEdgeLimit > 0 && integral(idType) &&
          pairs.schema(bCol).dataType == idType) {
        val edges = pairs.select(col(aCol).cast("long"), col(bCol).cast("long"))
        if (edges.count() <= localEdgeLimit)
          return localComponents(pairs.sparkSession, edges, idType)
      }
    }
    val verts = pairs.select(col(aCol).as("id"))
      .union(pairs.select(col(bCol).as("id"))).distinct()
      .localCheckpoint(eager = true)
    var cur = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint(eager = true)
    try {
      // large-star: u's neighborhood min m = min(N(u) ∪ {u}) pulls every
      // neighbor v > u down to (v, m) — long chains halve in one round.
      // No distinct here: duplicates are harmless to smallStar's min
      // aggregate and its terminal distinct, so the round function stays
      // set→set while this saves one full shuffle per round.
      def largeStar(e: DataFrame): DataFrame = {
        val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
        val m = sym.groupBy("u").agg(least(min(col("v")), col("u")).as("m"))
        sym.join(m, "u").filter(col("v") > col("u"))
          .select(col("v").as("u"), col("m").as("v"))
          .filter(col("u") =!= col("v"))
      }
      // small-star: orient each edge large→small, pull u and its ≤-side
      // neighborhood onto its min — stars collapse onto their root
      def smallStar(e: DataFrame): DataFrame = {
        val dir = e.select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        val m = dir.groupBy("u").agg(min(col("v")).as("m"))
        dir.join(m, "u")
          .select(col("v").as("u"), col("m").as("v"))
          .union(m.select(col("u"), col("m").as("v")))
          .filter(col("u") =!= col("v")).distinct()
      }
      // convergence fingerprint in ONE action over checkpoint blocks
      // (bit_xor, not sum: a hash sum overflows Long and ANSI mode throws)
      def fingerprint(e: DataFrame): (Long, Long) = {
        val r = e.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v")))).head()
        (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
      }
      var fp = fingerprint(cur)
      var converged = cur.isEmpty
      var iter = 0
      while (!converged && iter < maxIter) {
        val nxt = smallStar(largeStar(cur)).localCheckpoint(eager = true)
        val nfp = fingerprint(nxt)
        Checkpoints.free(cur) // round N−1, fully consumed by nxt
        cur = nxt
        converged = nfp == fp
        fp = nfp
        iter += 1
      }
      require(converged, s"connectedComponents did not converge in $maxIter rounds")
      // converged edges are (child, root) stars; roots label themselves
      verts.join(cur.withColumnRenamed("u", "id"), Seq("id"), "left")
        .select(col("id"), coalesce(col("v"), col("id")).as("cc"))
        .localCheckpoint(eager = true)
    } finally {
      Checkpoints.free(verts)
      Checkpoints.free(cur)
    }
  }

  /** Driver-side union-find for [[connectedComponents]]'s bounded fast
    * path. Union-by-min (the larger root always attaches under the
    * smaller) makes every root its component's minimum id — the same
    * labeling the large-star/small-star loop converges to. Returns a
    * LocalRelation, so downstream joins broadcast it and
    * [[Checkpoints.free]] is a no-op on it (no LogicalRDD leaf).
    */
  private def localComponents(
      spark: org.apache.spark.sql.SparkSession,
      edges: DataFrame,
      idType: org.apache.spark.sql.types.DataType): DataFrame = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x // path compression
      while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.collect().foreach { row =>
      val (u, v) = (row.getLong(0), row.getLong(1))
      parent.getOrElseUpdate(u, u)
      parent.getOrElseUpdate(v, v)
      val (ru, rv) = (find(u), find(v))
      if (ru < rv) parent(rv) = ru else if (rv < ru) parent(ru) = rv
    }
    val out = parent.keysIterator.map(id => (id, find(id))).toSeq
    spark.createDataFrame(out).toDF("id", "cc")
      .select(col("id").cast(idType).as("id"), col("cc").cast(idType).as("cc"))
  }

  /** Per-document EXACT-SUBSTRING duplication signals over w-token
    * sliding windows (stride 1) — the shuffle-native formulation of
    * suffix-array substring dedup (Lee et al., "Deduplicating Training
    * Data Makes Language Models Better", ACL'22): any duplicated token
    * run of length ≥ w is witnessed by at least one duplicated w-token
    * window, so corpus-wide window-occurrence counting finds every such
    * span with no suffix array and no global sort. Complements
    * [[jaccardPairs]] (whole-doc similarity): this catches a boilerplate
    * paragraph pasted into thousands of otherwise-unrelated documents.
    *
    * Output per doc (all BIGINT, one row per input doc):
    * `n_tokens`, `n_windows` (= max(n_tokens − w + 1, 1); short docs
    * contribute their full token join as one window, so nothing is
    * silently skipped), `dup_windows` (window PLACEMENTS whose content
    * occurs ≥ minOcc times corpus-wide — total occurrences, so
    * self-repetition inside one doc counts as duplication too), and
    * `dup_tokens` (size of the union of token positions covered by
    * duplicated windows — the span a substring-dedup pass would cut).
    *
    * Scale notes (100 TB): window keys are the codegen'd 64-bit xxhash
    * kernel ([[graft.Graft.F.windowHashes]] — positional, one hash per
    * start), an 8-byte shuffle key; the windows relation is n_tokens rows
    * per doc, the same explode class [[jaccardPairs]] already carries.
    * Three shuffles: occurrence count (groupBy h), the mark-join (h),
    * per-doc re-aggregation (doc_id). The coverage explode multiplies
    * only DUPLICATED placements by w — sparse unless the corpus is mostly
    * boilerplate. A mega-hot window (site chrome) skews the mark-join's
    * h-partition; the aggregate side is one row per distinct window, so
    * the standard guards apply (broadcast the hot subset or salt the
    * join, cf. [[jaccardPairs]]'s df cap). Hash collisions can merge two
    * distinct windows (false "duplicate"): P ≈ (windows)²/2⁶⁵ — at 10¹²
    * windows that is ~2.7%-of-one-spurious-window territory, the standard
    * accepted risk of hashed substring dedup.
    *
    * The windows relation is DELIBERATELY not checkpointed (unlike the
    * pair operators' shared relations): it is consumed exactly twice
    * (occurrence aggregate, mark-join probe), and materializing a
    * corpus-token-sized relation to executor storage costs about as much
    * as the second pruned (doc_id, text) scan it would save; the pair
    * operators checkpoint because connected components re-reads them
    * O(log n) times.
    */
  def windowDupSignals(
      df: DataFrame,
      idCol: String,
      textCol: String,
      w: Int = 10,
      minOcc: Long = 2): DataFrame = {
    require(w >= 1, s"window width must be >= 1, got $w")
    require(minOcc >= 2, s"minOcc < 2 would mark every window duplicated")
    val toks = df
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("_toks"))
      .select(col("doc_id"), col("_toks"),
        size(col("_toks")).cast("long").as("n_tokens"))
    val wins = toks
      .select(col("doc_id"), col("n_tokens"),
        posexplode(graft.Graft.F.windowHashes(col("_toks"), w)))
      .select(col("doc_id"), col("n_tokens"),
        (col("pos") + 1).cast("long").as("start"), col("col").as("h"))
    val dupHashes = wins.groupBy("h")
      .agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= minOcc)
      .select("h")
    val dup = wins.join(dupHashes, "h")
    val dupCounts = dup.groupBy("doc_id")
      .agg(count(lit(1)).as("dup_windows"))
    // n_tokens >= 1 guard: an empty doc's single fallback window has no
    // token positions to cover, and sequence(1, 0) would count down
    val coverage = dup
      .filter(col("n_tokens") >= 1)
      .select(col("doc_id"), explode(sequence(col("start"),
        least(col("start") + (w - 1), col("n_tokens")))).as("p"))
      .distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("dup_tokens"))
    toks
      .select(col("doc_id"), col("n_tokens"),
        greatest(col("n_tokens") - (w - 1), lit(1L)).as("n_windows"))
      .join(dupCounts, Seq("doc_id"), "left")
      .join(coverage, Seq("doc_id"), "left")
      .na.fill(0L, Seq("dup_windows", "dup_tokens"))
  }

  /** Substring-dedup REMOVAL — the transform [[windowDupSignals]] only
    * measures: every duplicated w-token window placement except the
    * corpus-wide FIRST occurrence (min (doc_id, start), deterministic) is
    * cut, and each document's text is rebuilt from its surviving token
    * positions (Lee et al. ACL'22 §4.1 applied globally, keep-first
    * policy). Self-repetition inside one doc keeps only the first span;
    * a doc that is entirely boilerplate comes back empty.
    *
    * Output per doc: `n_tokens` (original), `removed_tokens` (union of
    * positions covered by cut placements), `text_clean` (surviving
    * tokens re-joined with single spaces — tokenization is
    * whitespace-normalizing, so exact byte-level reconstruction is out
    * of scope by contract).
    *
    * Scale notes: same three-shuffle shape as [[windowDupSignals]]; the
    * canonical-occurrence pick is a `min(struct(doc_id, start))` inside
    * the h-keyed aggregate — map-side combine, so a mega-hot window
    * never funnels its placements through one reducer for ranking. The
    * per-doc covered-position set is `collect_set` bounded by the doc's
    * own length (the data already holds the doc; its position set is no
    * bigger).
    */
  def stripDupWindows(
      df: DataFrame,
      idCol: String,
      textCol: String,
      w: Int = 10): DataFrame = {
    require(w >= 1, s"window width must be >= 1, got $w")
    val toks = df
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("_toks"))
      .select(col("doc_id"), col("_toks"),
        size(col("_toks")).cast("long").as("n_tokens"))
    val wins = toks
      .select(col("doc_id"), col("n_tokens"),
        posexplode(graft.Graft.F.windowHashes(col("_toks"), w)))
      .select(col("doc_id"), col("n_tokens"),
        (col("pos") + 1).cast("long").as("start"), col("col").as("h"))
    val firsts = wins.groupBy("h")
      .agg(count(lit(1)).as("occ"),
        min(struct(col("doc_id"), col("start"))).as("_first"))
      .filter(col("occ") >= 2)
      .select(col("h"),
        col("_first.doc_id").as("_fd"), col("_first.start").as("_fs"))
    val cut = wins.join(firsts, "h")
      .filter(!(col("doc_id") === col("_fd") && col("start") === col("_fs")))
    // n_tokens >= 1 guard: empty docs' fallback window covers no positions
    val cov = cut
      .filter(col("n_tokens") >= 1)
      .select(col("doc_id"), explode(sequence(col("start"),
        least(col("start") + (w - 1), col("n_tokens")))).as("p"))
      .groupBy("doc_id").agg(collect_set(col("p")).as("_cov"))
    // surviving positions via array_except (hash-set lookup, order of the
    // left array preserved): O(n_tokens) per doc. A per-token
    // array_contains against _cov is O(n_tokens · |cov|) — quadratic on
    // exactly the boilerplate-saturated docs this operator targets.
    // sequence() guard: sequence(1, 0) counts DOWN, so empty docs need
    // an explicit empty array.
    toks.join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(size(col("_cov")), lit(0)).cast("long").as("removed_tokens"),
        concat_ws(" ", transform(
          array_except(
            when(col("n_tokens") >= 1, sequence(lit(1L), col("n_tokens")))
              .otherwise(array().cast("array<bigint>")),
            coalesce(col("_cov"), array().cast("array<bigint>"))),
          p => element_at(col("_toks"), p.cast("int")))).as("text_clean"))
  }

  /** Cluster every document by its near-dup component: cluster_id = min id
    * in the component (docs in no pair are their own singleton cluster),
    * is_canonical marks the one row per cluster a dedup pass keeps.
    */
  /** SemDeDup (Abbas et al., arXiv:2303.09540): k-means the embedding
    * space, find near-dup pairs WITHIN each cluster (cos ≥ threshold),
    * connect them into components, and keep ONE representative per
    * component — the member LEAST similar to its cluster centroid (the
    * paper's keep-low-similarity policy: prefer the example farthest
    * from the cluster's semantic center), ties to the smallest id.
    *
    * Plan shape: candidate pairs are a `list_id` self-equi-join of the
    * assigned relation (the nprobe=1 special case of
    * [[embeddingNearDupKnn]] — same candidates, one model, no re-train);
    * components run large-star/small-star; the keep pick is a
    * `min(struct(sim, id))` inside a cluster-keyed aggregate — map-side
    * combinable, no per-cluster window sort. Centroids ride along as a
    * broadcast literal (ncentroids·dim floats).
    *
    * Output per input row: `id`, `list_id`, `cluster_id` (component
    * min-id), `centroid_sim`, `is_kept`. Null-vector rows pass through
    * as kept singletons (list_id −1, null centroid_sim).
    */
  def semanticDedup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      ncentroids: Int = 64,
      seed: Long = 42L): DataFrame = {
    val model = IvfIndex.train(df, vecCol, ncentroids, metric = "cosine",
      seed = seed, maxIter = 8)
    val assigned = IvfIndex.assign(
      df.select(col(idCol).as("id"), col(vecCol).as("_v"))
        .filter(col("_v").isNotNull), "_v", model)
    semanticDedupAssigned(df, idCol, vecCol, assigned, model, threshold)
  }

  /** [[semanticDedup]] over a PREBUILT `list_id` layout + model (an
    * [[graft.sources.IndexStore.neardupIvf]] build) — the same
    * build-vs-search split as [[embeddingNearDupKnnPrebuilt]]: query-time
    * work is the within-list pair join + components + keep pick, never
    * the KMeans fit. `df` is still the original corpus (the null-vector
    * passthrough contract reads it); `corpus` carries `idCol`, `vecCol`,
    * `list_id` assigned by `model`.
    */
  def semanticDedupPrebuilt(
      df: DataFrame,
      corpus: DataFrame,
      model: IvfIndex.Model,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val assigned = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), col(vecCol).as("_v"), col("list_id"))
    semanticDedupAssigned(df, idCol, vecCol, assigned, model, threshold)
  }

  /** Shared back half of [[semanticDedup]]: score centroid similarity,
    * within-list pairs, components, least-central keep, null passthrough.
    * `assigned` = `(id, _v, list_id)` with nulls already excluded.
    */
  private def semanticDedupAssigned(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      assigned: DataFrame,
      model: IvfIndex.Model,
      threshold: Double): DataFrame = {
    val cents = typedLit(model.centroids.map(_.toSeq).toSeq)
    // eager checkpoint: the assigned+scored relation feeds the pair
    // self-join (both sides), the component vertex set, and the final
    // labeling — without it the KMeans assignment recomputes per consumer.
    // The leaf stays in the returned plan, so the caller's
    // Checkpoints.free on the result releases it.
    val scored = assigned.withColumn("centroid_sim",
      graft.Graft.F.vecCosine(col("_v"),
        element_at(cents, (col("list_id") + 1).cast("int"))))
      .localCheckpoint(eager = true)
    // id < _id_c: cosine is symmetric and both join sides enumerate the
    // full list, so each unordered pair is generated (and its kernel
    // evaluated) exactly once — no mirror half to dropDuplicates away
    val pairs = scored.select(col("id"), col("_v"), col("list_id"))
      .join(scored.select(col("id").as("_id_c"), col("_v").as("_v_c"),
        col("list_id")), Seq("list_id"))
      .filter(col("id") < col("_id_c"))
      .withColumn("cos", graft.Graft.F.vecCosine(col("_v"), col("_v_c")))
      .filter(col("cos") >= threshold)
      .select(col("id").as("id_a"), col("_id_c").as("id_b"))
      .localCheckpoint(eager = true)
    // connectedComponents materializes its vertex/edge checkpoints from
    // `pairs` during the call, so the O(Σ cluster²) candidate join runs
    // once; afterwards the pairs blocks are dead weight — free them here
    // (clusters' result is its own checkpoint, lineage already truncated)
    val comp =
      try clusters(scored.select("id"), "id", pairs)
        .select(col("id"), col("cluster_id"))
      finally Checkpoints.free(pairs)
    val labeled = scored.join(comp, "id")
    val keep = labeled.groupBy("cluster_id")
      .agg(min(struct(col("centroid_sim"), col("id"))).as("_k"))
      .select(col("cluster_id"), col("_k").getField("id").as("_keep_id"))
    val scoredOut = labeled.join(keep, "cluster_id")
      .select(col("id"), col("list_id"), col("cluster_id"),
        col("centroid_sim"), (col("id") === col("_keep_id")).as("is_kept"))
    // null-vector rows pass through as kept singletons ("per input row"
    // contract): dropping them would silently remove those docs from a
    // caller's deduped corpus
    val nulls = df
      .filter(col(vecCol).isNull)
      .select(col(idCol).as("id"),
        lit(-1).cast(scoredOut.schema("list_id").dataType).as("list_id"),
        col(idCol).as("cluster_id"),
        lit(null).cast("double").as("centroid_sim"),
        lit(true).as("is_kept"))
    scoredOut.unionByName(nulls)
  }

  def clusters(
      df: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    val cc = connectedComponents(pairs, aCol, bCol)
    df.select(col(idCol).as("id"))
      .join(cc, Seq("id"), "left")
      .select(col("id"), coalesce(col("cc"), col("id")).as("cluster_id"))
      .withColumn("is_canonical", col("id") === col("cluster_id"))
  }
}
