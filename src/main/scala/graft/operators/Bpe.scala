package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.TextOps.tokens

/** Distributed byte-pair-encoding trainer + segmenter (Sennrich et al.
  * ACL'16, sans end-of-word marker — merges act within words). The
  * scale trick is classic: ONE corpus-sized pass builds the weighted
  * DISTINCT-WORD relation; every merge round after that runs on the
  * vocab-sized table (corpus 100 TB, vocab ~10⁷ rows), so `numMerges`
  * rounds cost `numMerges` small jobs, not corpus passes. Driver state
  * is the merge list (bounded by `numMerges`) and one (pair, count) row
  * per round — never data.
  *
  * Greedy-leftmost pair application is a sequential fold per word; it
  * runs as an `aggregate` higher-order function over the symbols array
  * (vocab-sized table, not hot-path) during training, and as a
  * rank-driven kernel (broadcast merge-rank map — how runtime
  * tokenizers apply BPE) for corpus segmentation.
  */
object Bpe {

  // Spark's split keeps trailing empty matches — drop them or "" becomes
  // a symbol that merges learn against
  private def chars(c: Column): Column =
    filter(split(c, ""), s => length(s) > 0)

  /** Weighted adjacent-symbol pair counts over a (syms, freq) vocab
    * relation: Σ freq over every adjacent occurrence (a word with "aaa"
    * counts the (a,a) pair twice — raw occurrence counting; the greedy
    * merge then collapses leftmost-first).
    */
  def pairCounts(vocab: DataFrame): DataFrame = {
    val n = size(col("syms"))
    vocab
      .filter(n >= 2)
      .select(col("freq"),
        explode(arrays_zip(
          slice(col("syms"), lit(1), n - 1),
          slice(col("syms"), lit(2), n - 1))).as("p"))
      .groupBy(col("p").getField("0").as("a"), col("p").getField("1").as("b"))
      .agg(sum("freq").as("cnt"))
  }

  /** The weighted distinct-word relation: one corpus pass. */
  def vocab(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("w"), col("freq"), chars(col("w")).as("syms"))

  /** Greedy-leftmost merge of the (a, b) pair inside a symbols array —
    * the non-overlapping left fold ("aaa" + (a,a) → [aa, a]).
    */
  private def mergePair(syms: Column, a: String, b: String): Column = {
    val acc0 = array().cast("array<string>")
    aggregate(syms, acc0, (acc, x) =>
      when(size(acc) >= 1 &&
          element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))
  }

  /** Train `numMerges` merges. Returns the ordered merge list and the
    * final vocab relation (with merged `syms`). Deterministic: each
    * round picks max count, ties to the lexicographically smallest
    * (a, b). Rounds stop early when no pair reaches `minFreq`.
    * Vocabs of ≤ `localVocabThreshold` distinct words run the merge
    * loop driver-side on the collected (word, freq) relation — bounded
    * by the threshold, never by the corpus, and bit-identical to the
    * distributed path (spec-asserted); 0 disables the fast path.
    * The vocab table is `localCheckpoint`ed every `checkpointEvery`
    * rounds (lineage otherwise grows by one HOF per round); intermediate
    * generations are freed, the returned frame's blocks are the caller's
    * to release (`Checkpoints.free`) — the dedup-family contract.
    */
  def train(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      minFreq: Long = 2,
      checkpointEvery: Int = 8,
      localVocabThreshold: Long = 200000): (Seq[(String, String)], DataFrame) = {
    require(numMerges >= 1, s"numMerges must be >= 1: $numMerges")
    var v = vocab(df, textCol).localCheckpoint()
    // small-vocab fast path: when the DISTINCT-WORD relation is bounded
    // (same driver-collect contract as PQ codebook training — bounded by
    // the threshold, never by the corpus), the merge loop runs locally:
    // numMerges Spark jobs over a tiny table are pure scheduling
    // overhead, and the result is IDENTICAL (spec-asserted)
    if (localVocabThreshold > 0 && v.count() <= localVocabThreshold) {
      val spark = df.sparkSession
      val rows = v.select("w", "freq").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      Checkpoints.free(v)
      val syms = scala.collection.mutable.Map[String, Vector[String]]()
      rows.foreach { case (w, _) => syms(w) = w.map(_.toString).toVector }
      val merges = Seq.newBuilder[(String, String)]
      var r = 0
      var done = false
      while (r < numMerges && !done) {
        val counts = scala.collection.mutable.Map[(String, String), Long]()
        rows.foreach { case (w, f) =>
          val s = syms(w)
          var i = 0
          while (i < s.length - 1) {
            val p = (s(i), s(i + 1))
            counts(p) = counts.getOrElse(p, 0L) + f
            i += 1
          }
        }
        val eligible = counts.filter(_._2 >= minFreq)
        if (eligible.isEmpty) done = true
        else {
          val (pair, _) = eligible.minBy { case ((a, b), c) => (-c, a, b) }
          merges += pair
          val (a, b) = pair
          rows.foreach { case (w, _) =>
            val s = syms(w)
            if (s.length >= 2) {
              val out = Vector.newBuilder[String]
              var i = 0
              while (i < s.length) {
                if (i < s.length - 1 && s(i) == a && s(i + 1) == b) {
                  out += (a + b); i += 2
                } else { out += s(i); i += 1 }
              }
              syms(w) = out.result()
            }
          }
          r += 1
        }
      }
      import spark.implicits._
      val outVocab = rows.map { case (w, f) => (w, f, syms(w)) }.toSeq
        .toDF("w", "freq", "syms")
      return (merges.result(), outVocab)
    }
    var prev = v
    val merges = Seq.newBuilder[(String, String)]
    var r = 0
    var done = false
    while (r < numMerges && !done) {
      val top = pairCounts(v)
        .filter(col("cnt") >= minFreq)
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        v = v.withColumn("syms", mergePair(col("syms"), a, b))
        r += 1
        if (r % checkpointEvery == 0 || r == numMerges) {
          v = v.localCheckpoint()
          if (prev ne v) Checkpoints.free(prev)
          prev = v
        }
      }
    }
    (merges.result(), v)
  }

  /** Segment every document with a trained merge list: rank-driven
    * greedy application (always collapse the LOWEST-rank adjacent pair
    * first — the order the merges were learned), the standard runtime
    * BPE algorithm. The merge-rank map broadcasts with the closure;
    * per-row work is O(word_len · merges_hit). Output: the input plus
    * `bpe_tokens` (array of subword strings) and `n_bpe_tokens`.
    */
  def segment(
      df: DataFrame,
      textCol: String,
      merges: Seq[(String, String)],
      outCol: String = "bpe_tokens"): DataFrame = {
    val rank = merges.zipWithIndex.toMap
    val seg = udf((ws: Seq[String]) => (if (ws == null) Seq.empty[String] else ws).flatMap { w =>
      var syms = w.map(_.toString).toBuffer
      var go = syms.length >= 2
      while (go) {
        var best = Int.MaxValue; var at = -1
        var i = 0
        while (i < syms.length - 1) {
          val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
          if (r < best) { best = r; at = i }
          i += 1
        }
        if (at < 0) go = false
        else {
          syms(at) = syms(at) + syms(at + 1)
          syms.remove(at + 1)
          if (syms.length < 2) go = false
        }
      }
      // flatMap, not per-word Seq concat: a left-fold of immutable ++
      // copies the accumulated prefix per word — quadratic in doc length
      syms.toSeq
    })
    df.withColumn(outCol, seg(tokens(col(textCol))))
      .withColumn(s"n_$outCol", size(col(outCol)))
  }
}
