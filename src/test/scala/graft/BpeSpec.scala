package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bpe, Checkpoints}

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("train learns the planted frequent pair first; greedy fold is leftmost") {
    // "lo" dominates: low×40, lower×20 → (l,o) weighted 60
    val docs = (
      Seq.fill(40)("low") ++ Seq.fill(20)("lower") ++ Seq.fill(9)("newest")
    ).zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
    val (merges, vocab) = Bpe.train(docs, "text", numMerges = 4, minFreq = 2)
    try {
      assert(merges.head == ("l", "o"), merges.toString)
      assert(merges.size == 4)
      // after enough merges the dominant word collapses to one symbol
      val lowSyms = vocab.filter($"w" === "low").select("syms")
        .as[Seq[String]].head()
      assert(lowSyms == Seq("low"), lowSyms.toString)
    } finally Checkpoints.free(vocab)
  }

  test("merge fold is non-overlapping: aaa + (a,a) -> [aa, a]") {
    val docs = Seq((1L, "aaa aaa aaa")).toDF("id", "text")
    val (merges, vocab) = Bpe.train(docs, "text", numMerges = 1, minFreq = 2)
    try {
      assert(merges == Seq(("a", "a")))
      val syms = vocab.filter($"w" === "aaa").select("syms").as[Seq[String]].head()
      assert(syms == Seq("aa", "a"), syms.toString)
    } finally Checkpoints.free(vocab)
  }

  test("local fast path == distributed path (merges and merged vocab)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val (mLocal, vLocal) = Bpe.train(docs, "text", numMerges = 12)
    val (mDist, vDist) = Bpe.train(docs, "text", numMerges = 12,
      localVocabThreshold = 0)
    try {
      assert(mLocal == mDist)
      val a = vLocal.select("w", "syms").as[(String, Seq[String])].collect().toMap
      val b = vDist.select("w", "syms").as[(String, Seq[String])].collect().toMap
      assert(a == b)
    } finally { Checkpoints.free(vLocal); Checkpoints.free(vDist) }
  }

  test("rank-0 merge equals the pair-count argmax (the q_bpe_pairs twin)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val top = Bpe.pairCounts(Bpe.vocab(docs, "text"))
      .orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
      .select("a", "b").as[(String, String)].head()
    val (merges, vocab) = Bpe.train(docs, "text", numMerges = 1)
    Checkpoints.free(vocab)
    assert(merges.head == top)
  }

  test("segment applies ranks in learned order and reconstructs the text") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(100)
    val (merges, vocab) = Bpe.train(docs, "text", numMerges = 20, minFreq = 2)
    Checkpoints.free(vocab)
    val seg = Bpe.segment(docs, "text", merges)
    // concatenated subwords == concatenated original tokens, every doc
    val bad = seg.filter(
      concat_ws("", col("bpe_tokens")) =!=
        concat_ws("", graft.operators.TextOps.tokens(col("text"))))
    assert(bad.count() == 0)
    // merges actually compress: fewer bpe tokens than characters
    val (nb, nc) = seg.agg(sum("n_bpe_tokens"), sum(length(regexp_replace(col("text"), "\\s+", ""))))
      .as[(Long, Long)].head()
    assert(nb < nc, s"bpe $nb vs chars $nc")
    // early stop: an impossible minFreq yields no merges
    val (none, v2) = Bpe.train(docs.limit(2), "text", numMerges = 5, minFreq = 1000000L)
    Checkpoints.free(v2)
    assert(none.isEmpty)
    // null text segments to an empty token list, not an NPE
    val withNull = Seq((1L, "ab ab"), (2L, null.asInstanceOf[String])).toDF("id", "text")
    val segN = Bpe.segment(withNull, "text", merges)
      .select("id", "n_bpe_tokens").as[(Long, Int)].collect().toMap
    assert(segN(2L) == 0)
  }
}
