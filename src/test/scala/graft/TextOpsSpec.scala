package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount / subwordCount") {
    val d = Seq(("hello world foo", 3), ("one,two; three!", 3)).toDF("text", "nws")
    val r = d.select(TextOps.tokenCount($"text"), TextOps.subwordCount($"text")).collect()
    assert(r(0).getInt(0) == 3)
    assert(r(1).getInt(0) == 2)       // whitespace: "one,two;" "three!"
    assert(r(1).getInt(1) == 6)       // subwords: one , two ; three !
    assert(r(0).getInt(1) == 3)
  }

  test("qualityFeatures on a known string") {
    val r = Seq("the cat, and a dog!").toDF("text")
      .select(TextOps.qualityFeatures($"text", TextOps.EnStopwords).as("q"))
      .select($"q.n_tokens", $"q.avg_token_len", $"q.stopword_ratio", $"q.punct_ratio")
      .head()
    assert(r.getInt(0) == 5)                              // the cat, and a dog!
    assert(math.abs(r.getDouble(2) - 3.0 / 5) < 1e-9)     // the, and, a
    assert(math.abs(r.getDouble(3) - 2.0 / 19) < 1e-9)    // ',' and '!'
  }

  test("langId picks the dominant marker language") {
    val d = Seq(
      "the cat is on the mat and it was good",
      "der hund ist nicht mit der katze und das haus",
      "le chat est dans la maison pour les amis",
      "el perro es una mascota para los amigos que no",
      "xyzzy plugh quux").toDF("text")
    val r = d.select(TextOps.langId($"text")).as[String].collect().toSeq
    assert(r == Seq("en", "de", "fr", "es", "und"))
  }

  test("fingerprints: exact equality and sketch overlap") {
    val d = Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h"), (3L, "q w e r t y u i"))
      .toDF("id", "text")
    val fp = d.select($"id", TextOps.exactFingerprint($"text").as("f")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L) && fp(1L) != fp(3L))
    val sk = d.select($"id", TextOps.fingerprintSketch($"text", 3, 4).as("s")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sk(1L) == sk(2L))
    assert(sk(1L).intersect(sk(3L)).isEmpty)
  }

  test("profile runs over the fixture corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = TextOps.profile(docs, "doc_id", "text")
    assert(p.count() == docs.count())
    // word-soup corpus is english-flavored: no de/fr/es predictions dominate
    val langs = p.groupBy("lang_pred").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(langs.keySet.subsetOf(Set("en", "und", "de", "fr", "es")))
  }

  test("qualityQuantiles: exact percentile = hand-computed interpolation") {
    import org.apache.spark.sql.functions.col
    // 5 values in one stratum: p50 of [1,2,3,4,100] = 3; p75 = 4·0.? →
    // index 0.75·(5−1)=3 → 4+0·(100−4)=4... use p90: index 3.6 → 4 + 0.6·96
    val d = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 100.0))
      .toDF("s", "v")
    val r = TextOps.qualityQuantiles(d, col("s"), col("v"), Seq(0.5, 0.9))
      .head()
    assert(r.getLong(1) == 5L)
    assert(r.getDouble(2) == 3.0)          // p50
    assert(math.abs(r.getDouble(3) - (4.0 + 0.6 * 96.0)) < 1e-9) // p90 interpolated
    // the approx path runs and stays within the value range
    val a = TextOps.qualityQuantiles(d, col("s"), col("v"), Seq(0.5),
      exact = false).head().getDouble(2)
    assert(a >= 1.0 && a <= 100.0)
  }

  test("repetitionSignals: hand-computed fractions, single-token edge") {
    val r = Seq("a b a b a c", "x").toDF("text")
      .select(TextOps.repetitionSignals($"text").as("r"))
      .select($"r.n_tokens", $"r.distinct_frac", $"r.top_unigram_frac",
        $"r.top_bigram_frac")
      .collect()
    // "a b a b a c": 6 tokens, 3 distinct, top unigram a×3,
    // bigrams [a b, b a, a b, b a, a c] → top "a b"×2 of 5
    assert(r(0).getInt(0) == 6)
    assert(math.abs(r(0).getDouble(1) - 3.0 / 6) < 1e-9)
    assert(math.abs(r(0).getDouble(2) - 3.0 / 6) < 1e-9)
    assert(math.abs(r(0).getDouble(3) - 2.0 / 5) < 1e-9)
    // single token: no bigram, fraction pinned to 0 (not a [1,0] sequence)
    assert(r(1).getInt(0) == 1)
    assert(r(1).getDouble(3) == 0.0)
    // empty / whitespace-only text: all fractions 0, never NaN
    val e = Seq("", "   ").toDF("text")
      .select(TextOps.repetitionSignals($"text").as("r"))
      .select($"r.n_tokens", $"r.distinct_frac", $"r.top_unigram_frac",
        $"r.top_bigram_frac").collect()
    e.foreach { row =>
      assert(row.getInt(0) == 0)
      assert(row.getDouble(1) == 0.0 && row.getDouble(2) == 0.0 &&
        row.getDouble(3) == 0.0)
    }
  }

  test("property: repetitionSignals matches a scala reference") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("a", "b", "c", "ab", "xyz")
    val docs = (0 until 40).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))))
    }
    val rows = docs.map { case (i, t) => (i, t.mkString(" ")) }
      .toDF("id", "text")
      .select($"id", TextOps.repetitionSignals($"text").as("r"))
      .select($"id", $"r.n_tokens", $"r.distinct_frac",
        $"r.top_unigram_frac", $"r.top_bigram_frac")
      .collect().map(x => x.getLong(0) -> x).toMap
    docs.foreach { case (i, toks) =>
      val n = toks.size
      val row = rows(i)
      assert(row.getInt(1) == n)
      assert(math.abs(row.getDouble(2) - toks.distinct.size.toDouble / n) < 1e-9)
      val topUni = toks.groupBy(identity).values.map(_.size).max
      assert(math.abs(row.getDouble(3) - topUni.toDouble / n) < 1e-9)
      val expBi =
        if (n < 2) 0.0
        else toks.sliding(2).map(_.mkString(" ")).toSeq
          .groupBy(identity).values.map(_.size).max.toDouble / (n - 1)
      assert(math.abs(row.getDouble(4) - expBi) < 1e-9)
    }
  }

  test("normalize: NFC, accent strip, lowercase, whitespace collapse") {
    // decomposed (E + combining acute U+0301) and precomposed (U+00C9)
    // normalize to the same output; accents strip; whitespace collapses
    val d = Seq(
      "CAFE\u0301  et  the\u0301",   // decomposed accents, double spaces
      "CAF\u00c9 ET TH\u00c9",       // precomposed uppercase
      "  plain   ascii\ttext  "
    ).toDF("text")
    val r = d.select(TextOps.normalize($"text")).as[String].collect()
    assert(r(0) == "cafe et the")
    assert(r(1) == "cafe et the")   // both forms converge
    assert(r(2) == "plain ascii text")
    // stripAccents=false keeps the accent, NFC-composed from either form
    val keep = Seq("CAFE\u0301", "CAF\u00c9").toDF("text")
      .select(TextOps.normalize($"text", stripAccents = false))
      .as[String].collect()
    assert(keep(0) == "caf\u00e9" && keep(1) == "caf\u00e9")
  }

  test("unigramLogProb: hand-computed MLE distribution") {
    // corpus: a=2, b=2, c=1, N=5 → p(a)=p(b)=0.4, p(c)=0.2
    val d = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val r = TextOps.unigramLogProb(d, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(math.abs(r(1L) - math.log10(0.4)) < 1e-9)
    assert(math.abs(r(2L) - (math.log10(0.4) + math.log10(0.2)) / 2) < 1e-9)
  }

  test("tfidfKeywords: hand-computed scores and deterministic ranks") {
    // N=2; df: apple=1, banana=2, cherry=1
    val d = Seq((1L, "apple apple banana"), (2L, "banana cherry"))
      .toDF("doc_id", "text")
    val r = TextOps.tfidfKeywords(d, "doc_id", "text", k = 2)
      .collect().map(x => (x.getLong(0), x.getInt(1)) ->
        ((x.getString(2), x.getDouble(4)))).toMap
    val ln2 = math.log(2.0)
    assert(r((1L, 1))._1 == "apple" && math.abs(r((1L, 1))._2 - 2 * ln2) < 1e-9)
    assert(r((1L, 2))._1 == "banana" && r((1L, 2))._2 == 0.0) // ln(2/2) = 0
    assert(r((2L, 1))._1 == "cherry" && math.abs(r((2L, 1))._2 - ln2) < 1e-9)
    assert(r((2L, 2))._1 == "banana")
  }

  test("decontaminate: benchmark overlap counts, zero for clean docs") {
    val corpus = Seq(
      (1L, "w1 w2 w3 w4"),      // trigrams {w1 w2 w3, w2 w3 w4} — 1 hits bench
      (2L, "z1 z2 z3 z4")       // clean
    ).toDF("doc_id", "text")
    val bench = Seq("w1 w2 w3 q7 q8").toDF("text")
    val r = TextOps.decontaminate(corpus, "doc_id", "text", bench, "text", 3)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getInt(3)))).toMap
    assert(r(1L) == ((2L, 1L, 1)))
    assert(r(2L) == ((2L, 0L, 0)))
  }

  test("shingleNovelty: shared trigrams counted against the corpus") {
    val d = Seq(
      (1L, "w1 w2 w3 w4"),      // trigrams: {w1 w2 w3, w2 w3 w4}
      (2L, "w1 w2 w3 w9"),      // shares "w1 w2 w3" with doc 1
      (3L, "z1 z2 z3 z4")       // shares nothing
    ).toDF("doc_id", "text")
    val r = TextOps.shingleNovelty(d, "doc_id", "text", n = 3)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r(1L) == ((2L, 1L, 0.5)))
    assert(r(2L) == ((2L, 1L, 0.5)))
    assert(r(3L) == ((2L, 0L, 0.0)))
  }

  test("pii: detection counts and ordered redaction placeholders") {
    val d = Seq(
      (1L, "mail a.b@x.io or 10.0.0.1 call 555-1234"),
      (2L, "two mails p@q.com r@s.net"),
      (3L, "clean text with 1234 and a-b")
    ).toDF("id", "text")
    val r = d.select($"id", TextOps.piiSignals($"text").as("p"),
        TextOps.redactPii($"text").as("red"))
      .orderBy("id").collect()
    assert(r(0).getStruct(1).getInt(0) == 1) // email
    assert(r(0).getStruct(1).getInt(1) == 1) // ip
    assert(r(0).getStruct(1).getInt(2) == 1) // phone
    assert(r(0).getString(2) == "mail <EMAIL> or <IP> call <PHONE>")
    assert(r(1).getStruct(1).getInt(0) == 2)
    assert(r(1).getString(2) == "two mails <EMAIL> <EMAIL>")
    assert(r(2).getStruct(1) == org.apache.spark.sql.Row(0, 0, 0))
    assert(r(2).getString(2) == "clean text with 1234 and a-b")
  }
}
