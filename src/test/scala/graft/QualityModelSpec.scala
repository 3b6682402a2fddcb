package graft

import org.apache.spark.sql.functions._
import graft.operators.QualityModel

class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  // planted corpus: diverse "clean" docs vs degenerate repetition docs
  private lazy val planted = {
    val vocab = Seq("alpha", "brick", "cloud", "delta", "ember", "frost",
      "grain", "haven", "ivory", "joule", "krill", "lumen", "maple", "noble")
    val clean = (0 until 40).map { i =>
      val words = (0 until 30).map(j => vocab((i * 7 + j * 3) % vocab.size))
      (i.toLong, words.mkString(" "), 1.0)
    }
    // junk uses its own token space (spam-class vocabulary), the signal a
    // linear BoW model actually separates on — magnitude alone is
    // linearly inseparable when both classes share every word
    val spam = Seq("zzclick", "zzbuy", "zzfree", "zzwin", "zzcash", "zzdeal",
      "zzbonus", "zzspin", "zzloan", "zzpill", "zzad", "zzpromo", "zzsale", "zzvip")
    val junk = (0 until 40).map { i =>
      val words = (0 until 30).map(j => spam((i * 5 + j) % spam.size))
      (100L + i, words.mkString(" "), 0.0)
    }
    (clean ++ junk).toDF("doc_id", "text", "label")
  }

  test("classifier separates diverse text from degenerate repetition") {
    val model = QualityModel.train(planted, "text", "label", logFeatures = 12)
    val scored = QualityModel.score(planted, model, "text")
    val by = scored.groupBy("label").agg(avg("quality_prob").as("p"))
      .as[(Double, Double)].collect().toMap
    assert(by(1.0) > 0.8, s"clean mean prob ${by(1.0)}")
    assert(by(0.0) < 0.2, s"junk mean prob ${by(0.0)}")
    // every row survives with its columns + the score
    assert(scored.count() == planted.count())
    assert(scored.columns.toSet == Set("doc_id", "text", "label", "quality_prob"))
  }

  test("scoring is map-side: no shuffle in the transform plan") {
    val model = QualityModel.train(planted, "text", "label", logFeatures = 12)
    val plan = QualityModel.score(planted, model, "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("weakLabels: deterministic tails, labels match the heuristic ordering") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val lab = QualityModel.weakLabels(docs, "text", frac = 0.25)
    val n = docs.count()
    val cnt = lab.groupBy("label").count().as[(Double, Long)].collect().toMap
    // each tail is ~25% (percentile ties can pull a few extra rows in)
    assert(cnt(1.0) >= n / 5 && cnt(0.0) >= n / 5, cnt.toString)
    assert(lab.count() <= n)
    // re-run picks the identical rows
    val a = lab.select("doc_id").as[Long].collect().toSet
    val b = QualityModel.weakLabels(docs, "text", frac = 0.25)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
    // end-to-end bootstrap: train on weak labels, score the corpus
    val model = QualityModel.train(lab, "text", "label", logFeatures = 12)
    val scored = QualityModel.score(docs, model, "text")
    assert(scored.count() == n)
    assert(scored.agg(min("quality_prob"), max("quality_prob"))
      .as[(Double, Double)].head() match { case (lo, hi) => lo >= 0.0 && hi <= 1.0 })
  }
}
