package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("hashSample is deterministic, fraction-accurate, map-side") {
    val s1 = Sampling.hashSample(docs, $"doc_id", 0.3)
      .select($"doc_id").as[Long].collect().toSet
    val s2 = Sampling.hashSample(docs.repartition(7), $"doc_id", 0.3)
      .select($"doc_id").as[Long].collect().toSet
    assert(s1 == s2) // partitioning cannot change membership
    val n = docs.count().toDouble
    assert(math.abs(s1.size / n - 0.3) < 0.15) // md5 uniformity at small n
    // fraction bounds compose: a 0.1 sample is a subset of the 0.3 sample
    val s3 = Sampling.hashSample(docs, $"doc_id", 0.1)
      .select($"doc_id").as[Long].collect().toSet
    assert(s3.subsetOf(s1))
    // no shuffle in the plan: membership is a pure filter
    val plan = Sampling.hashSample(docs, $"doc_id", 0.3)
      .queryExecution.executedPlan
    assert(!plan.toString.contains("Exchange"))
  }

  test("stratifiedCap: per-stratum bound, salted == unsalted") {
    val capped = Sampling.stratifiedCap(docs, $"lang", $"doc_id", cap = 20)
    val byLang = capped.groupBy($"lang").count().as[(String, Long)].collect()
    assert(byLang.forall(_._2 <= 20))
    // strata smaller than the cap keep every row
    val sizes = docs.groupBy($"lang").count().as[(String, Long)].collect().toMap
    byLang.foreach { case (l, c) => assert(c == math.min(sizes(l), 20L)) }
    // the two-phase (salted) selection picks the IDENTICAL rows as the
    // single-window formulation — the pre-cap only prunes non-qualifiers
    val unsalted = Sampling.stratifiedCap(docs, $"lang", $"doc_id", 20, salt = 1)
      .select($"doc_id").as[Long].collect().toSet
    val salted = Sampling.stratifiedCap(docs, $"lang", $"doc_id", 20, salt = 16)
      .select($"doc_id").as[Long].collect().toSet
    assert(salted == unsalted)
  }

  test("temperatureSample: rates follow exponentiated shares, membership is hashSample's") {
    val alpha = 0.5; val frac = 0.3
    val got = Sampling.temperatureSample(docs, $"lang", $"doc_id", alpha, frac)
      .select($"doc_id", $"lang").as[(Long, String)].collect().toSet
    // re-derive the per-group rate locally and apply the same uniform
    val counts = docs.groupBy($"lang").count().as[(String, Long)].collect().toMap
    val n = counts.values.sum.toDouble
    val norm = counts.values.map(c => math.pow(c, alpha)).sum
    val rate = counts.map { case (l, c) =>
      l -> math.min(1.0, frac * n * (math.pow(c, alpha) / norm) / c) }
    val uni = docs.select($"doc_id", $"lang",
        Sampling.portableUniform($"doc_id").as("u"))
      .as[(Long, String, Double)].collect()
    val expected = uni.collect { case (id, l, u) if u < rate(l) => (id, l) }.toSet
    assert(got == expected)
    assert(got.nonEmpty && got.size < docs.count())
    // α = 1 degenerates to a plain uniform hash sample
    val prop = Sampling.temperatureSample(docs, $"lang", $"doc_id", 1.0, frac)
      .select($"doc_id").as[Long].collect().toSet
    val plain = Sampling.hashSample(docs, $"doc_id", frac)
      .select($"doc_id").as[Long].collect().toSet
    assert(prop == plain)
    // flattening: the rarest group's keep-RATE strictly exceeds the
    // most common group's at α < 1
    val kept = got.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    val (rareL, _) = counts.minBy(_._2); val (bigL, _) = counts.maxBy(_._2)
    assert(kept(rareL) / counts(rareL) > kept(bigL) / counts(bigL))
  }

  test("temperatureSample shuffles group counts, never the corpus") {
    // the scaladoc claim: one map-side-combinable group-count aggregate
    // (GROUP-CARDINALITY-sized shuffle) + a broadcast join back; the
    // corpus-sized pass is a map-side filter
    val n = 50000L
    val rec = shuffleRecords {
      val corpus = spark.range(n).select($"id",
        concat(lit("g"), $"id" % 5).as("grp"))
      Sampling.temperatureSample(corpus, $"grp", $"id",
        alpha = 0.5, targetFrac = 0.3).count()
    }
    assert(rec > 0, "expected the group-count aggregate to shuffle")
    assert(rec < 1000,
      s"$rec shuffle records for a $n-row corpus — the corpus itself shuffled")
  }

  test("mix composes hash samples per source") {
    val a = docs.filter($"doc_id" % 2 === 0)
    val b = docs.filter($"doc_id" % 2 === 1)
    val m = Sampling.mix(Seq((a, 1.0), (b, 0.5)), "doc_id")
    val ids = m.select($"doc_id").as[Long].collect().toSet
    val expectB = Sampling.hashSample(b, $"doc_id", 0.5)
      .select($"doc_id").as[Long].collect().toSet
    val aIds = a.select($"doc_id").as[Long].collect().toSet
    assert(ids == aIds ++ expectB)
  }
}
