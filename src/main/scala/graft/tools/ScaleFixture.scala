package graft.tools

import org.apache.spark.sql.functions._

import graft.Graft

/** Deterministic scale-up fixture generator for the scaling study
  * (BENCH_SCALING.md): documents + embeddings tables with the SAME
  * statistical shape as the driver's sf0.1 fixture, at `mult`× the rows.
  *
  * Shape matched from /root/testdata/sf0.1 (measured, see
  * BENCH_SCALING.md): 31-word vocabulary, token count uniform in
  * [10, 100], ~5% of documents are near-dup clones of an earlier doc
  * (1-token substitution — jaccard ≥ 0.9 for typical lengths), half the
  * clones additionally append a suffix (the near-containment shape),
  * langs en 40% / {zh,es,fr,de} 15% each, 20 sources; embeddings are
  * iid uniform in [-0.3, 0.3]^64 with labels 0..9 — the same
  * no-cluster-structure noise as the driver fixture (its cos ≥ 0.4
  * pairs are chance collisions, median 0.43, max 0.51).
  *
  * Everything derives from xxhash64(id, salt) — columnar, codegen'd, no
  * driver-side data generation, byte-identical across runs. Usage:
  *   runMain graft.tools.ScaleFixture <outDir> <mult>
  */
object ScaleFixture {

  private val Vocab = Seq("a", "agg", "batch", "big", "column", "customer",
    "data", "dup", "fast", "filter", "group", "hash", "join", "key", "line",
    "merge", "order", "part", "query", "row", "scan", "slow", "small",
    "sort", "spark", "stream", "table", "the", "value", "vector", "window")

  def main(args: Array[String]): Unit = {
    val out = args(0)
    val mult = args(1).toInt
    val spark = Graft.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._

    val nDocs = 5000L * mult
    val vocabArr = array(Vocab.map(lit): _*)
    val v = lit(Vocab.size)

    // ~5% of ids clone an earlier doc; srcId reaches up to 200 ids back
    val isClone = pmod(xxhash64($"id", lit(7)), lit(20)) === 0 && $"id" >= 50
    val srcId = when(isClone,
      $"id" - (pmod(xxhash64($"id", lit(11)), lit(200)) + 1)).otherwise($"id")
    // half the clones also append a suffix: the near-containment shape
    val withSuffix = isClone && pmod(xxhash64($"id", lit(19)), lit(2)) === 0
    val len = (pmod(xxhash64(col("_src"), lit(1)), lit(91)) + 10).cast("int")
    val baseToks = transform(sequence(lit(0), col("_len") - 1), k =>
      element_at(vocabArr,
        (pmod(xxhash64(col("_src"), k + lit(100)), v) + 1).cast("int")))
    // clone perturbation: substitute ONE token at an id-derived position
    val perturbPos = pmod(xxhash64($"id", lit(13)), col("_len").cast("long"))
    val toks = when(col("_clone"),
      transform(col("_toks"), (t, k) =>
        when(k.cast("long") === col("_pp"),
          element_at(vocabArr,
            (pmod(xxhash64($"id", lit(17)), v) + 1).cast("int"))).otherwise(t)))
      .otherwise(col("_toks"))
    val suffix = transform(
      sequence(lit(0), (pmod(xxhash64($"id", lit(23)), lit(20)) + 5).cast("int")),
      k => element_at(vocabArr,
        (pmod(xxhash64($"id", k + lit(500), lit(29)), v) + 1).cast("int")))
    val langs = array((Seq.fill(8)("en") ++ Seq.fill(3)("zh") ++
      Seq.fill(3)("es") ++ Seq.fill(3)("fr") ++ Seq.fill(3)("de")).map(lit): _*)

    val docs = spark.range(nDocs)
      .withColumn("_clone", isClone)
      .withColumn("_src", srcId)
      .withColumn("_len", len)
      .withColumn("_toks", baseToks)
      .withColumn("_pp", perturbPos)
      .withColumn("_toks", toks)
      .withColumn("_toks",
        when(withSuffix, concat(col("_toks"), suffix)).otherwise(col("_toks")))
      .select(
        $"id".as("doc_id"),
        array_join(col("_toks"), " ").as("text"),
        element_at(langs,
          (pmod(xxhash64($"id", lit(31)), lit(20)) + 1).cast("int")).as("lang"),
        concat(lit("src"), pmod(xxhash64($"id", lit(37)), lit(20))).as("source"))
      .withColumn("n_chars", length($"text"))
    docs.repartition(8).write.mode("overwrite").parquet(s"$out/documents.parquet")

    val nEmb = 2000L * mult
    val emb = spark.range(nEmb).select(
      $"id".as("vec_id"),
      transform(sequence(lit(0), lit(63)), j =>
        ((pmod(xxhash64($"id", j, lit(41)), lit(6000)).cast("double") / 10000.0)
          - 0.3).cast("float")).as("embedding"),
      pmod(xxhash64($"id", lit(43)), lit(10)).cast("int").as("label"))
    emb.repartition(8).write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    println(s"""{"fixture":"$out","mult":$mult,"docs":$nDocs,"embeddings":$nEmb}""")
    spark.stop()
  }
}
