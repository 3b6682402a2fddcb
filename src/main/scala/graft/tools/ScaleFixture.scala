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
  *   runMain graft.tools.ScaleFixture <outDir> <mult> [open]
  *
  * The optional `open` flag switches to an OPEN VOCABULARY: vocab size =
  * 31 × mult (synthetic tokens `w<i>`), so per-shingle document
  * frequency stays ~CONSTANT as the corpus grows — how real corpora
  * scale (new content mints new shingles). The default CLOSED vocabulary
  * (the driver fixture's own shape, 31 fixed words) makes per-shingle df
  * grow linearly with the corpus — the adversarial bound for candidate
  * joins. At mult = 1 the two modes coincide.
  */
object ScaleFixture {

  private val Vocab = Seq("a", "agg", "batch", "big", "column", "customer",
    "data", "dup", "fast", "filter", "group", "hash", "join", "key", "line",
    "merge", "order", "part", "query", "row", "scan", "slow", "small",
    "sort", "spark", "stream", "table", "the", "value", "vector", "window")

  def main(args: Array[String]): Unit = {
    val out = args(0)
    val mult = args(1).toInt
    val open = args.length > 2 && args(2) == "open"
    val spark = Graft.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._

    val nDocs = 5000L * mult
    val vocabArr = array(Vocab.map(lit): _*)
    val v = lit(Vocab.size * (if (open) mult else 1))
    // open mode synthesizes tokens directly from the hash (an array
    // lookup into a mult-scaled literal would re-evaluate the array per
    // element under interpreted HOFs); closed mode indexes the 31 words
    def tok(h: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      if (open) concat(lit("w"), pmod(h, v))
      else element_at(vocabArr, (pmod(h, v) + 1).cast("int"))

    // ~5% of ids clone an earlier doc; srcId reaches up to 200 ids back,
    // so the guard must be >= 200 or small ids "clone" ids that never
    // existed (negative srcId), silently deflating 1× near-dup density
    val isClone = pmod(xxhash64($"id", lit(7)), lit(20)) === 0 && $"id" >= 200
    val srcId = when(isClone,
      $"id" - (pmod(xxhash64($"id", lit(11)), lit(200)) + 1)).otherwise($"id")
    // half the clones also append a suffix: the near-containment shape
    val withSuffix = isClone && pmod(xxhash64($"id", lit(19)), lit(2)) === 0
    val len = (pmod(xxhash64(col("_src"), lit(1)), lit(91)) + 10).cast("int")
    val baseToks = transform(sequence(lit(0), col("_len") - 1), k =>
      tok(xxhash64(col("_src"), k + lit(100))))
    // clone perturbation: substitute ONE token at an id-derived position
    val perturbPos = pmod(xxhash64($"id", lit(13)), col("_len").cast("long"))
    val toks = when(col("_clone"),
      transform(col("_toks"), (t, k) =>
        when(k.cast("long") === col("_pp"),
          tok(xxhash64($"id", lit(17)))).otherwise(t)))
      .otherwise(col("_toks"))
    val suffix = transform(
      sequence(lit(0), (pmod(xxhash64($"id", lit(23)), lit(20)) + 5).cast("int")),
      k => tok(xxhash64($"id", k + lit(500), lit(29))))
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

    // `docsonly` skips the embeddings/events tables — the LLM-pipeline
    // stress needs only documents, and events at mult=1600 would be 160M
    // rows of dead weight
    val docsOnly = args.contains("docsonly")
    val nEmb = 2000L * mult
    val emb = spark.range(nEmb).select(
      $"id".as("vec_id"),
      transform(sequence(lit(0), lit(63)), j =>
        ((pmod(xxhash64($"id", j, lit(41)), lit(6000)).cast("double") / 10000.0)
          - 0.3).cast("float")).as("embedding"),
      pmod(xxhash64($"id", lit(43)), lit(10)).cast("int").as("label"))
    if (!docsOnly)
      emb.repartition(8).write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // events: matches the driver fixture's shape — 100k rows and 1.5k
    // users per sf0.1 (both scale with mult), 30 days of timestamps,
    // 5 uniform event types, exponential-ish value with mean ~50
    // (driver: mean 49.9, max 560). The driver has shipped TWO physical
    // `ts` encodings across fixture generations (epoch-ns BIGINT via
    // TIMESTAMP(NANOS)+nanosAsLong through round 7; µs TIMESTAMP_NTZ
    // since round 8) — SPARK_GRAFT_TS_ENCODING selects which one this
    // fixture emits ("ns_long" default | "timestamp" = µs TIMESTAMP_NTZ,
    // truncating the same ns instants), so the scaling study can
    // exercise both paths of SparkEntry.events()
    val nEv = 100000L * mult
    val nUsers = lit(1500L * mult)
    val baseNs = 1704067200000000000L // 2024-01-01T00:00:00Z
    val spanNs = 30L * 24 * 3600 * 1000000000L
    val u01 = (pmod(xxhash64($"id", lit(61)), lit(100000)).cast("double") +
      lit(1.0)) / 100001.0
    val types = array(Seq("click", "view", "purchase", "signup", "error").map(lit): _*)
    val events = spark.range(nEv).select(
      $"id".as("event_id"),
      (lit(baseNs) + pmod(xxhash64($"id", lit(59)), lit(spanNs))).as("ts"),
      pmod(xxhash64($"id", lit(53)), nUsers).as("user_id"),
      element_at(types,
        (pmod(xxhash64($"id", lit(57)), lit(5)) + 1).cast("int")).as("event_type"),
      least(round(-log(u01) * 50.0, 2), lit(560.21)).as("value"),
      concat(lit("""{"n":"""), pmod(xxhash64($"id", lit(67)), lit(100)),
        lit("}")).as("props"))
    // integer `div` (not Column `/`, which is double division — lossy at
    // 1.7e18 ns); TIMESTAMP_NTZ mirrors what the driver's µs fixtures
    // read back as under inferTimestampNTZ
    val eventsOut = sys.env.getOrElse("SPARK_GRAFT_TS_ENCODING", "ns_long") match {
      case "timestamp" =>
        events.withColumn("ts",
          expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      case _ => events
    }
    if (!docsOnly)
      eventsOut.repartition(8).write.mode("overwrite").parquet(s"$out/events.parquet")

    // TPC-H-ish tables at mult× the driver's sf0.1 row counts — same
    // columns/types/value domains (measured from /root/testdata/sf0.1),
    // hash-derived like everything else, with referential integrity
    // (custkey/orderkey/partkey/suppkey ranges line up). Enables a FULL
    // query-surface bench at sf1+ (the driver fixtures stop at sf0.1).
    if (args.contains("tpch")) {
      def h(c: org.apache.spark.sql.Column, salt: Int) = xxhash64(c, lit(salt))
      def money(c: org.apache.spark.sql.Column, salt: Int, lo: Double, hi: Double) =
        round(lit(lo) + pmod(h(c, salt), lit(1000000)).cast("double") / 1000000.0
          * (hi - lo), 2)
      val regions = Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
      spark.range(5).select($"id".cast("int").as("r_regionkey"),
        element_at(array(regions.map(lit): _*), ($"id" + 1).cast("int")).as("r_name"))
        .coalesce(1).write.mode("overwrite").parquet(s"$out/region.parquet")
      spark.range(25).select($"id".cast("int").as("n_nationkey"),
        concat(lit("NATION_"), $"id").as("n_name"),
        pmod($"id", lit(5)).cast("int").as("n_regionkey"))
        .coalesce(1).write.mode("overwrite").parquet(s"$out/nation.parquet")

      val nCust = 15000L * mult
      val nSupp = 1000L * mult
      val nPart = 20000L * mult
      val nOrd = 150000L * mult
      val segs = array(Seq("MACHINERY", "BUILDING", "HOUSEHOLD", "AUTOMOBILE",
        "FURNITURE").map(lit): _*)
      spark.range(nCust).select($"id".as("c_custkey"),
        concat(lit("Customer#"), format_string("%09d", $"id")).as("c_name"),
        pmod(h($"id", 101), lit(25)).cast("int").as("c_nationkey"),
        money($"id", 103, -999.99, 9999.99).as("c_acctbal"),
        element_at(segs, (pmod(h($"id", 107), lit(5)) + 1).cast("int")).as("c_mktsegment"))
        .repartition(8).write.mode("overwrite").parquet(s"$out/customer.parquet")
      spark.range(nSupp).select($"id".as("s_suppkey"),
        concat(lit("Supplier#"), format_string("%09d", $"id")).as("s_name"),
        pmod(h($"id", 109), lit(25)).cast("int").as("s_nationkey"),
        money($"id", 113, -999.99, 9999.99).as("s_acctbal"))
        .repartition(8).write.mode("overwrite").parquet(s"$out/supplier.parquet")
      val ptypes = array(Seq("STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY",
        "PROMO").map(lit): _*)
      val pmats = array(Seq("TIN", "NICKEL", "BRASS", "STEEL", "COPPER").map(lit): _*)
      spark.range(nPart).select($"id".as("p_partkey"),
        concat(element_at(vocabArr, (pmod(h($"id", 127), lit(31)) + 1).cast("int")),
          lit(" "),
          element_at(vocabArr, (pmod(h($"id", 131), lit(31)) + 1).cast("int"))).as("p_name"),
        concat(lit("Brand#"), pmod(h($"id", 137), lit(5)) + 1,
          pmod(h($"id", 139), lit(5)) + 1).as("p_brand"),
        concat(element_at(ptypes, (pmod(h($"id", 149), lit(6)) + 1).cast("int")),
          lit(" "),
          element_at(pmats, (pmod(h($"id", 151), lit(5)) + 1).cast("int"))).as("p_type"),
        (pmod(h($"id", 157), lit(50)) + 1).cast("int").as("p_size"),
        money($"id", 163, 900.0, 2000.0).as("p_retailprice"))
        .repartition(8).write.mode("overwrite").parquet(s"$out/part.parquet")

      // dates span the driver fixture's [1995-01-01, 2001-08-01] window
      val epoch95Us = 788918400000000L // 1995-01-01T00:00:00Z in µs
      val daySpan = 2404L
      val prios = array(Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
        "5-LOW").map(lit): _*)
      val statuses = array(Seq("O", "F", "P").map(lit): _*)
      spark.range(nOrd).select($"id".as("o_orderkey"),
        pmod(h($"id", 167), lit(nCust)).as("o_custkey"),
        element_at(statuses, (pmod(h($"id", 173), lit(3)) + 1).cast("int")).as("o_orderstatus"),
        money($"id", 179, 850.0, 560000.0).as("o_totalprice"),
        expr(s"cast(timestamp_micros($epoch95Us + " +
          s"(${86400000000L} * pmod(xxhash64(id, 181), $daySpan))) as timestamp_ntz)")
          .as("o_orderdate"),
        element_at(prios, (pmod(h($"id", 191), lit(5)) + 1).cast("int")).as("o_orderpriority"))
        .repartition(8).write.mode("overwrite").parquet(s"$out/orders.parquet")

      // 4 lines per order (TPC-H averages ~4), keys referencing the
      // generated orders/part/supplier ranges
      val rflags = array(Seq("A", "N", "R").map(lit): _*)
      val lstats = array(Seq("O", "F").map(lit): _*)
      spark.range(nOrd * 4).select(
        expr("id div 4").as("l_orderkey"),
        pmod(h($"id", 193), lit(nPart)).as("l_partkey"),
        pmod(h($"id", 197), lit(nSupp)).as("l_suppkey"),
        (pmod($"id", lit(4)) + 1).cast("int").as("l_linenumber"),
        (pmod(h($"id", 199), lit(50)) + 1).cast("double").as("l_quantity"),
        money($"id", 211, 1000.0, 100000.0).as("l_extendedprice"),
        (pmod(h($"id", 223), lit(11)).cast("double") / 100.0).as("l_discount"),
        (pmod(h($"id", 227), lit(9)).cast("double") / 100.0).as("l_tax"),
        element_at(rflags, (pmod(h($"id", 229), lit(3)) + 1).cast("int")).as("l_returnflag"),
        element_at(lstats, (pmod(h($"id", 233), lit(2)) + 1).cast("int")).as("l_linestatus"),
        expr(s"cast(timestamp_micros($epoch95Us + 86400000000 + " +
          s"(${86400000000L} * pmod(xxhash64(id, 239), ${daySpan + 94}))) as timestamp_ntz)")
          .as("l_shipdate"))
        .repartition(8).write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    }

    println(s"""{"fixture":"$out","mult":$mult,"open":$open,"docs":$nDocs,"embeddings":$nEmb,"events":$nEv,"tpch":${args.contains("tpch")}}""")
    spark.stop()
  }
}
