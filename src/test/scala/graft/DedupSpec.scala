package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet").cache()

  test("shingles: counts and short-doc fallback") {
    val d = Seq("a b c d", "a b").toDF("text")
    val r = d.select(Dedup.shingles($"text", 3).as("s")).collect()
    assert(r(0).getSeq[String](0) == Seq("a b c", "b c d"))
    assert(r(1).getSeq[String](0) == Seq("a b")) // shorter than n → whole doc
  }

  test("exact dedup groups identical texts") {
    val d = Seq((1L, "same text"), (2L, "same text"), (3L, "other")).toDF("id", "text")
    val r = Dedup.exact(d, "id", "text").orderBy("keep_id")
      .select("keep_id", "dup_cnt").as[(Long, Long)].collect().toSeq
    assert(r == Seq((1L, 2L), (3L, 1L)))
  }

  test("jaccardPairs finds planted near-dups, exact values") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .orderBy("id_a").collect()
    assert(pairs.nonEmpty, "fixture should contain planted near-duplicates")
    pairs.foreach(p => assert(p.getAs[Double]("jaccard") >= 0.8))
  }

  test("minhash LSH: no false positives, high recall vs exact join") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 16, 8, 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), "LSH output is exact-verified — no false positives")
    assert(lsh.size >= (exact.size * 0.9).toInt,
      s"LSH recall too low: ${lsh.size}/${exact.size}")
  }

  test("containmentPairs: catches doc-inside-doc that jaccard misses; matches brute force") {
    // doc 2 = doc 1's text embedded in a much longer doc: containment of
    // 1-in-2 is ~1.0 while jaccard is low
    val long = (1 to 60).map(i => s"filler$i").mkString(" ")
    val short = "alpha beta gamma delta epsilon zeta"
    val d = Seq((1L, short), (2L, s"$short $long"), (3L, "unrelated totally different words"))
      .toDF("id", "text")
    val cont = Dedup.containmentPairs(d, "id", "text", 3, 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(cont.contains((1L, 2L)))
    val jacc = Dedup.jaccardPairs(d, "id", "text", 3, 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!jacc.contains((1L, 2L)), "jaccard should miss the containment pair")

    // brute-force equivalence on the fixture corpus: shingle sets via the
    // same kernel, overlap/min computed driver-side
    val docs200 = docs.limit(200)
    val sets = docs200.select($"doc_id",
      graft.Graft.F.shingleHashes(Dedup.tokens($"text"), 3).as("ss"))
      .as[(Long, Seq[Long])].collect().toMap
    val want = (for {
      (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq if a < b
      common = sa.toSet.intersect(sb.toSet).size
      if common.toDouble / math.min(sa.size, sb.size) >= 0.8
    } yield (a, b)).toSet
    val got = Dedup.containmentPairs(docs200, "doc_id", "text", 3, 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == want)
  }

  test("containment candidate generation is an equi-join, not cartesian") {
    import graft.operators.Checkpoints
    val (plan, cps) = Dedup.containmentPairsPlan(docs, "doc_id", "text", 3, 0.8)
    try {
      val p = plan.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"))
      assert(!p.contains("BroadcastNestedLoopJoin"))
    } finally cps.foreach(Checkpoints.free)
  }

  test("jaccardPairs maxShingleDf cap drops only hot shingles") {
    // with a cap of 1 every shared shingle is dropped → no pairs
    val capped = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8, maxShingleDf = Some(1))
    assert(capped.isEmpty)
  }

  test("simhash: identical text → same hash; near-dup → small hamming") {
    val d = Seq((1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy cat again and again"),
      (4L, "completely different words entirely unrelated content here now"))
      .toDF("id", "text")
    val h = d.select($"id", Dedup.simhash($"text").as("h")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(2L))
    assert(java.lang.Long.bitCount(h(1L) ^ h(3L)) <= 12)
    assert(java.lang.Long.bitCount(h(1L) ^ h(4L)) > 12)
  }

  test("simhashPairs finds planted near-dups via chunk join") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", 3).collect()
    assert(pairs.nonEmpty)
    pairs.foreach(p => assert(p.getAs[Number]("hamming").longValue <= 3))
  }

  test("simhashPairs: many identical short docs complete without a quadratic bucket") {
    // 300 copies of the same short doc collapse to ONE distinct
    // fingerprint — the candidate join sees one row; the 300·299/2 true
    // pairs come from the output-sized intra-fingerprint expansion
    val d = ((0 until 300).map(i => (i.toLong, "tiny doc")) ++
      Seq((1000L, "a genuinely different long document with many words here"),
        (1001L, "a genuinely different long document with many words there")))
      .toDF("id", "text")
    val pairs = Dedup.simhashPairs(d, "id", "text", 3)
    assert(pairs.filter($"hamming" === 0).count() == 300L * 299 / 2)
    assert(pairs.filter($"hamming" > 3).isEmpty)
  }

  test("simhashPairs: hot-bucket sub-split path is lossless (cap=1 ≡ cap=huge)") {
    // cap=1 forces EVERY bucket through the sub-chunk path on both
    // variants — output must be identical to the uncapped plan
    val d = docs.limit(200)
    val base = Dedup.simhashPairs(d, "doc_id", "text", 3, hotBucketCap = Int.MaxValue)
      .select("id_a", "id_b", "hamming").collect().map(_.toSeq).toSet
    val split = Dedup.simhashPairs(d, "doc_id", "text", 3, hotBucketCap = 1)
      .select("id_a", "id_b", "hamming").collect().map(_.toSeq).toSet
    assert(split == base)
    val baseP = Dedup.simhashPairsPortable(d, "doc_id", "text", 3, hotBucketCap = Int.MaxValue)
      .select("id_a", "id_b", "hamming").collect().map(_.toSeq).toSet
    val splitP = Dedup.simhashPairsPortable(d, "doc_id", "text", 3, hotBucketCap = 1)
      .select("id_a", "id_b", "hamming").collect().map(_.toSeq).toSet
    assert(splitP == baseP)
  }

  test("embedding LSH near-dup: subset of exact, usable recall") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val exact = Dedup.embeddingNearDupExact(emb, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.embeddingNearDupLsh(emb, "vec_id", "embedding", 64, 0.4,
      numPlanes = 4, numTables = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact))
    if (exact.nonEmpty) assert(lsh.nonEmpty, "LSH found nothing")
  }

  test("embedding LSH near-dup: quantized-plane operating point stays a subset of exact") {
    // the deterministic-oracle point (q_embed_neardup_lsh): corpus rows
    // as planes, bit decisions in the int8 domain — same contract as the
    // gaussian path (candidates ∩ exact-cosine verify ⊆ exact pairs)
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val planeRows = emb.filter(col("vec_id") >= 100 && col("vec_id") < 132)
      .orderBy(col("vec_id")).select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val tbls = (0 until 8).map(t => (0 until 4).map(p => planeRows(t * 4 + p)).toSeq).toSeq
    val exact = Dedup.embeddingNearDupExact(emb, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.embeddingNearDupLsh(emb, "vec_id", "embedding", 64, 0.4,
      numTables = 8, quantPlanes = Some(tbls))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact))
    if (exact.nonEmpty) assert(lsh.nonEmpty, "quantized-plane LSH found nothing")
  }

  test("embedding LSH quantPlanes: malformed tables fail loud, not wrap") {
    // an empty tables list NPE'd on .head, and the 62-plane overflow
    // guard only checked the FIRST table — a later >62-plane table
    // silently wrapped `1L << i` into bogus bucket collisions
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    def run(tbls: Seq[Seq[Array[Float]]]) =
      Dedup.embeddingNearDupLsh(emb, "vec_id", "embedding", 64, 0.4,
        quantPlanes = Some(tbls))
    intercept[IllegalArgumentException] { run(Seq.empty) }
    intercept[IllegalArgumentException] { run(Seq(Seq.empty)) }
    val plane = Array.fill(64)(1.0f)
    intercept[IllegalArgumentException] {
      run(Seq(Seq(plane), Seq.fill(63)(plane))) // 2nd table overflows
    }
  }

  test("embeddingNearDupKnn: exact parity at nprobe=ncentroids") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val exact = Dedup.embeddingNearDupExact(emb, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val knn = Dedup.embeddingNearDupKnn(emb, "vec_id", "embedding", 0.4,
      ncentroids = 8, nprobe = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(knn == exact, "full-probe IVF near-dup must reproduce the all-pairs result")
  }

  test("candidate generation is equi-join, not cartesian") {
    // lazy-plan variant: the public API returns a materialized checkpoint
    // (whose plan is an opaque RDD scan), so plan evidence reads the
    // un-materialized plan and frees the intermediates itself.
    val (lsh, cps) = Dedup.minhashLshPairsPlan(docs, "doc_id", "text", 3, 16, 8, 0.8)
    try {
      val plan = lsh.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"cartesian in LSH plan:\n$plan")
    } finally cps.foreach(graft.operators.Checkpoints.free)
  }

  test("connectedComponents: chains merge, components stay separate") {
    // A~B~C chain (A-C not paired directly) + isolated pair D~E
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents works on string ids and longer chains") {
    val pairs = Seq(("d", "c"), ("c", "b"), ("b", "a"), ("x", "y"))
      .toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .as[(String, String)].collect().toMap
    assert(cc == Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a",
      "x" -> "x", "y" -> "x"))
  }

  test("connectedComponents: 10k-vertex path graph converges in O(log n) rounds") {
    // the worst case for min-label propagation (needs 10k rounds); the
    // large-star/small-star formulation must finish within the default
    // maxIter = 25 budget (~log2(10k) + constant). localEdgeLimit = 0
    // forces the DISTRIBUTED loop — the scale path this spec exists for.
    val pairs = spark.range(0L, 9999L).toDF("id_a")
      .withColumn("id_b", col("id_a") + 1)
    val cc = Dedup.connectedComponents(pairs, "id_a", "id_b", localEdgeLimit = 0)
    assert(cc.filter(col("cc") =!= 0L).count() == 0L,
      "every vertex of a path must label to the path minimum")
    assert(cc.count() == 10000L)
  }

  test("connectedComponents: bounded local fast path ≡ distributed loop") {
    // mixed shapes: a 100-vertex path, a 5-clique, an isolated pair,
    // reversed/duplicated edges — the fast path (≤ localEdgeLimit,
    // integral ids) must produce the exact labeling of the loop
    val edges =
      (0L until 99L).map(i => (i + 1, i)) ++ // reversed path edges
      (for (a <- 200L to 204L; b <- 200L until a) yield (a, b)) ++
      Seq((1000L, 1001L), (1000L, 1001L), (3L, 3L)) // dup + self-loop
    val pairs = edges.toDF("id_a", "id_b")
    val local = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    val dist = Dedup.connectedComponents(pairs, "id_a", "id_b", localEdgeLimit = 0)
      .as[(Long, Long)].collect().toMap
    assert(local == dist, s"fast path diverged from loop")
    assert(local(99L) == 0L && local(204L) == 200L && local(1001L) == 1000L)
  }

  test("connectedComponents: fast path ≡ loop on random graphs (3 seeds)") {
    for (seed <- Seq(11, 23, 47)) {
      val rnd = new scala.util.Random(seed)
      // sparse random graph over a 150-vertex id space: expected ~1.3
      // edges/vertex → a mix of singleton chains, trees, and merged
      // components; ids offset so 0 is not always the global min
      val edges = Seq.fill(200)((rnd.nextInt(150) + 7L, rnd.nextInt(150) + 7L))
      val pairs = edges.toDF("id_a", "id_b")
      val local = Dedup.connectedComponents(pairs, "id_a", "id_b")
        .as[(Long, Long)].collect().toMap
      val dist = Dedup.connectedComponents(pairs, "id_a", "id_b", localEdgeLimit = 0)
        .as[(Long, Long)].collect().toMap
      assert(local == dist, s"seed $seed: fast path diverged from loop")
    }
  }

  test("dedup operators free their checkpoint blocks (storage lifecycle)") {
    // Each pairs operator may leave ONE persisted RDD behind — its own
    // output-sized result checkpoint (freed by the context cleaner when
    // unreachable, the Ingest.conform contract) — never the corpus-scale
    // shingle/signature intermediates or per-round CC state.
    def persisted(): Int = spark.sparkContext.getPersistentRDDs.size
    docs.count() // settle the shared fixture cache before baselining
    val base = persisted()
    Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8).collect()
    assert(persisted() <= base + 1, "jaccardPairs leaked checkpoint blocks")
    val base2 = persisted()
    Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 16, 8, 0.8).collect()
    assert(persisted() <= base2 + 1, "minhashLshPairs leaked checkpoint blocks")
    val base3 = persisted()
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    Dedup.connectedComponents(pairs, "id_a", "id_b").collect()
    assert(persisted() <= base3 + 1, "connectedComponents leaked per-round checkpoints")
    val base4 = persisted()
    Dedup.simhashPairsPortable(docs, "doc_id", "text", 3).collect()
    assert(persisted() <= base4 + 1, "simhashPairs leaked its fingerprint checkpoint")
    val base5 = persisted()
    Dedup.containmentPairs(docs, "doc_id", "text", 3, 0.8).collect()
    assert(persisted() <= base5 + 1, "containmentPairs leaked checkpoint blocks")
  }

  test("consume-then-free: looping dedup calls keeps executor storage flat") {
    import graft.operators.Checkpoints
    def persisted(): Int = spark.sparkContext.getPersistentRDDs.size
    docs.count()
    val base = persisted()
    for (i <- 1 to 3) {
      val n = Checkpoints.consume(
        Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8))(_.count())
      assert(n >= 0)
      val m = Checkpoints.consume(
        Dedup.simhashPairsPortable(docs, "doc_id", "text", 3))(_.count())
      assert(m >= 0)
      // <=: the shared session's context cleaner may concurrently collect
      // PRIOR tests' unreferenced checkpoints, shrinking the count below
      // the baseline — growth is the only failure mode
      assert(persisted() <= base, s"storage grew after iteration $i")
    }
  }

  test("windowDupSignals: brute-force equivalence incl. self-repetition and short docs") {
    val w = 3
    val data = Seq(
      1L -> "a b c d e f",              // shares "b c d", "c d e" with doc 2
      2L -> "z b c d e q",
      3L -> "x x x x x x",              // self-repetition: every window identical
      4L -> "p q",                      // short doc (< w), duplicated whole
      5L -> "p q",
      6L -> "unique tokens only here now")
    val got = Dedup.windowDupSignals(data.toDF("doc_id", "text"), "doc_id", "text", w = w)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_windows", "dup_windows", "dup_tokens")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    def toks(s: String) = s.split("\\s+").filter(_.nonEmpty).toSeq
    val wins = data.flatMap { case (id, s) =>
      val t = toks(s); val n = t.length
      (1 to math.max(n - w + 1, 1)).map(i =>
        (id, i, t.slice(i - 1, math.min(i - 1 + w, n)).mkString(" ")))
    }
    val occ = wins.groupBy(_._3).view.mapValues(_.size).toMap
    val expected = data.map { case (id, s) =>
      val t = toks(s); val n = t.length
      val dups = wins.filter(x => x._1 == id && occ(x._3) >= 2)
      val covered = dups.flatMap(x => x._2 to math.min(x._2 + w - 1, n)).distinct.size
      (id, n.toLong, math.max(n - w + 1, 1).toLong, dups.size.toLong, covered.toLong)
    }
    assert(got == expected)
    // the planted shapes actually exercised each path
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(3L)._4 == 4L && byId(3L)._5 == 6L, "self-repetition counts")
    assert(byId(4L)._4 == 1L && byId(4L)._5 == 2L, "short-doc fallback window")
    assert(byId(6L)._4 == 0L && byId(6L)._5 == 0L, "unique doc unmarked")
  }

  test("stripDupWindows: brute-force keep-first removal, self-repetition, full wipe") {
    val w = 3
    val data = Seq(
      1L -> "a b c d e f",              // canonical holder of the shared span
      2L -> "z b c d e q",              // later occurrence: span cut
      3L -> "x x x x x x",              // self-repetition: keeps first window only
      4L -> "p q",                      // short dup pair: doc 5 wiped entirely
      5L -> "p q",
      6L -> "unique tokens only here now")
    val got = Dedup.stripDupWindows(data.toDF("doc_id", "text"), "doc_id", "text", w = w)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "removed_tokens", "text_clean")
      .as[(Long, Long, Long, String)].collect().toSeq
    def toks(s: String) = s.split("\\s+").filter(_.nonEmpty).toSeq
    val wins = data.flatMap { case (id, s) =>
      val t = toks(s); val n = t.length
      (1 to math.max(n - w + 1, 1)).map(i =>
        (id, i, t.slice(i - 1, math.min(i - 1 + w, n)).mkString(" ")))
    }
    val byWin = wins.groupBy(_._3)
    val expected = data.map { case (id, s) =>
      val t = toks(s); val n = t.length
      val cut = wins.filter { case (d, st, win) =>
        val g = byWin(win)
        g.size >= 2 && d == id && (d, st) != g.map(x => (x._1, x._2)).min
      }
      val covered = cut.flatMap(x => x._2 to math.min(x._2 + w - 1, n)).distinct
      val clean = t.zipWithIndex.collect {
        case (tok, i) if !covered.contains(i + 1) => tok
      }.mkString(" ")
      (id, n.toLong, covered.size.toLong, clean)
    }
    assert(got == expected)
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(1L)._4 == "a b c d e f", "canonical doc untouched")
    assert(byId(2L)._4 == "z q" && byId(2L)._3 == 4L, "later occurrence cut")
    assert(byId(3L)._4 == "x" && byId(3L)._3 == 5L, "self-repetition keeps first span")
    assert(byId(4L)._4 == "p q", "first short dup kept")
    assert(byId(5L)._4 == "" && byId(5L)._3 == 2L, "second short dup wiped")
    assert(byId(6L)._4 == "unique tokens only here now", "unique doc untouched")
  }

  test("windowDupSignals: one row per fixture doc, marks only real sharing") {
    val r = Dedup.windowDupSignals(docs, "doc_id", "text", w = 10)
    assert(r.count() == docs.count())
    // dup coverage never exceeds the doc's tokens
    assert(r.filter(col("dup_tokens") > col("n_tokens")).count() == 0)
  }

  test("semanticDedup: near-dup groups keep one least-central member, singletons survive") {
    // two tight groups around distant anchors + two singletons; cosine
    // near-dups only within a group
    def jitter(base: Array[Float], eps: Float, at: Int): Array[Float] = {
      val v = base.clone(); v(at) = v(at) + eps; v
    }
    val a = Array.fill(8)(0f); a(0) = 1f
    val b = Array.fill(8)(0f); b(4) = 1f
    val s1 = Array.fill(8)(0.35f)
    val s2 = Array.fill(8)(-0.35f); s2(1) = 0.9f
    val rows = Seq(
      (1L, jitter(a, 0.01f, 1)), (2L, jitter(a, 0.02f, 2)), (3L, jitter(a, 0.03f, 3)),
      (10L, jitter(b, 0.01f, 1)), (11L, jitter(b, 0.02f, 2)),
      (20L, s1), (21L, s2), (30L, null.asInstanceOf[Array[Float]]))
    val df = rows.toDF("id", "vec")
    val out = Dedup.semanticDedup(df, "id", "vec", threshold = 0.95,
      ncentroids = 4, seed = 7L)
    val got = out.select("id", "cluster_id", "centroid_sim", "is_kept")
      .as[(Long, Long, Option[Double], Boolean)].collect()
    graft.operators.Checkpoints.free(out)
    val byId = got.map(r => r._1 -> r).toMap
    assert(got.length == rows.length)
    // group members share a component; distinct groups don't
    assert(byId(1L)._2 == byId(2L)._2 && byId(2L)._2 == byId(3L)._2)
    assert(byId(10L)._2 == byId(11L)._2)
    assert(byId(1L)._2 != byId(10L)._2)
    // exactly one kept per component; it is the least-central member
    got.groupBy(_._2).foreach { case (_, g) =>
      assert(g.count(_._4) == 1)
      val kept = g.find(_._4).get
      assert(kept._3 == g.flatMap(_._3).minOption.orElse(kept._3))
    }
    // singletons keep themselves; the null-vector row passes through kept
    assert(byId(20L)._4 && byId(21L)._4)
    assert(byId(30L)._4 && byId(30L)._2 == 30L, "null-vector row kept as its own singleton")

    // the prebuilt-layout wrapper (the declared query's path) must agree
    // with the in-query-train path on the SAME model — including the
    // null-vector passthrough, which reads the original df, not the
    // layout (a null row never reaches the assigned corpus)
    val model = graft.operators.IvfIndex.train(df, "vec", 4,
      metric = "cosine", seed = 7L, maxIter = 8)
    val layout = graft.operators.IvfIndex.assign(
      df.filter($"vec".isNotNull), "vec", model)
    val pre = Dedup.semanticDedupPrebuilt(df, layout, model, "id", "vec",
      threshold = 0.95)
    val gotPre = pre.select("id", "cluster_id", "centroid_sim", "is_kept")
      .as[(Long, Long, Option[Double], Boolean)].collect().sortBy(_._1)
    graft.operators.Checkpoints.free(pre)
    assert(gotPre.toSeq == got.sortBy(_._1).toSeq,
      "prebuilt path diverged from in-query-train path")
  }

  test("clusters: every doc labeled, singletons canonical, groups collapse") {
    val universe = (1L to 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val cl = Dedup.clusters(universe, "doc_id", pairs)
      .orderBy("id").as[(Long, Long, Boolean)].collect().toSeq
    assert(cl == Seq((1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (4L, 4L, true), (5L, 5L, true), (6L, 5L, false)))
    // dedup keep-set = canonical rows: one per cluster
    assert(cl.count(_._3) == 3)
  }
}
