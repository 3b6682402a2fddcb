package graft.tools

import org.apache.spark.sql.functions._

import graft.Graft
import graft.Graft.F
import graft.operators.Knn

/** Scale evidence: synthetic N×dim corpus generated distributively
  * (spark.range + hash-derived floats, no driver materialization), then
  * timed brute-force KNN and batch KNN. Prints vectors/sec scored — the
  * number that projects to a 1000-executor cluster (the scan is
  * embarrassingly parallel; the top-k merge moves P×k rows).
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_STRESS_N", "2000000").toLong
    val dim = sys.env.getOrElse("SPARK_GRAFT_STRESS_DIM", "64").toInt
    val spark = Graft.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._

    // deterministic pseudo-vectors: float_j(id) from a hash chain
    val vecExpr = array((0 until dim).map(j =>
      (pmod(hash($"id" * 31 + lit(j)), lit(1000)).cast("float") / 500f - 1f)): _*)
    val corpus = spark.range(0, n).select($"id", vecExpr.cast("array<float>").as("v"))
      .repartition(32).cache()
    corpus.count() // materialize

    val q = corpus.filter($"id" === 0).select("v").head().getSeq[Float](0)

    def time[A](what: String, vectors: Long)(f: => A): Unit = {
      val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"stress":"$what","n":$n,"dim":$dim,"sec":$sec%.2f,"vec_per_sec":${(vectors / sec).toLong}}""")
    }

    // SPARK_GRAFT_STRESS_ONLY_SPACE=1 runs just the searchAuto serving
    // section (plus the corpus/IVF layout it needs) - the other numbers
    // are stable round to round and cost ~10 min at 2M
    val full = !sys.env.contains("SPARK_GRAFT_STRESS_ONLY_SPACE")

    if (full) time("knn_single_top10", n) {
      Knn.search(corpus, $"v", q, 10, "ip", tieBreak = Some($"id")).collect()
    }
    if (full) time("knn_single_l2_top100", n) {
      Knn.search(corpus, $"v", q, 100, "l2", tieBreak = Some($"id")).collect()
    }
    val queries = corpus.filter($"id" < 16).select($"id".as("qid"), $"v".as("qv"))
    if (full) time("knn_batch16_top10", n * 16) {
      Knn.searchBatch(corpus, $"v", struct($"id"), queries, "qid", "qv", 10, "ip").collect()
    }

    // value-type scan economics (index_model.h:19): int8 reads 1/4 the
    // vector bytes, binary 1/32 — the quantized types should scan
    // correspondingly faster once IO-bound (in-memory they show the
    // kernel-cost floor)
    val qArr = new org.apache.spark.sql.catalyst.util.GenericArrayData(q.toArray)
    if (full) {
      val i8 = corpus.select($"id", F.quantizeI8($"v").as("iv")).cache()
      i8.count()
      val qI8 = graft.functions.VecKernels.quantizeI8(qArr)
      time("int8_ip_top10", n) {
        Knn.searchInt8(i8, $"iv", qI8, 10, "ip", tieBreak = Some($"id")).collect()
      }
      i8.unpersist()
      val bin = corpus.select($"id", F.signBits($"v").as("b")).cache()
      bin.count()
      val qCode = graft.functions.VecKernels.signBits(qArr)
      time("binary_hamming_top10", n) {
        Knn.searchBinary(bin, $"b", qCode, 10, tieBreak = Some($"id")).collect()
      }
      bin.unpersist()
    }

    // IVF over its REAL deployment shape — a partitionBy(list_id) parquet
    // table — so the probe's partition pruning actually skips IO. (Over a
    // cached in-memory corpus the probe filter only adds per-row work:
    // there is nothing to skip. Measured and confirmed.)
    val ivf = graft.operators.IvfIndex.train(corpus, "v", ncentroids = 64,
      maxTrainRows = 100000L)
    val dir = java.nio.file.Files.createTempDirectory("stress_ivf").toString + "/tbl"
    graft.operators.IvfIndex.buildTable(corpus, "v", ivf, dir)
    corpus.unpersist()
    val table = spark.read.parquet(dir)
    if (full) time("ivf_parquet_np8of64_top100", n / 8) { // ~n/8 vectors scanned
      graft.operators.IvfIndex.search(table, $"v", ivf, q, 100, nprobe = 8,
        tieBreak = Some($"id")).collect()
    }
    if (full) time("ivf_parquet_full_scan_top100", n) {
      graft.operators.IvfIndex.search(table, $"v", ivf, q, 100, nprobe = 64,
        tieBreak = Some($"id")).collect()
    }

    // distributed k-NN JOIN: the query side is a TABLE (per-row probe
    // lists, equi-join on list_id, bounded top-k per query) — work ≈
    // Q·(nprobe/ncentroids)·n query·vector scores, zero driver collect
    val qn = sys.env.getOrElse("SPARK_GRAFT_STRESS_QJOIN", "2000").toLong
    val qTab = spark.range(0, qn).select($"id", vecExpr.cast("array<float>").as("v"))
    if (full) time(s"knn_join_q${qn}_np8of64_top10", qn * (n / 8)) {
      graft.operators.KnnJoin.ivf(qTab, "id", "v", table, $"v",
        struct(col("id")), ivf, k = 10, nprobe = 8).count()
    }

    // HNSW over cached graph segments — the serving shape (graph resident
    // in executor memory, the reference's in-RAM hnsw). Build once
    // (bounded ~64k-node shards), then single + batched walks; the
    // vec_per_sec of the walks is the EFFECTIVE rate vs the flat scans
    // above (the walk answers the same query while visiting ef-bounded
    // node counts per shard)
    val hShards = math.max(1, (n / 65536L).toInt)
    val hp = graft.operators.HnswIndex.Params(m = 16, efConstruction = 40,
      metric = "ip", numShards = hShards)
    val hCorpus = table.select($"id", $"v")
    if (full) {
    var segs: org.apache.spark.sql.Dataset[graft.operators.HnswIndex.Segment] = null
    time(s"hnsw_build_m16_efc40_s$hShards", n) {
      segs = graft.operators.HnswIndex.build(hCorpus, "id", "v", hp).cache()
      segs.count()
    }
    time("hnsw_single_ef64_top10_effective", n) {
      graft.operators.HnswIndex.search(segs, q, 10, 64, "ip").collect()
    }
    val hQueries = hCorpus.filter($"id" < 100).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    time("hnsw_batch100_ef64_top10_effective", n * 100) {
      graft.operators.HnswIndex.searchBatch(segs, hQueries, 10, 64, "ip").count()
    }
    segs.unpersist()

    // INT8 graph serving (late r16): the generation stores the RAW code
    // values widened to float, so the walk's Double-accumulated
    // distances equal the integer kernels bit-for-bit — same build/walk
    // machinery, quantized query
    val i8Corpus = hCorpus
      .withColumn("_i8f", F.i8ToFloat(F.quantizeI8($"v")))
    var i8Segs: org.apache.spark.sql.Dataset[graft.operators.HnswIndex.Segment] = null
    time(s"hnsw_int8_build_m16_efc40_s$hShards", n) {
      i8Segs = graft.operators.HnswIndex.build(i8Corpus, "id", "_i8f", hp).cache()
      i8Segs.count()
    }
    val qI8Walk: Seq[Float] =
      graft.functions.VecKernels.quantizeI8(qArr).toSeq.map(_.toFloat)
    time("hnsw_int8_single_ef64_top10_effective", n) {
      graft.operators.HnswIndex.search(i8Segs, qI8Walk, 10, 64, "ip").collect()
    }
    i8Segs.unpersist()

    // clustered (SPANN-routed) variant over the same corpus: shards = the
    // 64 coarse lists (reusing the IVF quantizer above), skew-split at
    // 64k rows; a routed query reads nprobe/ncentroids of segment IO
    val cp = graft.operators.HnswIndex.Params(m = 16, efConstruction = 40,
      metric = "l2", numShards = 64)
    var csegs: org.apache.spark.sql.Dataset[graft.operators.HnswIndex.Segment] = null
    time("hnsw_clustered_build_nc64", n) {
      csegs = graft.operators.HnswIndex
        .buildClustered(hCorpus, "id", "v", cp, ivf, maxShardRows = 65536).cache()
      csegs.count()
    }
    time("hnsw_routed_np8of64_ef64_top10_effective", n / 8) {
      graft.operators.HnswIndex.searchRouted(csegs, ivf, q, 10, 64, "l2",
        nprobe = 8).collect()
    }
    time("hnsw_routed_full_np64_ef64_top10_effective", n) {
      graft.operators.HnswIndex.searchRouted(csegs, ivf, q, 10, 64, "l2",
        nprobe = 64).collect()
    }
    csegs.unpersist()
    }

    // ── searchAuto serving shapes at corpus scale (post-r17, all legs
    // through the one legFor recipe): a REAL space dir with per-field
    // READY generations — v under a scoped HNSW generation, v2 (= -v)
    // under a scoped IVFFLAT generation — then
    //  (a) the score-gate path under a SELECTIVE gate (min_score = the
    //      200th-neighbor distance). Since r18 the walk threads the band
    //      into its result heap, so the FIRST gate-loop probe already
    //      returns the gated ranking's prefix — ONE walk (r17's loop
    //      re-paid it per depth doubling: 3 probes / 8 jobs at 2M);
    //  (b) a two-field MIXED-family conjunction (HNSW leg + IVF leg →
    //      family-agnostic docid intersection).
    // The job count is printed via a listener — the scale claim is that
    // gate selectivity costs ONE bounded walk + aggregate action, never
    // a corpus-sized collect or a per-doubling segment re-read.
    locally {
      val sDir = java.nio.file.Files
        .createTempDirectory("stress_space").toString + "/space"
      // the catalog's id-hash bucket layout (+ `_graft_buckets` sidecar):
      // at corpus scale the payload join-back partition-prunes to the hit
      // ids' buckets — the O(k) point-read path measured below
      val nbS = 32
      table.select($"id".as("_id"), $"v",
          transform($"v", x => lit(0f) - x).cast("array<float>").as("v2"))
        .withColumn("_bucket", pmod(hash($"_id"), lit(nbS)))
        .repartition(nbS, $"_bucket")
        .sortWithinPartitions($"_bucket", $"_id") // id-sorted row groups: In(_id) skips inside the bucket
        .write.mode("overwrite").partitionBy("_bucket").parquet(sDir)
      graft.sources.SidecarIO.writeString(s"$sDir/_graft_buckets", nbS.toString)
      val stored = spark.read.parquet(sDir)
      val lc = new graft.api.IndexLifecycle(spark, sDir)
      time(s"space_hnsw_gen_build_s$hShards", n) {
        lc.scoped("v").rebuildHnsw("_id", "v",
          graft.operators.HnswIndex.Params(m = 16, efConstruction = 40,
            metric = "l2", numShards = hShards))
      }
      time("space_ivf_gen_build_nc64", n) {
        lc.scoped("v2").rebuild("v2", ncentroids = 64)
      }
      val sp = graft.schema.Space.fromJson(
        s"""{"name":"stress_space","fields":[
            {"name":"v","type":"vector","dimension":$dim,
             "index":{"type":"HNSW",
                      "params":{"nlinks":16,"efConstruction":40,"efSearch":64}}},
            {"name":"v2","type":"vector","dimension":$dim,
             "index":{"type":"IVFFLAT",
                      "params":{"ncentroids":64,"nprobe":8}}}]}""")
      // gate threshold from the brute neighborhood: min_score = d(200)
      // excludes the 200 nearest, so k=10 gated survivors need depth
      // ≥ ~210 — probes 64, 128, 256
      val near = Knn.search(stored, $"v", q, 1000, "l2", tieBreak = Some($"_id"))
        .select("_score").collect().map(_.getDouble(0))
      val gate = near(199)
      val jobs = new java.util.concurrent.atomic.AtomicInteger
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      }
      val gatedReq = s"""{"vectors":[{"field":"v",
          "feature":${q.mkString("[", ",", "]")},"min_score":$gate}],"limit":10}"""
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val gatedRows = graft.api.SearchApi.searchAuto(stored, sp, gatedReq, lc)
        .count()
      val gatedSec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      println(f"""{"stress":"gate_loop_selective_min_d200","n":$n,"rows":$gatedRows,"jobs":${jobs.get()},"sec":$gatedSec%.2f}""")
      val mvReq = s"""{"vectors":[
          {"field":"v","feature":${q.mkString("[", ",", "]")}},
          {"field":"v2","feature":${q.map(x => -x).mkString("[", ",", "]")}}],
        "limit":10}"""
      time("conjunction_hnsw_ivf_2leg_top10", n + n / 8) {
        graft.api.SearchApi.searchAuto(stored, sp, mvReq, lc).count()
      }

      // ── payload fetch before/after (the r17 `weak`): cold + warm
      // end-to-end first (walk + pruned fetch), then the ISOLATED
      // payload-fetch pair — the r17 shape broadcast-joined the ≤k hits
      // against the UNPRUNED corpus (a full 2M-row read per query for 10
      // payload rows; at 100 TB, THE query cost), the r18 shape
      // partition-prunes to the hit ids' buckets + pushes id-IN
      // (O(k) point reads, engine.cc:902-911)
      val plainReq = s"""{"vectors":[{"field":"v",
          "feature":${q.mkString("[", ",", "]")}}],"limit":10}"""
      time("routed_query_e2e_cold_top10", n) {
        graft.api.SearchApi.searchAuto(stored, sp, plainReq, lc).count()
      }
      time("routed_query_e2e_warm_top10", n) {
        graft.api.SearchApi.searchAuto(stored, sp, plainReq, lc).count()
      }
      locally {
        val ids = (0 until 10).map(i => (i * 997L) % n)
        val hitsDf = ids.zipWithIndex
          .map { case (id, i) => (id, i.toDouble) }.toDF("_id", "_score")
        // driver twin of the layout's pmod(hash(_id), nb)
        val bks = ids.map { id =>
          val h = new org.apache.spark.sql.catalyst.expressions.Murmur3Hash(
            Seq(org.apache.spark.sql.catalyst.expressions.Literal(id)))
            .eval(null).asInstanceOf[Int]
          ((h % nbS) + nbS) % nbS
        }.distinct
        time("payload_fetch_unpruned_r17_shape", n) {
          stored.drop("_bucket").join(broadcast(hitsDf), "_id").count()
        }
        time("payload_fetch_pruned_bucket_id_in", 10) {
          stored.filter(col("_bucket").isin(bks: _*) && col("_id").isin(ids: _*))
            .drop("_bucket").join(broadcast(hitsDf), "_id").count()
        }
      }

      // ── BATCHED (req_num=5) two-field conjunction at corpus scale:
      // each field's 5 queries ride ONE amortized pass through its own
      // generation, per-(qid, docid) intersection, per-qid top-k
      val qs5 = stored.filter($"_id" < 5).orderBy($"_id")
        .select("v").collect().map(_.getSeq[Float](0))
      val mvbReq = s"""{"vectors":[
          {"field":"v","feature":${qs5.flatten.mkString("[", ",", "]")}},
          {"field":"v2","feature":${qs5.flatten.map(x => -x).mkString("[", ",", "]")}}],
        "limit":10}"""
      time("conjunction_batch5_hnsw_ivf_top10", 5L * (n + n / 8)) {
        graft.api.SearchApi.searchAuto(stored, sp, mvbReq, lc).count()
      }

      // ── realtime-tail merge at corpus scale: 2M indexed base ∪ 100k
      // buffered fresh writes — every leg serves base-index ∪ brute-tail,
      // and the payload fetch prunes BOTH sides by the hit ids
      val tailPath = s"$sDir.tail"
      spark.range(n, n + 100000)
        .select($"id".as("_id"), vecExpr.cast("array<float>").as("v"))
        .withColumn("v2", transform($"v", x => lit(0f) - x).cast("array<float>"))
        .write.mode("overwrite").parquet(tailPath)
      val rt = new graft.streaming.RealtimeTail(spark, sDir, tailPath,
        s"$sDir.ckpt", "_id", ridCol = Some("_id"))
      time("realtime_merge_2M_base_100k_tail_top10", n + 100000) {
        graft.api.SearchApi.searchAuto(stored, sp, plainReq, lc,
          tail = Some(rt)).count()
      }
    }

    // exact jaccard near-dup at corpus scale: template-structured docs
    // (10 docs share a template, ~2 of 80 words perturbed per doc →
    // within-template jaccard ≈ 0.86) — exercises the prefix-filtered
    // candidate join where shared shingles are DENSE, the regime the
    // naive inverted index goes quadratic in
    if (full) {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_STRESS_DOCS", "100000").toLong
    val words = transform(sequence(lit(0), lit(79)), i =>
      when(pmod(xxhash64($"id", i, lit("perturb")), lit(40)) === 0,
        concat(lit("u"), $"id", lit("_"), i))
        .otherwise(concat(lit("w"),
          pmod(xxhash64(expr("id div 10"), i), lit(200000)))))
    // storage-lifecycle evidence: every dedup result below runs through
    // Checkpoints.consume, so the whole section must leave ZERO residual
    // persisted RDDs (checked and printed at the end)
    val rddsBeforeDedup = spark.sparkContext.getPersistentRDDs.size
    val docs = spark.range(0, nDocs)
      .select($"id", concat_ws(" ", words).as("text")).cache()
    docs.count()
    import graft.operators.{Checkpoints, Dedup}
    def timeDedup(what: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val pairs = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"stress":"$what","docs":$nDocs,"pairs":$pairs,"sec":$sec%.2f,"docs_per_sec":${(nDocs / sec).toLong}}""")
    }
    timeDedup("jaccard_prefix_join") {
      Checkpoints.consume(
        Dedup.jaccardPairs(docs, "id", "text", n = 3, threshold = 0.8))(_.count())
    }
    timeDedup("minhash_lsh") {
      Checkpoints.consume(Dedup.minhashLshPairs(docs, "id", "text",
        n = 3, numHashes = 16, bands = 8, threshold = 0.8))(_.count())
    }
    timeDedup("simhash_pigeonhole") {
      Checkpoints.consume(
        Dedup.simhashPairsPortable(docs, "id", "text", maxHamming = 3))(_.count())
    }
    // near-dup clustering over the LSH pair list (template corpus → ~10-doc
    // clusters): large-star/small-star rounds over a multi-hundred-k-edge
    // graph, per-round checkpoints freed inside, result consumed
    locally {
      val mh = Dedup.minhashLshPairs(docs, "id", "text",
        n = 3, numHashes = 16, bands = 8, threshold = 0.8)
      val t0 = System.nanoTime()
      val comps = Checkpoints.consume(
        Dedup.connectedComponents(mh, "id_a", "id_b"))(
        _.select("cc").distinct().count())
      val sec = (System.nanoTime() - t0) / 1e9
      Checkpoints.free(mh)
      println(f"""{"stress":"connected_components","docs":$nDocs,"components":$comps,"sec":$sec%.2f,"docs_per_sec":${(nDocs / sec).toLong}}""")
    }
    docs.unpersist()
    val residual = spark.sparkContext.getPersistentRDDs.size - rddsBeforeDedup
    println(s"""{"stress":"dedup_storage_check","residual_rdds":$residual}""")

    // as-of join at stream scale: |L|+|R| rows through ONE key shuffle +
    // window pass — wall-clock stays linear in rows where a range-join
    // formulation explodes with |L|×|rows-in-range| candidates
    val nEv = sys.env.getOrElse("SPARK_GRAFT_STRESS_EVENTS", "5000000").toLong
    val asofL = spark.range(0, nEv).select(pmod($"id", lit(100000)).as("k"),
      $"id".as("lid"), xxhash64($"id", lit("lt")).as("t"))
    val asofR = spark.range(0, nEv / 10).select(pmod($"id", lit(100000)).as("k"),
      $"id".as("rid"), xxhash64($"id", lit("rt")).as("t"))
    time(s"asof_join_L${nEv}_R${nEv / 10}", nEv) {
      // aggregate over the carried payload — a bare count() lets column
      // pruning drop the window expression and eliminate the Window node,
      // timing an empty plan
      graft.operators.AsOfJoin.leftAsOf(asofL, asofR, Seq("k"), "t", "t",
        rightPrefix = "r_").agg(count($"r_rid")).head()
    }

    // bucketed range join: points × hour-wide windows over the same key
    // domain — the naive key-only join would materialize every per-key
    // pair (~nEv²/100k/10) before filtering
    val rjP = spark.range(0, nEv).select(pmod($"id", lit(100000)).as("k"),
      $"id".as("pid"), pmod(xxhash64($"id", lit("pt")), lit(1000000000L)).as("t"))
    val rjI = spark.range(0, nEv / 10).select(pmod($"id", lit(100000)).as("k"),
      $"id".as("iid"),
      pmod(xxhash64($"id", lit("it")), lit(1000000000L)).as("s"))
      .withColumn("e", $"s" + 3600000L)
    time(s"range_join_P${nEv}_I${nEv / 10}", nEv) {
      graft.operators.RangeJoin.pointInInterval(rjP, rjI, Seq("k"),
        "t", "s", "e", bucketWidth = 3600000L, intervalPrefix = "i_").count()
    }
    }
    spark.stop()
  }
}
