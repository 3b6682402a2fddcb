package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dev probe (round 22, guide §1): dissects the jaccard-pair pipeline at a
  * SF — set-size stats, candidate volumes before/after dedup, and a
  * stage-level completion log (name, tasks, executor run time) so the
  * dominant job's time can be attributed to a specific stage instead of
  * guessed from per-job totals.
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/bench-data/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_COALESCE", "64k"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.registerFunctions(spark)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val run = si.taskMetrics.executorRunTime
        val wall = (for {a <- si.completionTime; b <- si.submissionTime}
          yield a - b).getOrElse(-1L)
        println(f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%4d " +
          f"wall=${wall}%6d ms run=${run}%7d ms  ${si.name.take(100)}")
      }
    })
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name t=${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm the kernels so JIT doesn't pollute the numbers
    time("warm")(Dedup.jaccardPairs(docs.limit(64), "doc_id", "text", 3, 0.8).count())

    // piecewise: shingle sets
    val shingled = time("shingle+checkpoint") {
      docs.select(col("doc_id").as("id"),
        graft.Graft.F.shingleHashes(Dedup.tokens(col("text")), 3).as("sharr"))
        .localCheckpoint(eager = true)
    }
    val stats = time("set stats") {
      shingled.select(count(lit(1)).as("n"), sum(size(col("sharr"))).as("tot"),
        avg(size(col("sharr"))).as(s"avg"), max(size(col("sharr"))).as("max")).head()
    }
    println(s"[probe] docs=${stats.getLong(0)} totShingles=${stats.getLong(1)} " +
      s"avg=${stats.getDouble(2)} max=${stats.getInt(3)}")
    val withSz = shingled.select(col("id"), col("sharr").as("ss"))
      .withColumn("sz", size(col("ss")))
    val prefixLen = (col("sz") - ceil(col("sz") * lit(0.8)).cast("int") + 1)
    val pre = withSz.select(col("id"),
      explode(slice(col("ss"), lit(1), greatest(prefixLen, lit(0)))).as("psh"))
    println(s"[probe] prefix rows = ${time("pre count")(pre.count())}")
    val cand0 = pre.as("a").join(pre.as("b"), Seq("psh"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    println(s"[probe] cand before dedup = ${time("cand0 count")(cand0.count())}")
    val cand = cand0.dropDuplicates("id_a", "id_b")
    println(s"[probe] cand after dedup  = ${time("cand count")(cand.count())}")
    val out = cand
      .join(withSz.select(col("id").as("id_a"), col("ss").as("ss_a"), col("sz").as("sz_a")), "id_a")
      .join(withSz.select(col("id").as("id_b"), col("ss").as("ss_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("common", size(array_intersect(col("ss_a"), col("ss_b"))))
      .withColumn("jaccard",
        col("common").cast("double") / (col("sz_a") + col("sz_b") - col("common")))
      .filter(col("jaccard") >= 0.8)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    println(s"[probe] verified pairs   = ${time("verify count")(out.count())}")

    // PPJoin positional-filter variant: same candidates, occurrence-level
    // upper bound ub = 1 + min(sz−pos) filtered with the verify's own
    // double arithmetic before the dedup/verify shuffles.
    val preP = withSz.select(col("id"), col("sz"),
      posexplode(slice(col("ss"), lit(1), greatest(prefixLen, lit(0)))))
      .select(col("id"), col("sz"), (col("pos") + 1).as("p"), col("col").as("psh"))
    val candP0 = preP.as("a").join(preP.as("b"), Seq("psh"))
      .filter(col("a.id") < col("b.id"))
      .withColumn("_ub", lit(1) + least(col("a.sz") - col("a.p"), col("b.sz") - col("b.p")))
      .filter(col("_ub").cast("double") /
        (col("a.sz") + col("b.sz") - col("_ub")) >= 0.8)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    println(s"[probe] pos-filtered occurrences = ${time("candP0 count")(candP0.count())}")
    val candP = candP0.dropDuplicates("id_a", "id_b")
    println(s"[probe] pos-filtered pairs       = ${time("candP count")(candP.count())}")
    val outP = candP
      .join(withSz.select(col("id").as("id_a"), col("ss").as("ss_a"), col("sz").as("sz_a")), "id_a")
      .join(withSz.select(col("id").as("id_b"), col("ss").as("ss_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("common", size(array_intersect(col("ss_a"), col("ss_b"))))
      .withColumn("jaccard",
        col("common").cast("double") / (col("sz_a") + col("sz_b") - col("common")))
      .filter(col("jaccard") >= 0.8)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    println(s"[probe] verified pairs (pos)     = ${time("verify count (pos)")(outP.count())}")

    // containment: candidate volumes with the positional filter
    val preC = withSz.select(col("id"), col("sz"),
      posexplode(slice(col("ss"), lit(1), greatest(prefixLen, lit(0)))))
      .select(col("id"), col("sz"), (col("pos") + 1).as("p"), col("col").as("psh"))
    val invC = withSz.select(col("id"), col("sz"), posexplode(col("ss")))
      .select(col("id"), col("sz"), (col("pos") + 1).as("p"), col("col").as("psh"))
    val ubC = lit(1) + least(col("a.sz") - col("a.p"), col("b.sz") - col("b.p"))
    val candC0 = preC.as("a").join(invC.as("b"), Seq("psh"))
      .filter(col("a.sz") < col("b.sz") ||
        (col("a.sz") === col("b.sz") && col("a.id") < col("b.id")))
    println(s"[probe] contain cand raw = ${time("containC raw")(candC0.count())}")
    val candC1 = candC0
      .filter(ubC.cast("double") / least(col("a.sz"), col("b.sz")) >= 0.8)
      .select(least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"))
    println(s"[probe] contain cand pos = ${time("containC pos")(candC1.count())}")
    println(s"[probe] contain pairs    = ${time("containC dedup")(candC1.dropDuplicates("id_a", "id_b").count())}")
    spark.stop()
  }
}
