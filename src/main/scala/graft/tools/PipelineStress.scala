package graft.tools

import org.apache.spark.sql.functions._

import graft.Graft
import graft.operators.{Checkpoints, Dedup, Packing}

/** LLM-pipeline stress at fixture scale (r19: 8M ScaleFixture docs —
  * the serving path got its 8M decade curve in r18; this is the dedup/
  * packing side's). Runs the four shuffle-heavy pipeline operators over
  * `SPARK_GRAFT_SF_DIR/documents.parquet` and prints ONE JSON line per
  * op: wall seconds, scheduler jobs, shuffle-write records, output rows
  * — the numbers README's stress section records.
  *
  *   SPARK_GRAFT_SF_DIR=bench-data/scale8m \
  *     sbt "runMain graft.tools.PipelineStress [jaccard simhash window pack]"
  *
  * With op names as args, only those run (re-measure one op cheaply).
  */
object PipelineStress {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "bench-data/scale8m")
    val spark = Graft.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val sc = spark.sparkContext
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val nDocs = docs.count()
    println(s"""{"pipeline_stress":"corpus","dir":"$dir","docs":$nDocs}""")

    // per-op job + shuffle-record audit, job-group scoped (the
    // SparkSpec.shuffleRecords device, inlined — tools don't see test
    // classes); the listener bus is async, so settle until quiet
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
    def measure(name: String)(f: => Long): Unit = {
      if (args.nonEmpty && !args.contains(name)) return
      val group = s"pipeline-$name"
      val stages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
      val records = new java.util.concurrent.atomic.AtomicLong(0)
      val listener = new SparkListener {
        override def onJobStart(j: SparkListenerJobStart): Unit =
          if (j.properties != null &&
              group == j.properties.getProperty("spark.jobGroup.id"))
            j.stageIds.foreach(stages.add(_))
        override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
          if (stages.contains(s.stageInfo.stageId))
            records.addAndGet(
              s.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
      }
      sc.addSparkListener(listener)
      sc.setJobGroup(group, name, false)
      val t0 = System.nanoTime()
      val outRows =
        try f
        finally sc.clearJobGroup()
      val sec = (System.nanoTime() - t0) / 1e9
      var prev = -1L; var tries = 0
      while (records.get != prev && tries < 50) {
        prev = records.get; Thread.sleep(100); tries += 1
      }
      sc.removeSparkListener(listener)
      val jobs = sc.statusTracker.getJobIdsForGroup(group).length
      println(f"""{"pipeline_stress":"$name","docs":$nDocs,"sec":$sec%.1f,"jobs":$jobs,"shuffle_records":${records.get},"out_rows":$outRows}""")
    }

    measure("jaccard") {
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8)
      try pairs.count() finally Checkpoints.free(pairs)
    }
    measure("simhash") {
      val pairs = Dedup.simhashPairs(docs, "doc_id", "text", 3)
      try pairs.count() finally Checkpoints.free(pairs)
    }
    measure("window") {
      // count() alone would let Catalyst ELIMINATE the two unique-key
      // left joins (and with them the whole window pass) — aggregate the
      // signal columns so every stage actually runs; report the docs
      // carrying any duplicated window
      val sig = Dedup.windowDupSignals(docs, "doc_id", "text")
      // reference BOTH signal columns or the other join still drops out
      sig.filter(col("dup_windows") > 0 || col("dup_tokens") > 0).count()
    }
    measure("pack") {
      val withTokens = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      Packing.packManifest(withTokens, "doc_id", "n_tokens", 2048L).count()
    }
    spark.stop()
  }
}
