package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session: one per JVM across suites. */
object SparkSpec {
  lazy val spark: SparkSession = Graft.session("4")
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.spark
  val sf = "/root/testdata/sf0.001"

  /** Total shuffle-write RECORDS for the jobs `body` runs — the
    * measurement behind "this operator shuffles the corpus exactly once /
    * never" claims. Scoped to a unique job group so concurrently-running
    * suites in the shared session don't pollute the count; waits out the
    * async listener bus before reporting.
    */
  def shuffleRecords(body: => Unit): Long = {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
    val group = s"shuffle-audit-${java.util.UUID.randomUUID()}"
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
    spark.sparkContext.addSparkListener(listener)
    spark.sparkContext.setJobGroup(group, "shuffle audit", false)
    try {
      body
      var prev = -1L
      var tries = 0
      while (records.get != prev && tries < 50) {
        prev = records.get; Thread.sleep(100); tries += 1
      }
      records.get
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(listener)
    }
  }
}
