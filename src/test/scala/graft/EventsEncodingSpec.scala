package graft

import org.apache.spark.sql.functions._

/** The events loader must produce IDENTICAL query results across every
  * physical `ts` encoding the driver fixtures have shipped (SURVEY §1.2):
  * epoch-ns BIGINT (TIMESTAMP(NANOS) + nanosAsLong, fixture generations
  * through round 7), µs TIMESTAMP_NTZ (round 8+), and tz-adjusted µs
  * TIMESTAMP (what a Spark writer itself would produce). This pins the
  * round-10 fix — the round-8 retype silently broke nine queries for two
  * rounds — by rewriting ONE source fixture into all three encodings and
  * asserting two temporal queries agree bit-for-bit across them.
  */
class EventsEncodingSpec extends SparkSpec {

  private def rewrite(encoding: String): String = {
    val out = java.nio.file.Files.createTempDirectory(s"ev_$encoding").toString
    val src = spark.read.parquet(s"$sf/events.parquet") // ts: TIMESTAMP_NTZ µs
    val df = encoding match {
      case "ntz" => src
      case "tz" =>
        // same instant micros under the UTC test session
        src.withColumn("ts", col("ts").cast("timestamp"))
      case "ns_long" =>
        src.withColumn("ts",
          expr("timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', ts)") * lit(1000L))
    }
    df.write.mode("overwrite").parquet(s"$out/events.parquet")
    out
  }

  private def results(q: String, dir: String): Seq[String] =
    SparkEntry.queries(q)(spark, dir).collect().map(_.toString).toSeq

  test("q_events_hourly and q_sessionize agree across all three ts encodings") {
    val dirs = Seq("ntz", "tz", "ns_long").map(e => e -> rewrite(e))
    // sanity: the rewrites actually produced three distinct physical types
    val types = dirs.map { case (_, d) =>
      spark.read.parquet(s"$d/events.parquet").schema("ts").dataType.typeName
    }
    assert(types.distinct.size == 3, s"expected 3 distinct encodings, got $types")
    for (q <- Seq("q_events_hourly", "q_sessionize")) {
      val Seq(ntz, tz, ns) = dirs.map { case (_, d) => results(q, d) }
      assert(ntz == tz, s"$q: TIMESTAMP_NTZ vs TIMESTAMP diverged")
      assert(ntz == ns, s"$q: TIMESTAMP_NTZ vs epoch-ns BIGINT diverged")
      assert(ntz.nonEmpty, s"$q returned no rows")
    }
  }
}
