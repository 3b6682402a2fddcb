package graft

/** Declared-surface analyzability sweep: every key in
  * `SparkEntry.queries` must at least ANALYZE against the fixture dir.
  * The driver's correctness harness silently omits queries whose plan
  * construction throws — that's how the round-8 `events.ts` fixture
  * retype (epoch-ns BIGINT → TIMESTAMP_NTZ µs) dropped nine temporal
  * queries from CORRECTNESS for two rounds without a single red check.
  * This spec turns a driver-side silent drop into a named local failure:
  * constructing the DataFrame runs Catalyst analysis eagerly, so an
  * unresolvable column/type mismatch throws right here, per query name.
  */
class QuerySurfaceSpec extends SparkSpec {

  test("every declared query analyzes against the fixture dir") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val df = fn(spark, sf)
          df.queryExecution.analyzed // force (construction already analyzes)
          graft.operators.Checkpoints.free(df)
          Nil
        } catch {
          case e: Throwable =>
            val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
            Seq(s"$name: ${msg.linesIterator.next().take(160)}")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} declared queries fail analysis:\n${failures.mkString("\n")}")
  }

  test("every oracle key names a declared query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: ${orphans.mkString(", ")}")
  }
}
