package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** The vearch realtime-search capability (SURVEY §2.8: `enable_realtime` —
  * freshly ingested vectors live in a FLAT-scanned memory buffer, searches
  * scan main index ∪ buffer, a background loop folds the buffer into the
  * index every `refresh_interval` ms, vector_manager.cc:941-1176,
  * engine.cc:1084-1137) re-expressed with Structured Streaming:
  *
  *   ingest:  readStream → writeStream(parquet) into a TAIL table
  *   query:   indexed BASE table ∪ brute-forced TAIL (dedup by id,
  *            tail wins — matches buffer-over-index merge order)
  *   compact: fold tail into base + clear tail (= their Indexing loop);
  *            trigger cadence = refresh_interval.
  *
  * The tail stays small (one refresh interval of ingest), so its
  * brute-force scan cost is bounded regardless of base size.
  */
final class RealtimeTail(
    spark: SparkSession,
    val basePath: String,
    val tailPath: String,
    checkpointPath: String,
    idCol: String,
    // column that orders writes to the same id (event time / sequence);
    // without it, id collisions WITHIN the tail resolve arbitrarily — pass
    // one whenever the stream can re-deliver an id
    orderCol: Option[String] = None) {

  /** Start ingest at the space's configured `refresh_interval`
    * (space.go:156-164 — the reference's buffer-fold cadence).
    */
  def startIngest(source: DataFrame, space: graft.schema.Space): StreamingQuery =
    startIngest(source, space.config.refreshIntervalMs)

  /** Start streaming ingest into the tail table. */
  def startIngest(source: DataFrame, intervalMs: Long = 1000L): StreamingQuery =
    source.writeStream
      .format("parquet")
      .option("path", tailPath)
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.ProcessingTime(intervalMs))
      .start()

  private def readOrEmpty(path: String, schema: StructType): DataFrame = {
    // only a MISSING path means "no data yet"; any other failure (corrupt
    // footer, permission, schema clash) must propagate — swallowing it
    // would silently turn a hybrid search into a tail-only search. The
    // existence check goes through the Hadoop FS for the path's scheme
    // (java.nio would report hdfs:// or s3a:// paths as always-missing).
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(path)
  }

  /** Unified view: base rows not superseded by tail, plus all tail rows
    * (id-level last-write-wins, the upsert merge semantics).
    */
  def snapshot(schema: StructType): DataFrame = {
    val base = readOrEmpty(basePath, schema)
    val tail = readOrEmpty(tailPath, schema)
    val dedupedTail = orderCol match {
      case Some(oc) => graft.operators.Documents.lastWinsById(tail, idCol, oc)
      case None     => tail.dropDuplicates(idCol) // arbitrary winner — see ctor note
    }
    graft.operators.Documents.upsert(base, dedupedTail, idCol)
  }

  /** Realtime graph-ANN search: the READY HNSW generation (built over the
    * BASE) ∪ the brute-forced TAIL, tail winning id collisions — the
    * reference's buffer-over-index merge (vector_manager.cc:941-1176).
    * Fresh writes are never missed (the tail is scanned exactly) and an
    * UPDATED doc's stale base ranking never survives (base hits whose id
    * exists in the tail are dropped before the merge, not after —
    * dropping after would let a stale high-ranking version crowd out a
    * legitimate k-th result). The tail is one refresh interval of ingest,
    * so the brute leg stays bounded regardless of base size. Requires an
    * integral id (graph node ids are longs).
    */
  def searchHnsw(
      segments: org.apache.spark.sql.Dataset[graft.operators.HnswIndex.Segment],
      schema: StructType,
      vecCol: String,
      q: Seq[Float],
      k: Int,
      ef: Int,
      metric: String = "l2",
      // delete ledger since the graph generation (the reference's
      // deleted-bitmap gate): denied ids never surface from the base
      // walk; tail rows with denied ids are dropped too (a delete beats
      // an earlier buffered write of the same id)
      deny: Set[Long] = Set.empty): DataFrame = {
    import graft.operators.{HnswIndex, Knn}
    val tail = readOrEmpty(tailPath, schema)
    val dedupedTail0 = orderCol match {
      case Some(oc) => graft.operators.Documents.lastWinsById(tail, idCol, oc)
      case None     => tail.dropDuplicates(idCol)
    }
    val dedupedTail =
      if (deny.isEmpty) dedupedTail0
      else dedupedTail0.filter(!col(idCol).cast("long").isin(deny.toSeq: _*))
    val tailHits = Knn.search(dedupedTail, col(vecCol), q, k, metric,
      tieBreak = Some(col(idCol)))
      .select(col(idCol).cast("long").as("vec_id"), col("_score"))
    val tailIds = dedupedTail.select(col(idCol).cast("long").as("vec_id"))
    // up to |tail| of the base's top hits may be superseded and dropped,
    // and the base's next-ranked docs then belong in the merged top-k —
    // over-fetch by the (bounded) tail size so survivors always suffice
    val kBase = (k + math.min(tailIds.count(), (Int.MaxValue - k).toLong)).toInt
    val baseHits = HnswIndex.search(segments, q, kBase, math.max(ef, kBase),
        metric, deny = deny)
      .join(tailIds, Seq("vec_id"), "left_anti")
    val primary =
      if (Knn.ascending(metric)) col("_score").asc else col("_score").desc
    baseHits.unionByName(tailHits).orderBy(primary, col("vec_id").asc).limit(k)
  }

  /** Fold the tail into the base (the reference's background Indexing
    * loop, engine.cc:1084-1137) and clear the tail. `assign` is where IVF
    * list_id assignment for the new rows happens (IvfIndex.assign) before
    * the append. Call between ingest runs (stream stopped or paused) —
    * with a transactional table format this becomes a single MERGE +
    * truncate; on plain parquet we swap directories.
    */
  def compact(schema: StructType, assign: DataFrame => DataFrame = identity,
      lifecycle: Option[graft.api.IndexLifecycle] = None): Unit = {
    // churn accounting BEFORE the fold: tail rows merged in place are
    // invisible to a row-count staleness (an UPDATE leaves the base count
    // unchanged while the graph still holds the old vector) — report them
    // to the lifecycle's mutation ledger so drift-triggered rebuilds fire
    // (IndexLifecycle.hnswStaleness's churn term)
    lifecycle.foreach { lc =>
      val folded = readOrEmpty(tailPath, schema).select(idCol).distinct().count()
      lc.recordMutations(folded)
    }
    val merged = assign(snapshot(schema))
    val tmp = s"$basePath.compact.tmp"
    merged.write.mode("overwrite").parquet(tmp)
    val baseP = new org.apache.hadoop.fs.Path(basePath)
    // the FS for basePath's SCHEME — FileSystem.get(conf) resolves the
    // default FS and throws "Wrong FS" for s3a://-style table paths
    val fs = baseP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val oldP = new org.apache.hadoop.fs.Path(s"$basePath.old")
    val tailP = new org.apache.hadoop.fs.Path(tailPath)
    // move-aside swap (no crash window that loses the base), tail cleared
    // only after the new base is in place
    fs.delete(oldP, true)
    fs.rename(baseP, oldP)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), baseP)
    fs.delete(oldP, true)
    fs.delete(tailP, true)
  }
}
