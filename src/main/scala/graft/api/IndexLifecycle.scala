package graft.api

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.IvfIndex

/** Index lifecycle verbs (SURVEY §2.8): rebuild / force-merge / add /
  * remove with the BUILDING→READY/FAILED state machine the reference keeps
  * in RocksDB (scalar_index_manager.h:75-125, engine.cc:1561-1666). Here
  * state is a sidecar JSON next to the index table — atomic because each
  * build writes to a fresh directory and the state file flips last
  * (crash before the flip leaves the previous READY index in place, the
  * same recovery contract as their BUILDING marker).
  */
final class IndexLifecycle(spark: SparkSession, spacePath: String) {

  private def statePath = s"$spacePath.index_state.json"
  private def indexPath(gen: Long) = s"$spacePath.index.g$gen"

  sealed trait State
  case object Missing extends State
  final case class Building(gen: Long) extends State
  /** `trainedDocs` = corpus size the model was trained on (-1 for
    * sidecars written before the drift metric existed).
    */
  final case class Ready(gen: Long, ncentroids: Int, trainedDocs: Long = -1L)
    extends State
  final case class Failed(gen: Long, reason: String) extends State

  def state: State = readStateAt(statePath)

  private def readStateAt(path: String): State = {
    val p = Paths.get(path)
    if (!Files.exists(p)) Missing
    else {
      val s = new String(Files.readAllBytes(p))
      val parts = s.trim.split(":", 4)
      parts(0) match {
        case "BUILDING" => Building(parts(1).toLong)
        case "READY"    => Ready(parts(1).toLong, parts(2).toInt,
          if (parts.length > 3 && parts(3).nonEmpty) parts(3).toLong else -1L)
        // exception messages routinely contain colons — rejoin the tail
        case "FAILED"   => Failed(parts(1).toLong, parts.drop(2).mkString(":"))
        case _          => Missing
      }
    }
  }

  private def writeState(s: String): Unit = writeStateAt(statePath, s)

  private def writeStateAt(path: String, s: String): Unit = {
    val tmp = Paths.get(s"$path.tmp")
    Files.write(tmp, s.getBytes)
    Files.move(tmp, Paths.get(path), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** Build (or rebuild) the IVF index: train on the current space
    * contents, write an assigned+partitioned copy under a new generation,
    * flip READY last. `dropBeforeRebuild=false` keeps serving the old
    * generation until the flip (the rebuild semantics of
    * POST /index/rebuild, engine.cc:1013-1083).
    */
  def rebuild(vecCol: String, ncentroids: Int): Ready = {
    val gen = System.currentTimeMillis()
    writeState(s"BUILDING:$gen:")
    try {
      val corpus = spark.read.parquet(spacePath)
      val trainedDocs = corpus.count() // recorded for the drift metric
      val model = IvfIndex.train(corpus, vecCol, ncentroids)
      IvfIndex.buildTable(corpus, vecCol, model, indexPath(gen))
      // persist centroids alongside for query-time probe selection
      val centroids = model.centroids.zipWithIndex
        .map { case (c, i) => (i, c.toSeq) }.toSeq
      import spark.implicits._
      centroids.toDF("list_id", "centroid").write
        .mode("overwrite").parquet(s"${indexPath(gen)}.centroids")
      writeState(s"READY:$gen:$ncentroids:$trainedDocs")
      Ready(gen, ncentroids, trainedDocs)
    } catch {
      case e: Exception =>
        writeState(s"FAILED:$gen:${e.getMessage}")
        throw e
    }
  }

  /** Auto-build trigger (engine.cc:759-769,972-1012: the index is built
    * when doc_num reaches `training_threshold`; below it searches stay
    * brute-force over the raw table). Returns true iff a build ran.
    */
  def maybeAutoBuild(vecCol: String, ncentroids: Int,
      trainingThreshold: Long): Boolean = state match {
    case _: Ready | _: Building => false
    case _ =>
      val n = spark.read.parquet(spacePath).count()
      if (n >= trainingThreshold) { rebuild(vecCol, ncentroids); true }
      else false
  }

  /** Incremental maintenance: assign list_ids for a delta batch with the
    * CURRENT model and append it to the READY generation — the reference's
    * background Indexing loop (engine.cc:1084-1137 folds new vectors into
    * the live index without retraining). Centroids drift is handled by the
    * next rebuild; until then new rows are immediately probe-searchable.
    */
  def appendDelta(delta: DataFrame, vecCol: String): Unit = state match {
    case Ready(gen, _, _) =>
      val model = loadModel().getOrElse(
        throw new IllegalStateException("READY state without centroids"))
      IvfIndex.assign(delta, vecCol, model)
        .write.mode("append").partitionBy("list_id").parquet(indexPath(gen))
    case other =>
      throw new IllegalStateException(s"no READY index to append to (state: $other)")
  }

  /** Staleness of the READY generation: fraction of indexed docs the
    * model has NOT been trained on — `(indexed - trainedAt) / trainedAt`.
    * 0 right after a rebuild, grows as [[appendDelta]] folds new vectors
    * in under drifting centroids. None when no READY index exists or the
    * sidecar predates the metric.
    */
  def staleness(): Option[Double] = state match {
    case Ready(gen, _, trained) if trained > 0 =>
      val indexed = spark.read.parquet(indexPath(gen)).count()
      Some((indexed - trained).toDouble / trained)
    case _ => None
  }

  /** Drift-triggered retrain — the maintenance twin of the reference's
    * `training_threshold` auto-build loop (engine.cc:759-769,1084-1137):
    * once the delta folded in since the last train exceeds
    * `driftThreshold` (a fraction, e.g. 0.3 = 30% new docs), the index is
    * retrained and rewritten under a fresh generation (BUILDING→READY,
    * old generation served until the flip). Returns true iff a retrain
    * ran. The space table is the training source, so deltas must be
    * upserted there as well as appended to the index — the standard
    * ingest contract.
    */
  def maybeRetrain(vecCol: String, driftThreshold: Double): Boolean =
    state match {
      case Ready(_, ncentroids, _) if staleness().exists(_ >= driftThreshold) =>
        rebuild(vecCol, ncentroids); true
      case _ => false
    }

  /** The current READY index table, or None while missing/building. */
  def readyIndex(): Option[DataFrame] = state match {
    case Ready(gen, _, _) => Some(spark.read.parquet(indexPath(gen)))
    case _             => None
  }

  def loadModel(metric: String = "l2"): Option[IvfIndex.Model] = state match {
    case Ready(gen, _, _) =>
      val rows = spark.read.parquet(s"${indexPath(gen)}.centroids")
        .orderBy("list_id").collect()
      val cents = rows.map(_.getSeq[Float](1).toArray)
      Some(IvfIndex.Model(cents, metric))
    case _ => None
  }

  // ── HNSW generation (graph-ANN class): the same BUILDING→READY/FAILED
  //    contract over a SEPARATE sidecar, so a space can carry a scan (IVF)
  //    and a graph (HNSW) layout concurrently; generations are
  //    per-index-kind in the reference too (engine.cc:1013-1083).

  private def hnswStatePath = s"$spacePath.hnsw_state.json"
  private def hnswPath(gen: Long) = s"$spacePath.hnsw.g$gen"

  def hnswState: State = readStateAt(hnswStatePath)

  /** Build (or rebuild) the HNSW generation. In the returned `Ready`, the
    * `ncentroids` slot carries `numShards` — the graph kind's analogous
    * layout parameter.
    */
  def rebuildHnsw(idCol: String, vecCol: String,
      params: graft.operators.HnswIndex.Params): Ready = {
    val gen = System.currentTimeMillis()
    writeStateAt(hnswStatePath, s"BUILDING:$gen:")
    try {
      val corpus = spark.read.parquet(spacePath)
      val trainedDocs = corpus.count()
      graft.operators.HnswIndex.build(corpus, idCol, vecCol, params)
        .write.mode("overwrite").parquet(hnswPath(gen))
      writeStateAt(hnswStatePath, s"READY:$gen:${params.numShards}:$trainedDocs")
      Ready(gen, params.numShards, trainedDocs)
    } catch {
      case e: Exception =>
        writeStateAt(hnswStatePath, s"FAILED:$gen:${e.getMessage}")
        throw e
    }
  }

  /** The current READY HNSW segment table, or None while missing/building. */
  def readyHnswSegments(): Option[org.apache.spark.sql.Dataset[graft.operators.HnswIndex.Segment]] =
    hnswState match {
      case Ready(gen, _, _) =>
        import spark.implicits._
        Some(spark.read.parquet(hnswPath(gen))
          .as[graft.operators.HnswIndex.Segment])
      case _ => None
    }

  /** Staleness of the HNSW generation: fraction of the SPACE the graph
    * has not been built over — `(docs now − docs at build) / docs at
    * build`. The graph kind has no appendDelta (inserting into a stored
    * segment means rewriting it), so drift accrues from space growth via
    * the realtime tail's compactions; serving stays fresh regardless
    * through [[graft.streaming.RealtimeTail.searchHnsw]]'s brute tail leg.
    */
  def hnswStaleness(): Option[Double] = hnswState match {
    case Ready(_, _, trained) if trained > 0 =>
      val now = spark.read.parquet(spacePath).count()
      Some((now - trained).toDouble / trained)
    case _ => None
  }

  /** Drift-triggered HNSW rebuild — [[maybeRetrain]]'s twin for the graph
    * kind (the reference rebuilds hnsw through the same index/rebuild
    * verb, engine.cc:1013-1083). Returns true iff a rebuild ran.
    */
  def maybeRebuildHnsw(idCol: String, vecCol: String,
      params: graft.operators.HnswIndex.Params,
      driftThreshold: Double): Boolean =
    if (hnswStaleness().exists(_ >= driftThreshold)) {
      rebuildHnsw(idCol, vecCol, params); true
    } else false

  /** Force-merge ≡ compaction: rewrite the space with a target file count
    * (POST /index/forcemerge → Optimize(), handler_document.go:468-476).
    */
  def forceMerge(targetFiles: Int = 1): Unit = {
    val df = spark.read.parquet(spacePath).coalesce(targetFiles)
    val tmp = s"$spacePath.merge.tmp"
    df.write.mode("overwrite").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    // move-aside swap: a crash mid-merge never loses the table (data is at
    // spacePath or spacePath.old at every instant)
    val p = new org.apache.hadoop.fs.Path(spacePath)
    val old = new org.apache.hadoop.fs.Path(s"$spacePath.old")
    fs.delete(old, true)
    fs.rename(p, old)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), p)
    fs.delete(old, true)
    ()
  }

  /** Remove the index (state + generations). */
  def drop(): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    state match {
      case Ready(gen, _, _) =>
        fs.delete(new org.apache.hadoop.fs.Path(indexPath(gen)), true)
        fs.delete(new org.apache.hadoop.fs.Path(s"${indexPath(gen)}.centroids"), true)
      case _ =>
    }
    Files.deleteIfExists(Paths.get(statePath))
    ()
  }
}
