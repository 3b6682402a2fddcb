package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.IvfIndex
import graft.sources.SidecarIO

/** Index lifecycle verbs (SURVEY §2.8): rebuild / force-merge / add /
  * remove with the BUILDING→READY/FAILED state machine the reference keeps
  * in RocksDB (scalar_index_manager.h:75-125, engine.cc:1561-1666). Here
  * state is a sidecar JSON next to the index table — atomic because each
  * build writes to a fresh directory and the state file flips last
  * (crash before the flip leaves the previous READY index in place, the
  * same recovery contract as their BUILDING marker).
  *
  * Every sidecar (state files, ledgers, model/baseline files) reads and
  * writes through [[graft.sources.SidecarIO]] — the Hadoop FileSystem
  * API resolved by the space path's scheme, like the table IO around it
  * — so a space rooted on `hdfs://`/`s3a://` keeps the full lifecycle
  * contract, not just its parquet.
  */
final class IndexLifecycle(spark: SparkSession, spacePath: String,
    // per-FIELD generation namespace for multi-vector-field spaces (the
    // reference keeps one index per vector field, vector_manager.cc):
    // state files and layout dirs get a `.{field}` infix so each field's
    // generations flip independently; the delete/mutation LEDGERS stay
    // space-scoped — a document-level delete must gate EVERY field's
    // serving, whichever lifecycle instance recorded it
    fieldScope: Option[String] = None) {

  private def sfx = fieldScope.map("." + _).getOrElse("")

  /** This space's lifecycle for one vector field's generations (shared
    * ledgers, scoped states/layouts — see `fieldScope`).
    */
  def scoped(field: String): IndexLifecycle =
    new IndexLifecycle(spark, spacePath, Some(field))

  /** The space directory this lifecycle manages — the serving path reads
    * space-level sidecars (e.g. the `_graft_buckets` layout mark) from it.
    */
  private[graft] def path: String = spacePath

  private def statePath = s"$spacePath$sfx.index_state.json"
  private def indexPath(gen: Long) = s"$spacePath$sfx.index.g$gen"

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
    if (!SidecarIO.exists(path)) Missing
    else {
      val s = SidecarIO.readString(path)
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

  private def writeStateAt(path: String, s: String): Unit =
    SidecarIO.writeString(path, s)

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
      pruneLedgers()
      Ready(gen, ncentroids, trainedDocs)
    } catch {
      case e: Exception =>
        writeState(s"FAILED:$gen:${e.getMessage}")
        throw e
    }
  }

  /** [[rebuild]] for an INT8 vector field (value_type=INT8,
    * index_model.h:19 — the reference builds every index family over
    * INT8 too): the coarse quantizer trains and assigns in the
    * DE-QUANTIZED float domain (b/127 — order-identical to the int8
    * kernels up to a fixed scale), the stored layout keeps the compact
    * int8 codes; serving probes with the float query and scores with the
    * integer-accumulate kernels ([[graft.operators.IvfIndex.searchInt8]]).
    */
  def rebuildInt8(vecCol: String, ncentroids: Int): Ready = {
    val gen = System.currentTimeMillis()
    writeState(s"BUILDING:$gen:")
    try {
      val corpus = spark.read.parquet(spacePath)
      val trainedDocs = corpus.count()
      val deq = corpus.withColumn("_i8f", graft.Graft.F.dequantI8(col(vecCol)))
      val model = IvfIndex.train(deq, "_i8f", ncentroids)
      IvfIndex.assign(deq, "_i8f", model).drop("_i8f")
        .write.mode("overwrite").partitionBy("list_id").parquet(indexPath(gen))
      val centroids = model.centroids.zipWithIndex
        .map { case (c, i) => (i, c.toSeq) }.toSeq
      import spark.implicits._
      centroids.toDF("list_id", "centroid").write
        .mode("overwrite").parquet(s"${indexPath(gen)}.centroids")
      writeState(s"READY:$gen:$ncentroids:$trainedDocs")
      pruneLedgers()
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

  /** Build the generation the SPACE DECLARATION asks for — the builder
    * resolves from the field's index type AND value_type, so callers
    * never pick between the float and INT8 variants by hand (the
    * reference's Indexing loop builds whatever the space declares,
    * engine.cc:759-769; INT8 across families, index_model.h:19).
    * Parameter defaults follow the reference's space defaults
    * (ncentroids 2048, nsubvector 64, nlinks 32, efConstruction 40,
    * Vamana R 64 / L 100); `numShards` is an engine-level layout choice
    * with no reference analog. Returns None for declarations that serve
    * without a built generation (FLAT / SCALAR). Multi-field spaces
    * build each field under its own [[scoped]] lifecycle.
    */
  def rebuildDeclared(space: graft.schema.Space, field: String,
      idCol: String = "_id", numShards: Int = 8): Option[Ready] = {
    val vo = space.vectorFields.find(_.name == field).flatMap(_.vector)
      .getOrElse(throw new IllegalArgumentException(
        s"no vector field '$field' in space '${space.name}'"))
    val p = vo.indexParams
    def param(n: String, dflt: Int) = p.get(n).filter(_ > 0).getOrElse(dflt)
    val nc = param("ncentroids", 2048)
    val i8 = vo.valueType == "int8"
    vo.indexType match {
      case "FLAT" | "SCALAR" => None
      case "IVFFLAT" | "GPU_IVFFLAT" =>
        Some(if (i8) rebuildInt8(field, nc) else rebuild(field, nc))
      case "HNSW" =>
        val params = graft.operators.HnswIndex.Params(
          m = param("nlinks", 32), efConstruction = param("efConstruction", 40),
          metric = vo.metric, numShards = numShards)
        Some(if (i8) rebuildHnswInt8(idCol, field, params)
        else rebuildHnsw(idCol, field, params))
      case "DISKANN_STATIC" | "SSG" =>
        val params = graft.operators.VamanaIndex.Params(
          r = param("R", 64), l = param("L", 100), metric = vo.metric,
          numShards = numShards)
        Some(if (i8) rebuildVamanaInt8(idCol, field, params)
        else rebuildVamana(idCol, field, params))
      case "IVFPQ" | "GPU_IVFPQ" | "IVFPQ_RELAYOUT" =>
        val m = param("nsubvector", 64)
        Some(if (i8) rebuildIvfPqInt8(field, nc, m)
        else rebuildIvfPq(field, nc, m))
      case "SCANN" =>
        val m = param("nsubvector", 64)
        Some(if (i8) rebuildScannInt8(field, nc, m)
        else rebuildScann(field, nc, m))
      case "IVFRABITQ" =>
        Some(if (i8) rebuildIvfRabitqInt8(field, nc)
        else rebuildIvfRabitq(field, nc))
      case "BINARYIVF" =>
        Some(rebuildBinaryIvf(field, nc))
      case other =>
        throw new IllegalArgumentException(
          s"no declared-build path for index type '$other'")
    }
  }

  /** [[maybeAutoBuild]] generalized over the declared family: triggers
    * [[rebuildDeclared]] when the corpus reaches `trainingThreshold` and
    * the DECLARED family's generation is missing/failed.
    */
  def maybeAutoBuildDeclared(space: graft.schema.Space, field: String,
      trainingThreshold: Long, idCol: String = "_id",
      numShards: Int = 8): Boolean = {
    val vo = space.vectorFields.find(_.name == field).flatMap(_.vector)
    vo.map(_.indexType).getOrElse("FLAT") match {
      // no generation to build — return before the corpus count so a
      // periodic auto-build loop over a FLAT space never pays a scan
      case "FLAT" | "SCALAR" => false
      case t =>
        val st = t match {
          case "HNSW"                                   => hnswState
          case "DISKANN_STATIC" | "SSG"                 => vamanaState
          case "IVFPQ" | "GPU_IVFPQ" | "IVFPQ_RELAYOUT" => pqState
          case "SCANN"                                  => scannState
          case "IVFRABITQ"                              => rbState
          case "BINARYIVF"                              => bivfState
          case _                                        => state
        }
        st match {
          case _: Ready | _: Building => false
          case _ =>
            val n = spark.read.parquet(spacePath).count()
            if (n >= trainingThreshold)
              rebuildDeclared(space, field, idCol, numShards).isDefined
            else false
        }
    }
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
      graft.sources.IndexStore.invalidateOpen(indexPath(gen)) // cached plan pre-dates the new files
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

  // ── delete ledger (the reference's deleted-bitmap: engine.cc:869-899
  //    sets a bit, every index search gates candidates on
  //    IsValid = candidate ∧ ¬deleted, gamma_common_data.h:94-105). Here
  //    the ledger is an append-only sidecar of (ts, id) lines; a routed
  //    search reads the ids recorded SINCE its generation was built and
  //    gates on them — ids deleted before the build are already absent
  //    from the layout. The ledger is pruned at each rebuild, so its size
  //    is bounded by the deletes of one rebuild interval, never the
  //    corpus. ──────────────────────────────────────────────────────────

  private def deleteLedgerPath = s"$spacePath.delete_ledger"

  /** Record ids as deleted (call alongside the space-table delete). */
  def recordDeletes(ids: Seq[Long]): Unit = synchronized {
    if (ids.nonEmpty) {
      val ts = System.currentTimeMillis()
      val lines = ids.map(id => s"$ts $id").mkString("", "\n", "\n")
      SidecarIO.appendString(deleteLedgerPath, lines)
      recordMutations(ids.size.toLong)
    }
  }

  /** Ids deleted at-or-after `gen` (a generation's build-start stamp):
    * exactly the ids that may still be present in that generation's
    * layout. Conservative at the build-race margin — a delete recorded
    * during the build is gated even if the build already excluded it
    * (gating an absent id is a no-op).
    */
  def deletedSince(gen: Long): Set[Long] = {
    if (!SidecarIO.exists(deleteLedgerPath)) Set.empty
    else {
      val b = Set.newBuilder[Long]
      SidecarIO.readLines(deleteLedgerPath).foreach { line =>
        val t = line.trim
        if (t.nonEmpty) {
          val sp = t.indexOf(' ')
          if (sp > 0 && t.substring(0, sp).toLong >= gen)
            b += t.substring(sp + 1).toLong
        }
      }
      b.result()
    }
  }

  /** EVERY id currently in the delete ledger — the gate for serving
    * surfaces with no generation baseline (the FLAT fallback's live
    * view, the compaction fold): a delete must beat an EARLIER buffered
    * upsert of the same id whatever the query shape, mirroring the
    * reference's deleted-bitmap check that covers the memory buffer too
    * (engine.cc:869-899). Bounded like every ledger read — pruning at
    * READY flips keeps the file at one rebuild interval of deletes.
    * Margin (shared with the routed arms' `deletedSince` gates): a
    * ledger entry carries no ordering against tail writes, so an id
    * re-inserted AFTER its delete within the same interval stays gated
    * until the next fold.
    */
  def allDeletes(): Set[Long] = deletedSince(0L)

  /** Drop delete- AND mutation-ledger entries older than every live
    * generation — called after a rebuild flips READY (the new layout no
    * longer contains them; the churn they recorded no longer exerts
    * rebuild pressure). Entries newer than the OTHER kinds' generations
    * survive: the ledgers are shared across all six layout kinds, so
    * pruning keeps everything at-or-after the OLDEST live generation.
    *
    * If ANY kind is mid-BUILDING the prune defers entirely: an in-flight
    * generation's gate baseline is not derivable from its BUILDING stamp
    * (an appended graph's reaches back to the generation it grew from,
    * whose stamp the BUILDING marker has already replaced), so pruning
    * under it could drop entries that generation needs once it flips
    * READY — ghost results until the next delete. Every build ends in a
    * READY/FAILED flip whose own prune call runs then, so deferral is
    * bounded by one build.
    */
  /** BUILDING markers older than this age out as FAILED during
    * [[pruneLedgers]]: a crashed build never flips its marker, and a
    * forever-deferred prune lets both ledgers grow unbounded (re-read
    * in full on every gate/staleness check). Margin: a LIVE build that
    * genuinely outlasts the deadline gets its marker flipped underneath
    * it — it still finishes and flips READY (overwriting FAILED), but
    * ledger entries its append baseline needed may have been pruned in
    * the window. Raise the deadline when builds can legitimately run
    * longer than an hour.
    */
  @volatile var buildingStaleMs: Long = 3600000L

  private def pruneLedgers(): Unit = synchronized {
    // age out stale BUILDING markers first (crash leftovers), so one
    // dead build can't defer pruning forever
    val now = System.currentTimeMillis()
    Seq(statePath, vamanaStatePath, pqStatePath, rbStatePath,
      bivfStatePath, scannStatePath, hnswStatePath).foreach { sp =>
      readStateAt(sp) match {
        case Building(g) if now - g >= buildingStaleMs =>
          writeStateAt(sp, s"FAILED:$g:stale BUILDING marker aged out " +
            s"after ${now - g} ms (crashed build?)")
        case _ => ()
      }
    }
    val scanStates =
      Seq(state, vamanaState, pqState, rbState, bivfState, scannState)
    if ((scanStates :+ hnswState).exists(_.isInstanceOf[Building])) return
    // an appended HNSW generation's gate reaches back to its BASELINE
    val hnswFloor = hnswState match {
      case Ready(g, _, _) => Seq(hnswLedgerBase(g)); case _ => Nil
    }
    val oldest = (scanStates.collect { case Ready(g, _, _) => g } ++ hnswFloor)
      .minOption.getOrElse(Long.MaxValue)
    pruneLedgerFile(deleteLedgerPath, oldest)
    pruneLedgerFile(mutationLedgerPath, oldest)
  }

  /** Rewrite one `(ts, value)` ledger keeping entries at-or-after
    * `oldest` — both sidecars would otherwise grow without bound and be
    * re-read in full on every gate/staleness check.
    */
  private def pruneLedgerFile(path: String, oldest: Long): Unit =
    if (SidecarIO.exists(path)) {
      val kept = new StringBuilder
      SidecarIO.readLines(path).foreach { line =>
        val t = line.trim
        if (t.nonEmpty) {
          val sp = t.indexOf(' ')
          if (sp > 0 && t.substring(0, sp).toLong >= oldest)
            kept.append(t).append('\n')
        }
      }
      SidecarIO.writeString(path, kept.toString)
    }

  /** Restore the space table if a previous move-aside swap crashed
    * between its two renames — the instant where `spacePath` is absent
    * and the pre-op table sits whole under `.old`. Restoring `.old`
    * makes the crashed op a no-op (its `.tmp` is orphaned and
    * overwritten by the next attempt), so [[deleteByIds]]/[[forceMerge]]
    * are atomic-or-nothing instead of leaving READY states pointing at a
    * missing table. Called by both mutators before reading; safe to call
    * any time.
    */
  def recoverSwap(): Unit = {
    val p = new org.apache.hadoop.fs.Path(spacePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(s"$spacePath.old")
    if (!fs.exists(p) && fs.exists(old)) { fs.rename(old, p); () }
  }

  /** Delete-by-ids at the SPACE level: rewrite the live table without the
    * ids AND record them in the delete ledger so READY generations stop
    * serving them immediately — the reference's bitmap-delete contract
    * (engine.cc:869-899). The move-aside swap has ONE crash window
    * (between the two renames the space path is briefly absent);
    * [[recoverSwap]] closes it on the next open — data is under
    * `spacePath` or `spacePath.old` at every instant, never lost.
    */
  def deleteByIds(idCol: String, ids: Seq[Long]): Unit = {
    recoverSwap()
    val df = spark.read.parquet(spacePath)
    val remaining = graft.operators.Documents.deleteByIds(df, idCol, ids)
    val tmp = s"$spacePath.delete.tmp"
    remaining.write.mode("overwrite").parquet(tmp)
    val p = new org.apache.hadoop.fs.Path(spacePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(s"$spacePath.old")
    fs.delete(old, true)
    fs.rename(p, old)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), p)
    fs.delete(old, true)
    recordDeletes(ids)
  }

  /** Delete-by-PK for string-id spaces: resolves each `_id` to its
    * `_docid` sidecar ([[Ingest.assignDocids]]) so the ledger records
    * the ROUTING ids the index layouts and tail merges gate on — the
    * reference's bitmap delete likewise keys on the engine docid, not
    * the string PK (engine.cc:869-899 over the docid space). Same
    * swap-atomicity as [[deleteByIds]].
    */
  def deleteByPk(pkCol: String, pks: Seq[String],
      docidCol: String = "_docid"): Unit = {
    recoverSwap()
    val df = spark.read.parquet(spacePath)
    import spark.implicits._
    val docids = df.filter(col(pkCol).isin(pks: _*))
      .select(col(docidCol).cast("long")).as[Long].collect().toSeq
    val remaining = df.filter(!col(pkCol).isin(pks: _*))
    val tmp = s"$spacePath.delete.tmp"
    remaining.write.mode("overwrite").parquet(tmp)
    val p = new org.apache.hadoop.fs.Path(spacePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(s"$spacePath.old")
    fs.delete(old, true)
    fs.rename(p, old)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), p)
    fs.delete(old, true)
    recordDeletes(docids)
  }

  // ── mutation ledger: cumulative (ts, count) lines recording rows
  //    CHANGED in place (tail folds, deletes) — the churn a raw row-count
  //    staleness cannot see (an in-place UPDATE leaves count unchanged;
  //    a delete makes the delta negative). maybeRebuildHnsw reads churn
  //    since the build via [[mutationsSince]]. ─────────────────────────

  private def mutationLedgerPath = s"$spacePath.mutation_ledger"

  /** Record `n` rows of churn (folded tail rows, deletes). */
  def recordMutations(n: Long): Unit = synchronized {
    if (n > 0)
      SidecarIO.appendString(mutationLedgerPath,
        s"${System.currentTimeMillis()} $n\n")
  }

  /** Total churn recorded at-or-after `gen`. */
  def mutationsSince(gen: Long): Long = {
    if (!SidecarIO.exists(mutationLedgerPath)) 0L
    else {
      var total = 0L
      SidecarIO.readLines(mutationLedgerPath).foreach { line =>
        val t = line.trim
        if (t.nonEmpty) {
          val sp = t.indexOf(' ')
          if (sp > 0 && t.substring(0, sp).toLong >= gen)
            total += t.substring(sp + 1).toLong
        }
      }
      total
    }
  }

  /** The current READY index table, or None while missing/building. */
  def readyIndex(): Option[DataFrame] = state match {
    case Ready(gen, _, _) => Some(openLayout(indexPath(gen)))
    case _             => None
  }

  /** The READY generation stamp of the scan (IVF) layout, if any. */
  def readyGen(): Option[Long] = state match {
    case Ready(gen, _, _) => Some(gen); case _ => None
  }

  /** The READY generation stamp of the graph (HNSW) layout, if any. */
  def readyHnswGen(): Option[Long] = hnswState match {
    case Ready(gen, _, _) => Some(gen); case _ => None
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

  private def hnswStatePath = s"$spacePath$sfx.hnsw_state.json"
  // Graph layouts (HNSW/Vamana segment tables) write ONE ROW PER FILE
  // (`maxRecordsPerFile` 1): a segment row carries a whole serialized
  // shard (tens of MB at ~64k nodes), and a parquet row group holding
  // several of them makes the vectorized reader's per-batch column
  // vectors row-group-sized — at 2M vectors that OOMs the executors
  // (measured). One row per file caps a read task's transient memory at
  // one segment, the same bound the walk itself needs.
  private def hnswPath(gen: Long) = s"$spacePath$sfx.hnsw.g$gen"

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
        .write.option("maxRecordsPerFile", 1).mode("overwrite").parquet(hnswPath(gen))
      writeStateAt(hnswStatePath, s"READY:$gen:${params.numShards}:$trainedDocs")
      pruneLedgers()
      Ready(gen, params.numShards, trainedDocs)
    } catch {
      case e: Exception =>
        writeStateAt(hnswStatePath, s"FAILED:$gen:${e.getMessage}")
        throw e
    }
  }

  /** [[rebuildHnsw]] for an INT8 vector field (the reference builds the
    * graph families over INT8 too, index_model.h:19): the graph stores
    * the RAW code values widened to float ([[graft.functions.I8ToFloat]]
    * — NOT the b/127 grid), because small integers are exact in float
    * and the walk's Double-accumulated distances then equal the integer
    * kernels bit-for-bit. Serving quantizes the float query to the same
    * int8 domain and walks with the code values — routed scores are the
    * i8 kernels' scores exactly, so the route is oracle-exact at
    * `ef ≥ |shard|` like the float arm.
    */
  def rebuildHnswInt8(idCol: String, vecCol: String,
      params: graft.operators.HnswIndex.Params): Ready = {
    val gen = System.currentTimeMillis()
    writeStateAt(hnswStatePath, s"BUILDING:$gen:")
    try {
      val corpus = spark.read.parquet(spacePath)
        .withColumn("_i8f", graft.Graft.F.i8ToFloat(col(vecCol)))
      val trainedDocs = corpus.count()
      graft.operators.HnswIndex.build(corpus, idCol, "_i8f", params)
        .write.option("maxRecordsPerFile", 1).mode("overwrite").parquet(hnswPath(gen))
      writeStateAt(hnswStatePath, s"READY:$gen:${params.numShards}:$trainedDocs")
      pruneLedgers()
      Ready(gen, params.numShards, trainedDocs)
    } catch {
      case e: Exception =>
        writeStateAt(hnswStatePath, s"FAILED:$gen:${e.getMessage}")
        throw e
    }
  }

  /** Delete-ledger BASELINE sidecar for an appended generation: an
    * appended graph still carries every node of the generation it grew
    * from, so its delete gate must reach back to the ORIGINAL build's
    * stamp — not the append's. Absent sidecar = the generation was a
    * full rebuild; its own stamp is the baseline.
    */
  private def hnswBasePath(gen: Long) = s"${hnswPath(gen)}.ledger_base"

  def hnswLedgerBase(gen: Long): Long = {
    val p = hnswBasePath(gen)
    if (SidecarIO.exists(p)) SidecarIO.readString(p).trim.toLong else gen
  }

  /** The delete-gate baseline of the READY HNSW generation (what
    * [[deletedSince]] should be called with when serving it). */
  def hnswDeleteBaseline(): Option[Long] = hnswState match {
    case Ready(gen, _, _) => Some(hnswLedgerBase(gen))
    case _ => None
  }

  /** Incremental HNSW add — the reference's background Indexing loop
    * folds ONLY new vectors into the live graph (engine.cc:1084-1137,
    * AddRTVecsToIndex vector_manager.cc:678) instead of rebuilding over
    * the corpus. Cost ∝ |delta| + the touched shards; untouched shard
    * rows are copied through unchanged. Monotone new ids yield a
    * generation bit-identical to a full rebuild (HnswIndex.append doc).
    * The new generation inherits the OLD generation's delete-ledger
    * baseline: carried-over nodes may still contain ids deleted since
    * the original build, so the gate keeps covering them.
    */
  def appendHnsw(delta: DataFrame, idCol: String, vecCol: String,
      params: graft.operators.HnswIndex.Params): Ready = hnswState match {
    case Ready(oldGen, shards, trained) =>
      require(shards == params.numShards,
        s"appendHnsw numShards ${params.numShards} != READY generation's $shards")
      val base = hnswLedgerBase(oldGen)
      val gen = System.currentTimeMillis()
      writeStateAt(hnswStatePath, s"BUILDING:$gen:")
      try {
        import spark.implicits._
        val old = spark.read.parquet(hnswPath(oldGen))
          .as[graft.operators.HnswIndex.Segment]
        val deltaN = delta.count()
        graft.operators.HnswIndex.append(old, delta, idCol, vecCol, params)
          .write.option("maxRecordsPerFile", 1).mode("overwrite").parquet(hnswPath(gen))
        SidecarIO.writeString(hnswBasePath(gen), base.toString)
        writeStateAt(hnswStatePath,
          s"READY:$gen:${params.numShards}:${trained + deltaN}")
        pruneLedgers()
        Ready(gen, params.numShards, trained + deltaN)
      } catch {
        case e: Exception =>
          writeStateAt(hnswStatePath, s"FAILED:$gen:${e.getMessage}")
          throw e
      }
    case other =>
      throw new IllegalStateException(s"no READY HNSW generation to append to (state: $other)")
  }

  /** Layout DataFrames opened per (path) — `spark.read.parquet` lists
    * files and reads footers on EVERY call (one scheduler job per open),
    * which puts a fixed metadata job on every routed query. Generations
    * are immutable once READY (a rebuild writes a NEW gen path), so the
    * opened plan is cached per layout path for the lifecycle's lifetime.
    */
  // Round 21: the cache moved to [[graft.sources.IndexStore.openTable]]
  // (signature-keyed, shared across instances) — serving handlers
  // construct a fresh IndexLifecycle per request, so an instance-held
  // cache never survived to the next query and every routed search
  // re-paid the footer job.
  private def openLayout(path: String): org.apache.spark.sql.DataFrame =
    graft.sources.IndexStore.openTable(spark, path)

  /** The current READY HNSW segment table, or None while missing/building. */
  def readyHnswSegments(): Option[org.apache.spark.sql.Dataset[graft.operators.HnswIndex.Segment]] =
    hnswState match {
      case Ready(gen, _, _) =>
        import spark.implicits._
        Some(openLayout(hnswPath(gen))
          .as[graft.operators.HnswIndex.Segment])
      case _ => None
    }

  /** Build (or rebuild) a CLUSTERED (SPANN-routed) HNSW generation:
    * shards = coarse-quantizer lists, table written
    * `partitionBy(shard_id)` so query-time routing is parquet PARTITION
    * PRUNING ([[graft.operators.HnswIndex.buildClustered]]). The trained
    * quantizer persists as a sidecar next to the layout; its presence is
    * what routes [[SearchApi.searchAuto]] through
    * [[graft.operators.HnswIndex.searchRouted]] instead of the full
    * fan-out. Same sidecar/state machine as the hash-sharded generation
    * — the two are alternative layouts of the same graph kind.
    */
  def rebuildHnswClustered(idCol: String, vecCol: String,
      params: graft.operators.HnswIndex.Params, ncentroids: Int,
      maxShardRows: Int = 1 << 20): Ready = {
    val gen = System.currentTimeMillis()
    writeStateAt(hnswStatePath, s"BUILDING:$gen:")
    try {
      val corpus = spark.read.parquet(spacePath)
      val trainedDocs = corpus.count()
      val ivf = IvfIndex.train(corpus, vecCol, ncentroids)
      graft.operators.HnswIndex.buildClustered(corpus, idCol, vecCol,
          params.copy(numShards = ncentroids), ivf, maxShardRows)
        .write.option("maxRecordsPerFile", 1).mode("overwrite").partitionBy("shard_id").parquet(hnswPath(gen))
      graft.sources.IndexStore.writeIvfModel(s"${hnswPath(gen)}.ivf.txt", ivf)
      writeStateAt(hnswStatePath, s"READY:$gen:$ncentroids:$trainedDocs")
      pruneLedgers()
      Ready(gen, ncentroids, trainedDocs)
    } catch {
      case e: Exception =>
        writeStateAt(hnswStatePath, s"FAILED:$gen:${e.getMessage}")
        throw e
    }
  }

  /** Incremental add into the CLUSTERED HNSW generation: the delta's
    * vectors become fresh sub-segment rows appended into the SAME
    * generation's shard_id partitions ([[graft.operators.HnswIndex.appendClustered]]
    * — the posting-list append; routed search unions every row under a
    * probed shard). The generation stamp is unchanged, so the delete
    * ledger keeps covering the carried-over rows; `trainedDocs` grows by
    * the delta so drift staleness stays honest. Many appends accumulate
    * small sub-segments — [[rebuildHnswClustered]] compacts (the
    * reference's optimize pass).
    */
  def appendHnswClustered(delta: DataFrame, idCol: String, vecCol: String,
      params: graft.operators.HnswIndex.Params): Unit = hnswState match {
    case Ready(gen, shards, trained) =>
      val ivf = hnswRoutedModel().getOrElse(throw new IllegalStateException(
        "appendHnswClustered needs a CLUSTERED generation (quantizer sidecar missing)"))
      val deltaN = delta.count()
      graft.operators.HnswIndex.appendClustered(delta, idCol, vecCol,
          params.copy(numShards = ivf.ncentroids), ivf)
        .write.option("maxRecordsPerFile", 1).mode("append").partitionBy("shard_id").parquet(hnswPath(gen))
      graft.sources.IndexStore.invalidateOpen(hnswPath(gen)) // cached plan pre-dates the new files
      writeStateAt(hnswStatePath, s"READY:$gen:$shards:${trained + deltaN}")
    case other =>
      throw new IllegalStateException(s"no READY HNSW generation to append to (state: $other)")
  }

  /** The READY HNSW generation's routing quantizer, if it was built
    * clustered — None for hash-sharded generations (full fan-out).
    */
  def hnswRoutedModel(metric: String = "l2"): Option[IvfIndex.Model] =
    hnswState match {
      case Ready(gen, _, _) =>
        val p = s"${hnswPath(gen)}.ivf.txt"
        if (SidecarIO.exists(p))
          Some(graft.sources.IndexStore.readIvfModel(p).copy(metric = metric))
        else None
      case _ => None
    }

  /** Staleness of the HNSW generation: the larger of (a) space GROWTH
    * since the build — `max(0, now − trained) / trained` — and (b) the
    * CHURN recorded in the mutation ledger since the build (tail rows
    * folded in place, deletes). Raw row-count deltas alone are blind to
    * in-place updates (count unchanged, graph holds the old vectors) and
    * read NEGATIVE under deletes; the churn term keeps the drift trigger
    * honest for both. Serving stays fresh in the interim through
    * [[graft.streaming.RealtimeTail.searchHnsw]]'s brute tail leg and the
    * delete-ledger gate.
    */
  def hnswStaleness(): Option[Double] = hnswState match {
    case Ready(gen, _, trained) if trained > 0 =>
      val now = spark.read.parquet(spacePath).count()
      val grown = math.max(0L, now - trained)
      // churn counts from the LEDGER BASELINE: an appended generation
      // still carries the original build's nodes, so churn (deletes,
      // in-place folds) recorded before the append keeps exerting
      // rebuild pressure until a FULL rebuild clears it
      Some(math.max(grown, mutationsSince(hnswLedgerBase(gen))).toDouble / trained)
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

  // ── IVFPQ generation: residual PQ codes inside coarse lists (the
  //    reference's default compressed index, gamma_index_ivfpq.cc) over
  //    its own sidecar — a space declares ONE index type, but keeping
  //    each kind's generation separate lets tests/tools hold several.

  private def pqStatePath = s"$spacePath$sfx.pq_state.json"
  private def pqPath(gen: Long) = s"$spacePath$sfx.pq.g$gen"

  def pqState: State = readStateAt(pqStatePath)

  /** Build (or rebuild) the IVFPQ generation: coarse quantizer + residual
    * codebooks trained on the space, codes written
    * `partitionBy(list_id)` (probe = partition pruning), models persisted
    * as sidecars. The residual flavor is the adopted default (matches
    * faiss IVFPQ and won the RecallGateSpec codebook head-to-head).
    */
  def rebuildIvfPq(vecCol: String, ncentroids: Int, m: Int,
      ksub: Int = 256): Ready = {
    val gen = System.currentTimeMillis()
    writeStateAt(pqStatePath, s"BUILDING:$gen:")
    try {
      val corpus = spark.read.parquet(spacePath)
      val trainedDocs = corpus.count()
      val dim = corpus.select(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.col(vecCol))).head().getInt(0)
      val ivf = IvfIndex.train(corpus, vecCol, ncentroids)
      val assigned = IvfIndex.assign(corpus, vecCol, ivf)
      val pq = graft.operators.PqIndex.trainResidual(assigned, vecCol, dim, m,
        ivf, ksub = ksub, maxTrainRows = 200000L, maxIter = 8)
      graft.operators.PqIndex.encodeResidual(assigned, vecCol, ivf, pq)
        .write.mode("overwrite").partitionBy("list_id").parquet(pqPath(gen))
      graft.sources.IndexStore.writeIvfModel(s"${pqPath(gen)}.ivf.txt", ivf)
      graft.sources.IndexStore.writePqModel(s"${pqPath(gen)}.pq.txt", pq)
      writeStateAt(pqStatePath, s"READY:$gen:$ncentroids:$trainedDocs")
      pruneLedgers()
      Ready(gen, ncentroids, trainedDocs)
    } catch {
      case e: Exception =>
        writeStateAt(pqStatePath, s"FAILED:$gen:${e.getMessage}")
        throw e
    }
  }

  /** [[rebuildIvfPq]] for an INT8 vector field: the coarse quantizer and
    * residual codebooks train in the raw-code float domain
    * ([[graft.functions.I8ToFloat]] — same domain as the int8 graph
    * builds), the layout keeps the compact int8 codes (the float view is
    * dropped before write: it would duplicate `vecCol` at 4×), and
    * serving reranks the recallNum shortlist with the integer kernels —
    * full probe + deep recall stays exact (reference: INT8 across every
    * family, index_model.h:19).
    */
  def rebuildIvfPqInt8(vecCol: String, ncentroids: Int, m: Int,
      ksub: Int = 256): Ready = {
    val gen = System.currentTimeMillis()
    writeStateAt(pqStatePath, s"BUILDING:$gen:")
    try {
      val corpus = spark.read.parquet(spacePath)
        .withColumn("_i8f", graft.Graft.F.i8ToFloat(col(vecCol)))
      val trainedDocs = corpus.count()
      val dim = corpus.select(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.col("_i8f"))).head().getInt(0)
      val ivf = IvfIndex.train(corpus, "_i8f", ncentroids)
      val assigned = IvfIndex.assign(corpus, "_i8f", ivf)
      val pq = graft.operators.PqIndex.trainResidual(assigned, "_i8f", dim, m,
        ivf, ksub = ksub, maxTrainRows = 200000L, maxIter = 8)
      graft.operators.PqIndex.encodeResidual(assigned, "_i8f", ivf, pq)
        .drop("_i8f")
        .write.mode("overwrite").partitionBy("list_id").parquet(pqPath(gen))
      graft.sources.IndexStore.writeIvfModel(s"${pqPath(gen)}.ivf.txt", ivf)
      graft.sources.IndexStore.writePqModel(s"${pqPath(gen)}.pq.txt", pq)
      writeStateAt(pqStatePath, s"READY:$gen:$ncentroids:$trainedDocs")
      pruneLedgers()
      Ready(gen, ncentroids, trainedDocs)
    } catch {
      case e: Exception =>
        writeStateAt(pqStatePath, s"FAILED:$gen:${e.getMessage}")
        throw e
    }
  }

  /** Incremental add into the READY IVFPQ generation — the reference's
    * background loop folds new vectors into every index without
    * retraining (engine.cc:1084-1137): the delta encodes through the
    * STORED coarse quantizer + residual codebooks and parquet-appends
    * into the generation's `list_id` partitions. Cost ∝ |delta| (the
    * existing codes are untouched); probed searches see the new rows
    * immediately. Append ≡ re-encoding the full corpus with the same
    * models (the codes are a pure per-row function of (vector, models) —
    * spec-asserted). Codebook drift is the next rebuild's job:
    * `trainedDocs` stays at the trained count while the layout grows, so
    * [[staleness]]-style drift triggers keep firing.
    */
  def appendIvfPq(delta: DataFrame, vecCol: String): Unit = pqState match {
    case Ready(gen, _, _) =>
      val (_, ivf, pq) = readyIvfPq().getOrElse(
        throw new IllegalStateException("READY IVFPQ state without models"))
      graft.operators.PqIndex.encodeResidual(
          IvfIndex.assign(delta, vecCol, ivf), vecCol, ivf, pq)
        .write.mode("append").partitionBy("list_id").parquet(pqPath(gen))
      graft.sources.IndexStore.invalidateOpen(pqPath(gen)) // cached plan pre-dates the new files
    case other =>
      throw new IllegalStateException(
        s"no READY IVFPQ generation to append to (state: $other)")
  }

  /** The READY IVFPQ layout + its models, or None. */
  def readyIvfPq(metric: String = "l2")
      : Option[(DataFrame, IvfIndex.Model, graft.operators.PqIndex.Model)] =
    pqState match {
      case Ready(gen, _, _) =>
        Some((openLayout(pqPath(gen)),
          graft.sources.IndexStore.readIvfModel(s"${pqPath(gen)}.ivf.txt")
            .copy(metric = metric),
          graft.sources.IndexStore.readPqModel(s"${pqPath(gen)}.pq.txt")
            .copy(metric = metric)))
      case _ => None
    }

  def readyPqGen(): Option[Long] = pqState match {
    case Ready(gen, _, _) => Some(gen); case _ => None
  }

  // ── SCANN generation: IVF + ANISOTROPIC (score-aware) residual PQ —
  //    the algorithm class behind the reference's wrapped ScaNN index
  //    (impl/scann/; published as Guo et al., ICML 2020). Same layout
  //    shape and serving route as IVFPQ (coarse probe ∘ ADC ∘ rerank);
  //    what differs is the TRAINING objective (parallel quantization
  //    error weighted η) and the encode-time assignment (same loss).

  private def scannStatePath = s"$spacePath$sfx.scann_state.json"
  private def scannPath(gen: Long) = s"$spacePath$sfx.scann.g$gen"

  def scannState: State = readStateAt(scannStatePath)

  /** Build (or rebuild) the SCANN generation: coarse quantizer +
    * anisotropic residual codebooks, codes written `partitionBy(list_id)`
    * (probe = partition pruning), models persisted as sidecars.
    * `eta ≤ 0` selects the paper's threshold rule at T = 0.2.
    */
  def rebuildScann(vecCol: String, ncentroids: Int, m: Int,
      ksub: Int = 256, eta: Double = 0.0): Ready = {
    val gen = System.currentTimeMillis()
    writeStateAt(scannStatePath, s"BUILDING:$gen:")
    try {
      val corpus = spark.read.parquet(spacePath)
      val trainedDocs = corpus.count()
      val dim = corpus.select(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.col(vecCol))).head().getInt(0)
      val ivf = IvfIndex.train(corpus, vecCol, ncentroids)
      val assigned = IvfIndex.assign(corpus, vecCol, ivf)
      val pq = graft.operators.PqIndex.trainResidualAnisotropic(assigned,
        vecCol, dim, m, ivf, ksub = ksub, eta = eta,
        maxTrainRows = 200000L, maxIter = 8)
      graft.operators.PqIndex.encodeResidualAnisotropic(assigned, vecCol,
          ivf, pq, eta = eta)
        .write.mode("overwrite").partitionBy("list_id").parquet(scannPath(gen))
      graft.sources.IndexStore.writeIvfModel(s"${scannPath(gen)}.ivf.txt", ivf)
      graft.sources.IndexStore.writePqModel(s"${scannPath(gen)}.pq.txt", pq)
      writeStateAt(scannStatePath, s"READY:$gen:$ncentroids:$trainedDocs")
      pruneLedgers()
      Ready(gen, ncentroids, trainedDocs)
    } catch {
      case e: Exception =>
        writeStateAt(scannStatePath, s"FAILED:$gen:${e.getMessage}")
        throw e
    }
  }

  /** [[rebuildScann]] for an INT8 vector field — anisotropic codebooks
    * in the raw-code float domain (the score-aware loss is
    * scale-covariant, so the ×127 domain trains identically up to
    * scale), compact int8 codes kept, integer-kernel rerank at serve
    * time (see [[rebuildIvfPqInt8]]).
    */
  def rebuildScannInt8(vecCol: String, ncentroids: Int, m: Int,
      ksub: Int = 256, eta: Double = 0.0): Ready = {
    val gen = System.currentTimeMillis()
    writeStateAt(scannStatePath, s"BUILDING:$gen:")
    try {
      val corpus = spark.read.parquet(spacePath)
        .withColumn("_i8f", graft.Graft.F.i8ToFloat(col(vecCol)))
      val trainedDocs = corpus.count()
      val dim = corpus.select(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.col("_i8f"))).head().getInt(0)
      val ivf = IvfIndex.train(corpus, "_i8f", ncentroids)
      val assigned = IvfIndex.assign(corpus, "_i8f", ivf)
      val pq = graft.operators.PqIndex.trainResidualAnisotropic(assigned,
        "_i8f", dim, m, ivf, ksub = ksub, eta = eta,
        maxTrainRows = 200000L, maxIter = 8)
      graft.operators.PqIndex.encodeResidualAnisotropic(assigned, "_i8f",
          ivf, pq, eta = eta)
        .drop("_i8f")
        .write.mode("overwrite").partitionBy("list_id").parquet(scannPath(gen))
      graft.sources.IndexStore.writeIvfModel(s"${scannPath(gen)}.ivf.txt", ivf)
      graft.sources.IndexStore.writePqModel(s"${scannPath(gen)}.pq.txt", pq)
      writeStateAt(scannStatePath, s"READY:$gen:$ncentroids:$trainedDocs")
      pruneLedgers()
      Ready(gen, ncentroids, trainedDocs)
    } catch {
      case e: Exception =>
        writeStateAt(scannStatePath, s"FAILED:$gen:${e.getMessage}")
        throw e
    }
  }

  /** The READY SCANN layout + its models, or None. */
  def readyScann(metric: String = "ip")
      : Option[(DataFrame, IvfIndex.Model, graft.operators.PqIndex.Model)] =
    scannState match {
      case Ready(gen, _, _) =>
        Some((openLayout(scannPath(gen)),
          graft.sources.IndexStore.readIvfModel(s"${scannPath(gen)}.ivf.txt")
            .copy(metric = metric),
          graft.sources.IndexStore.readPqModel(s"${scannPath(gen)}.pq.txt")
            .copy(metric = metric)))
      case _ => None
    }

  def readyScannGen(): Option[Long] = scannState match {
    case Ready(gen, _, _) => Some(gen); case _ => None
  }

  // ── IVFRABITQ generation: per-list residual sign codes (RaBitQ class)
  //    over its own sidecar; search = coarse probe ∘ qb-estimator
  //    shortlist ∘ exact rerank (gamma_index_ivfrabitq.cc).

  private def rbStatePath = s"$spacePath$sfx.rb_state.json"
  private def rbPath(gen: Long) = s"$spacePath$sfx.rb.g$gen"

  def rbState: State = readStateAt(rbStatePath)

  def rebuildIvfRabitq(vecCol: String, ncentroids: Int): Ready = {
    val gen = System.currentTimeMillis()
    writeStateAt(rbStatePath, s"BUILDING:$gen:")
    try {
      val corpus = spark.read.parquet(spacePath)
      val trainedDocs = corpus.count()
      val ivf = IvfIndex.train(corpus, vecCol, ncentroids)
      graft.operators.BinaryIndex.encodeResidual(
          IvfIndex.assign(corpus, vecCol, ivf), vecCol, ivf)
        .write.mode("overwrite").partitionBy("list_id").parquet(rbPath(gen))
      graft.sources.IndexStore.writeIvfModel(s"${rbPath(gen)}.ivf.txt", ivf)
      writeStateAt(rbStatePath, s"READY:$gen:$ncentroids:$trainedDocs")
      pruneLedgers()
      Ready(gen, ncentroids, trainedDocs)
    } catch {
      case e: Exception =>
        writeStateAt(rbStatePath, s"FAILED:$gen:${e.getMessage}")
        throw e
    }
  }

  /** [[rebuildIvfRabitq]] for an INT8 vector field — quantizer and
    * residual sign codes in the raw-code float domain, compact int8
    * codes kept, integer-kernel rerank at serve time (see
    * [[rebuildIvfPqInt8]]).
    */
  def rebuildIvfRabitqInt8(vecCol: String, ncentroids: Int): Ready = {
    val gen = System.currentTimeMillis()
    writeStateAt(rbStatePath, s"BUILDING:$gen:")
    try {
      val corpus = spark.read.parquet(spacePath)
        .withColumn("_i8f", graft.Graft.F.i8ToFloat(col(vecCol)))
      val trainedDocs = corpus.count()
      val ivf = IvfIndex.train(corpus, "_i8f", ncentroids)
      graft.operators.BinaryIndex.encodeResidual(
          IvfIndex.assign(corpus, "_i8f", ivf), "_i8f", ivf)
        .drop("_i8f")
        .write.mode("overwrite").partitionBy("list_id").parquet(rbPath(gen))
      graft.sources.IndexStore.writeIvfModel(s"${rbPath(gen)}.ivf.txt", ivf)
      writeStateAt(rbStatePath, s"READY:$gen:$ncentroids:$trainedDocs")
      pruneLedgers()
      Ready(gen, ncentroids, trainedDocs)
    } catch {
      case e: Exception =>
        writeStateAt(rbStatePath, s"FAILED:$gen:${e.getMessage}")
        throw e
    }
  }

  /** Incremental add into the READY IVFRABITQ generation — the delta's
    * residual sign codes derive from the STORED quantizer and append
    * into the `list_id` partitions ([[appendIvfPq]]'s contract for the
    * 1-bit family).
    */
  def appendIvfRabitq(delta: DataFrame, vecCol: String): Unit = rbState match {
    case Ready(gen, _, _) =>
      val (_, ivf) = readyIvfRabitq().getOrElse(
        throw new IllegalStateException("READY IVFRABITQ state without quantizer"))
      graft.operators.BinaryIndex.encodeResidual(
          IvfIndex.assign(delta, vecCol, ivf), vecCol, ivf)
        .write.mode("append").partitionBy("list_id").parquet(rbPath(gen))
      graft.sources.IndexStore.invalidateOpen(rbPath(gen)) // cached plan pre-dates the new files
    case other =>
      throw new IllegalStateException(
        s"no READY IVFRABITQ generation to append to (state: $other)")
  }

  /** The READY IVFRABITQ layout + quantizer, or None. */
  def readyIvfRabitq(metric: String = "l2")
      : Option[(DataFrame, IvfIndex.Model)] = rbState match {
    case Ready(gen, _, _) =>
      Some((openLayout(rbPath(gen)),
        graft.sources.IndexStore.readIvfModel(s"${rbPath(gen)}.ivf.txt")
          .copy(metric = metric)))
    case _ => None
  }

  def readyRbGen(): Option[Long] = rbState match {
    case Ready(gen, _, _) => Some(gen); case _ => None
  }

  // ── BINARYIVF generation: Hamming coarse quantizer over the packed
  //    codes (gamma_index_binary_ivf.cc / faiss IndexBinaryIVF) — for
  //    value_type=binary vector fields whose column IS the code.

  private def bivfStatePath = s"$spacePath$sfx.bivf_state.json"
  private def bivfPath(gen: Long) = s"$spacePath$sfx.bivf.g$gen"

  def bivfState: State = readStateAt(bivfStatePath)

  def rebuildBinaryIvf(codeCol: String, ncentroids: Int): Ready = {
    val gen = System.currentTimeMillis()
    writeStateAt(bivfStatePath, s"BUILDING:$gen:")
    try {
      val corpus = spark.read.parquet(spacePath)
      val trainedDocs = corpus.count()
      val cents = graft.operators.BinaryIndex.trainBinary(
        corpus, "_id", codeCol, ncentroids)
      graft.operators.BinaryIndex.buildTableBinary(corpus, codeCol, cents,
        bivfPath(gen))
      graft.sources.IndexStore.writeBinaryCentroids(
        s"${bivfPath(gen)}.cents.txt", cents)
      writeStateAt(bivfStatePath, s"READY:$gen:${cents.length}:$trainedDocs")
      pruneLedgers()
      Ready(gen, cents.length, trainedDocs)
    } catch {
      case e: Exception =>
        writeStateAt(bivfStatePath, s"FAILED:$gen:${e.getMessage}")
        throw e
    }
  }

  /** Incremental add into the READY BINARYIVF generation — the delta's
    * packed codes assign to their Hamming-nearest STORED centroid and
    * append into the `list_id` partitions ([[appendIvfPq]]'s contract
    * for the binary-valued family).
    */
  def appendBinaryIvf(delta: DataFrame, codeCol: String): Unit = bivfState match {
    case Ready(gen, _, _) =>
      val (_, cents) = readyBinaryIvf().getOrElse(
        throw new IllegalStateException("READY BINARYIVF state without centroids"))
      graft.operators.BinaryIndex.assignBinary(delta, codeCol, cents)
        .write.mode("append").partitionBy("list_id").parquet(bivfPath(gen))
      graft.sources.IndexStore.invalidateOpen(bivfPath(gen)) // cached plan pre-dates the new files
    case other =>
      throw new IllegalStateException(
        s"no READY BINARYIVF generation to append to (state: $other)")
  }

  /** The READY BINARYIVF layout + centroid codes, or None. */
  def readyBinaryIvf(): Option[(DataFrame, Array[Array[Byte]])] =
    bivfState match {
      case Ready(gen, _, _) =>
        Some((openLayout(bivfPath(gen)),
          graft.sources.IndexStore.readBinaryCentroids(s"${bivfPath(gen)}.cents.txt")))
      case _ => None
    }

  def readyBivfGen(): Option[Long] = bivfState match {
    case Ready(gen, _, _) => Some(gen); case _ => None
  }

  // ── DiskANN-static (Vamana) generation: same BUILDING→READY/FAILED
  //    contract over its own sidecar. STATIC by definition (the
  //    reference's DiskANN class rebuilds rather than appends), so there
  //    is no appendVamana and the ledger baseline is always the
  //    generation's own stamp.

  private def vamanaStatePath = s"$spacePath$sfx.vamana_state.json"
  private def vamanaPath(gen: Long) = s"$spacePath$sfx.vamana.g$gen"

  def vamanaState: State = readStateAt(vamanaStatePath)

  /** Build (or rebuild) the Vamana generation; `ncentroids` in the
    * returned Ready carries `numShards`.
    */
  def rebuildVamana(idCol: String, vecCol: String,
      params: graft.operators.VamanaIndex.Params): Ready = {
    val gen = System.currentTimeMillis()
    writeStateAt(vamanaStatePath, s"BUILDING:$gen:")
    try {
      val corpus = spark.read.parquet(spacePath)
      val trainedDocs = corpus.count()
      graft.operators.VamanaIndex.build(corpus, idCol, vecCol, params)
        .write.option("maxRecordsPerFile", 1).mode("overwrite").parquet(vamanaPath(gen))
      writeStateAt(vamanaStatePath, s"READY:$gen:${params.numShards}:$trainedDocs")
      pruneLedgers()
      Ready(gen, params.numShards, trainedDocs)
    } catch {
      case e: Exception =>
        writeStateAt(vamanaStatePath, s"FAILED:$gen:${e.getMessage}")
        throw e
    }
  }

  /** [[rebuildVamana]] for an INT8 vector field — the same raw-code
    * float domain as [[rebuildHnswInt8]] (small integers are exact in
    * float; the walk's Double-accumulated distances equal the integer
    * kernels bit-for-bit), over the DiskANN-static graph family
    * (reference: INT8 across every index family, index_model.h:19).
    */
  def rebuildVamanaInt8(idCol: String, vecCol: String,
      params: graft.operators.VamanaIndex.Params): Ready = {
    val gen = System.currentTimeMillis()
    writeStateAt(vamanaStatePath, s"BUILDING:$gen:")
    try {
      val corpus = spark.read.parquet(spacePath)
        .withColumn("_i8f", graft.Graft.F.i8ToFloat(col(vecCol)))
      val trainedDocs = corpus.count()
      graft.operators.VamanaIndex.build(corpus, idCol, "_i8f", params)
        .write.option("maxRecordsPerFile", 1).mode("overwrite").parquet(vamanaPath(gen))
      writeStateAt(vamanaStatePath, s"READY:$gen:${params.numShards}:$trainedDocs")
      pruneLedgers()
      Ready(gen, params.numShards, trainedDocs)
    } catch {
      case e: Exception =>
        writeStateAt(vamanaStatePath, s"FAILED:$gen:${e.getMessage}")
        throw e
    }
  }

  /** Build (or rebuild) a CLUSTERED (SPANN-routed) Vamana generation:
    * shards = coarse-quantizer lists, table written
    * `partitionBy(shard_id)` so query-time routing is parquet PARTITION
    * PRUNING ([[graft.operators.VamanaIndex.buildClustered]]) — the
    * routed layout [[rebuildHnswClustered]] gives the graph kind,
    * applied to the storage-resident family. The trained quantizer
    * persists as a sidecar; its presence routes
    * [[SearchApi.searchAuto]]'s DISKANN arm through nprobe shard
    * pruning instead of the full fan-out.
    */
  def rebuildVamanaClustered(idCol: String, vecCol: String,
      params: graft.operators.VamanaIndex.Params, ncentroids: Int,
      maxShardRows: Int = 1 << 20): Ready = {
    val gen = System.currentTimeMillis()
    writeStateAt(vamanaStatePath, s"BUILDING:$gen:")
    try {
      val corpus = spark.read.parquet(spacePath)
      val trainedDocs = corpus.count()
      val ivf = IvfIndex.train(corpus, vecCol, ncentroids)
      graft.operators.VamanaIndex.buildClustered(corpus, idCol, vecCol,
          params.copy(numShards = ncentroids), ivf, maxShardRows)
        .write.option("maxRecordsPerFile", 1).mode("overwrite").partitionBy("shard_id").parquet(vamanaPath(gen))
      graft.sources.IndexStore.writeIvfModel(s"${vamanaPath(gen)}.ivf.txt", ivf)
      writeStateAt(vamanaStatePath, s"READY:$gen:$ncentroids:$trainedDocs")
      pruneLedgers()
      Ready(gen, ncentroids, trainedDocs)
    } catch {
      case e: Exception =>
        writeStateAt(vamanaStatePath, s"FAILED:$gen:${e.getMessage}")
        throw e
    }
  }

  /** The READY Vamana generation's routing quantizer, if it was built
    * clustered — None for hash-sharded generations (full fan-out).
    */
  def vamanaRoutedModel(metric: String = "l2"): Option[IvfIndex.Model] =
    vamanaState match {
      case Ready(gen, _, _) =>
        val p = s"${vamanaPath(gen)}.ivf.txt"
        if (SidecarIO.exists(p))
          Some(graft.sources.IndexStore.readIvfModel(p).copy(metric = metric))
        else None
      case _ => None
    }

  /** The current READY Vamana segment table, or None. */
  def readyVamanaSegments(): Option[org.apache.spark.sql.Dataset[graft.operators.VamanaIndex.Segment]] =
    vamanaState match {
      case Ready(gen, _, _) =>
        import spark.implicits._
        Some(openLayout(vamanaPath(gen))
          .as[graft.operators.VamanaIndex.Segment])
      case _ => None
    }

  def readyVamanaGen(): Option[Long] = vamanaState match {
    case Ready(gen, _, _) => Some(gen); case _ => None
  }

  /** Force-merge ≡ compaction: rewrite the space with a target file count
    * (POST /index/forcemerge → Optimize(), handler_document.go:468-476).
    */
  def forceMerge(targetFiles: Int = 1): Unit = {
    recoverSwap()
    val df = spark.read.parquet(spacePath).coalesce(targetFiles)
    val tmp = s"$spacePath.merge.tmp"
    df.write.mode("overwrite").parquet(tmp)
    // move-aside swap: a crash mid-merge never loses the table (data is
    // at spacePath or spacePath.old at every instant; the brief
    // absent-path window between the renames is closed by recoverSwap)
    val p = new org.apache.hadoop.fs.Path(spacePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(s"$spacePath.old")
    fs.delete(old, true)
    fs.rename(p, old)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), p)
    fs.delete(old, true)
    ()
  }

  /** Drop EVERY generation of EVERY layout kind and field scope of this
    * space — the mass-delete fallback
    * ([[graft.schema.SpaceCatalog.deleteByQuery]] above its ledger cap):
    * a delete invalidating most of a layout is a rebuild in the
    * reference too (engine.cc:1013-1083). With no READY state the
    * router serves exact FLAT over the rewritten base — ghost-free by
    * construction — until the next explicit/drift build.
    */
  def dropAllGenerations(): Unit = synchronized {
    val hp = new org.apache.hadoop.fs.Path(spacePath)
    val parent = hp.getParent
    if (parent != null) {
      val re = (java.util.regex.Pattern.quote(hp.getName) +
        """(\.[^.]+)?\.(index|hnsw|pq|scann|rb|bivf|vamana)(_state\.json$|\.g\d+)""").r
      SidecarIO.listNames(parent.toString)
        .filter(n => re.findPrefixMatchOf(n).isDefined)
        .foreach(n => SidecarIO.delete(s"$parent/$n"))
    }
  }

  /** Remove the index (state + generations). */
  def drop(): Unit = {
    val p = new org.apache.hadoop.fs.Path(spacePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    state match {
      case Ready(gen, _, _) =>
        fs.delete(new org.apache.hadoop.fs.Path(indexPath(gen)), true)
        fs.delete(new org.apache.hadoop.fs.Path(s"${indexPath(gen)}.centroids"), true)
      case _ =>
    }
    SidecarIO.delete(statePath)
    ()
  }
}
