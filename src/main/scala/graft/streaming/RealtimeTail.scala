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
object RealtimeTail {
  /** (tailPath, routing column) → (directory signature, distinct routing
    * ids). See the note at the use site — shared across instances because
    * handlers construct one RealtimeTail per request.
    */
  private val tailIdsCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), (String, Array[Long])]
}

final class RealtimeTail(
    spark: SparkSession,
    val basePath: String,
    val tailPath: String,
    checkpointPath: String,
    idCol: String,
    // column that orders writes to the same id (event time / sequence);
    // without it, id collisions WITHIN the tail resolve arbitrarily — pass
    // one whenever the stream can re-deliver an id
    orderCol: Option[String] = None,
    // the ROUTING id column: the long column index hits and delete-ledger
    // entries reference. Defaults to `idCol` (integral-PK spaces); a
    // string-PK space passes its `_docid` sidecar (the reference maps
    // every string _id to an int docid at ingest so indexes never see
    // strings, engine.cc:730-745) — dedup/upsert stay PK-keyed on
    // `idCol`, merges and delete gates key on this column
    ridCol: Option[String] = None) {

  private def rid: String = ridCol.getOrElse(idCol)

  /** The routing id column merges and delete gates key on (see `ridCol`). */
  private[graft] def routingCol: String = rid

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

  /** Whether a tail table exists (fresh writes not yet folded into the
    * base). Serving paths use this to decide between the plain indexed
    * route and the base ∪ tail merge.
    */
  def hasTail: Boolean = {
    val p = new org.apache.hadoop.fs.Path(tailPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p)
  }

  /** Cap above which the per-snapshot tail-id collect is skipped and the
    * merge falls back to the distributed count + anti-join. One refresh
    * interval of ingest stays far below this in any sane configuration;
    * the cap only guards a misconfigured never-compacting tail.
    * ~4M longs ≈ 32 MB driver-side.
    */
  @volatile var maxTailIdCollect: Int = 1 << 22

  // (signature → distinct routing ids of the tail): the tail only
  // changes at trigger boundaries, so every query between folds reuses
  // one collect instead of running a count job + a distributed
  // anti-join build per search (the fixed per-query latency tax on the
  // realtime serving path). The signature is the tail directory's
  // (name, length, mtime) listing — exactly what a new micro-batch or a
  // compaction changes. The cache lives on the companion object keyed by
  // tail PATH (round 21): serving handlers construct a fresh
  // RealtimeTail per request, so an instance field never survived to the
  // next query and every search re-paid the collect; the signature check
  // still invalidates on any tail write/fold, and parquet part files
  // carry per-write UUID names so a content change always changes the
  // signature.

  private def tailSignature(): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(tailPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else Some(fs.listStatus(p).map(s =>
      s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
      .sorted.mkString(","))
  }

  /** The tail's distinct routing ids (PRE-deny — per-query deny sets
    * subtract driver-side), collected once per tail snapshot. None when
    * the tail exceeds [[maxTailIdCollect]] (caller falls back to the
    * distributed path).
    */
  private def tailRidArray(tail: DataFrame): Option[Array[Long]] =
    tailSignature() match {
      case None => Some(Array.empty[Long])
      case Some(sig) =>
        RealtimeTail.tailIdsCache.get((tailPath, rid)) match {
          case Some((s, ids)) if s == sig => Some(ids)
          case _ =>
            val rows = tail.select(col(rid).cast("long")).distinct()
              .limit(maxTailIdCollect + 1).collect()
            if (rows.length > maxTailIdCollect) None
            else {
              val ids = rows.map(_.getLong(0))
              RealtimeTail.tailIdsCache.put((tailPath, rid), (sig, ids))
              Some(ids)
            }
        }
    }

  /** Anti-join base hits against the (bounded) collected tail ids:
    * literal NOT-IN for tiny tails, broadcast anti-join above the same
    * size switch as the deny gates.
    */
  private def dropTailIds(baseHits: DataFrame, ids: Array[Long]): DataFrame =
    if (ids.isEmpty) baseHits
    else if (ids.length <= 1000)
      baseHits.filter(!col("vec_id").isin(ids.toIndexedSeq: _*))
    else {
      val spark = baseHits.sparkSession
      import spark.implicits._
      baseHits.join(broadcast(ids.toIndexedSeq.toDF("vec_id")),
        Seq("vec_id"), "left_anti")
    }

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
    // project exactly the requested fields: partition DISCOVERY appends
    // physical routing columns (a bucketed catalog table's `_bucket=N`
    // dirs) on top of the user schema, and a base∪tail union would then
    // fail on the tail's missing column
    else spark.read.schema(schema).parquet(path)
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
  }

  /** Unified view: base rows not superseded by tail, plus all tail rows
    * (id-level last-write-wins, the upsert merge semantics).
    */
  def snapshot(schema: StructType): DataFrame = snapshot(schema, Set.empty)

  /** Delete-aware unified view: `deny` (the space's delete ledger,
    * [[graft.api.IndexLifecycle.allDeletes]]) gates the TAIL leg before
    * the upsert — a delete beats an earlier buffered write of the same
    * id, so the id never resurfaces through a fallback (FLAT / filtered
    * / multi-vector) search even while its row still sits in the
    * buffer. The base leg needs no gate: the space-level delete already
    * rewrote the base table. Mirrors the reference's deleted-bitmap
    * check, which covers the memory buffer too (engine.cc:869-899).
    */
  def snapshot(schema: StructType, deny: Set[Long]): DataFrame =
    graft.operators.Documents.upsert(
      readOrEmpty(basePath, schema), buffered(schema, deny), idCol)

  /** The buffered rows alone — deduped (id-level last write wins) and
    * delete-gated: what a compaction folds into the base, and the tail
    * leg every merge scores.
    */
  def buffered(schema: StructType, deny: Set[Long] = Set.empty): DataFrame = {
    val tail = readOrEmpty(tailPath, schema)
    val dedupedTail = orderCol match {
      case Some(oc) => graft.operators.Documents.lastWinsById(tail, idCol, oc)
      case None     => tail.dropDuplicates(idCol) // arbitrary winner — see ctor note
    }
    denyTail(dedupedTail, deny)
  }

  /** Remove the tail table (call AFTER its rows are folded into the
    * base — e.g. by a catalog-level bucketed merge). Idempotent.
    */
  def clearTail(): Unit = {
    val p = new org.apache.hadoop.fs.Path(tailPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    ()
  }

  /** Delete-gate the tail: denied ids never surface from a buffered
    * write (a delete beats an earlier buffered upsert of the same id).
    * Tiny ledgers ride an isin literal (parquet-pushable); bigger ones a
    * broadcast anti-join — the same size switch as the base-leg gate
    * ([[graft.api.SearchApi]]'s applyDeny), so a large one-interval
    * delete batch never bloats the plan/codegen with a giant NOT-IN.
    */
  private def denyTail(df: DataFrame, deny: Set[Long]): DataFrame =
    if (deny.isEmpty) df
    else if (deny.size <= 1000)
      df.filter(!col(rid).cast("long").isin(deny.toSeq: _*))
    else {
      val spark = df.sparkSession
      import spark.implicits._
      val denyDf = deny.toSeq.toDF("_deny_id")
      df.join(broadcast(denyDf), col(rid).cast("long") === col("_deny_id"),
        "left_anti")
    }

  /** The generic realtime merge every index family serves through — the
    * reference's buffer-over-index union (vector_manager.cc:941-1012,
    * 1096-1176 merges the memory buffer into EVERY index type's search,
    * not just the graph): the indexed BASE leg ∪ the brute-forced TAIL,
    * tail winning id collisions. Fresh writes are never missed (the tail
    * is scanned exactly) and an UPDATED doc's stale base ranking never
    * survives — base hits whose id exists in the tail are dropped BEFORE
    * the merge (dropping after would let a stale high-ranking version
    * crowd out a legitimate k-th result). The tail is one refresh
    * interval of ingest, so the brute leg stays bounded regardless of
    * base size. Requires an integral id (index hit ids are longs).
    *
    * `tailSearch` scores the deduped, delete-gated tail and must return
    * `(vec_id: long, _score)` rows; `baseSearch(kBase)` runs the family's
    * index search at the over-fetched depth — up to |tail| of the base's
    * top hits may be superseded and dropped, and the base's next-ranked
    * docs then belong in the merged top-k, so the base leg over-fetches
    * by the (bounded) tail size and survivors always suffice.
    */
  private[graft] def mergeTail(schema: StructType, k: Int, metric: String,
      deny: Set[Long] = Set.empty)(tailSearch: DataFrame => DataFrame)(
      baseSearch: Int => DataFrame): DataFrame = {
    import graft.operators.Knn
    val tail = readOrEmpty(tailPath, schema)
    val dedupedTail0 = orderCol match {
      case Some(oc) => graft.operators.Documents.lastWinsById(tail, idCol, oc)
      case None     => tail.dropDuplicates(idCol)
    }
    val dedupedTail = denyTail(dedupedTail0, deny)
    val tailHits = tailSearch(dedupedTail)
      .select(col("vec_id").cast("long").as("vec_id"), col("_score"))
    val baseHits = tailRidArray(tail) match {
      case Some(ids0) =>
        // one cached collect serves kBase AND the anti-join — no count
        // job, no distributed anti-join build, per query
        val ids = if (deny.isEmpty) ids0 else ids0.filterNot(deny.contains)
        val kBase = (k + math.min(ids.length.toLong, (Int.MaxValue - k).toLong)).toInt
        dropTailIds(baseSearch(kBase), ids)
      case None =>
        // over-cap tail: the original distributed path
        val tailIds = dedupedTail.select(col(rid).cast("long").as("vec_id"))
        val kBase = (k + math.min(tailIds.count(), (Int.MaxValue - k).toLong)).toInt
        baseSearch(kBase).join(tailIds, Seq("vec_id"), "left_anti")
    }
    val primary =
      if (Knn.ascending(metric)) col("_score").asc else col("_score").desc
    baseHits.unionByName(tailHits).orderBy(primary, col("vec_id").asc).limit(k)
  }

  /** Batched (`req_num`) instance of [[mergeTail]]: per-qid base ∪ tail.
    * `tailSearch` scores the deduped, delete-gated tail for EVERY query
    * and returns `(_qid, vec_id: long, _score)` rows (≤ req_num·k);
    * `baseSearch(kBase)` runs the family's batched index search at the
    * over-fetched depth. A tail row supersedes its base id for ALL
    * queries (the id-level last-write-wins is query-independent), so the
    * anti-join gates on `vec_id` alone; the per-qid bounded top-k
    * aggregate is the final merge.
    */
  private[graft] def mergeTailBatch(schema: StructType, k: Int,
      metric: String, deny: Set[Long] = Set.empty)(
      tailSearch: DataFrame => DataFrame)(
      baseSearch: Int => DataFrame): DataFrame = {
    import graft.operators.Knn
    val tail = readOrEmpty(tailPath, schema)
    val dedupedTail0 = orderCol match {
      case Some(oc) => graft.operators.Documents.lastWinsById(tail, idCol, oc)
      case None     => tail.dropDuplicates(idCol)
    }
    val dedupedTail = denyTail(dedupedTail0, deny)
    val tailHits = tailSearch(dedupedTail)
      .select(col("_qid"), col("vec_id").cast("long").as("vec_id"), col("_score"))
    val baseHits = tailRidArray(tail) match {
      case Some(ids0) =>
        val ids = if (deny.isEmpty) ids0 else ids0.filterNot(deny.contains)
        val kBase = (k + math.min(ids.length.toLong, (Int.MaxValue - k).toLong)).toInt
        dropTailIds(baseSearch(kBase), ids)
      case None =>
        val tailIds = dedupedTail.select(col(rid).cast("long").as("vec_id"))
        val kBase = (k + math.min(tailIds.count(), (Int.MaxValue - k).toLong)).toInt
        baseSearch(kBase).join(tailIds, Seq("vec_id"), "left_anti")
    }
    baseHits.unionByName(tailHits)
      .groupBy(col("_qid"))
      .agg(graft.Graft.F.topK(col("_score"), struct(col("vec_id")), k,
        Knn.ascending(metric)).as("_tk"))
      .select(col("_qid"), explode(col("_tk")).as("_e"))
      .select(col("_qid"), col("_e.item.vec_id").as("vec_id"),
        col("_e.score").as("_score"))
  }

  /** Realtime graph-ANN search: the READY HNSW generation (built over the
    * BASE) ∪ the brute-forced TAIL — [[mergeTail]] over the graph walk.
    * `deny` is the delete ledger since the graph generation (the
    * reference's deleted-bitmap gate), applied to BOTH legs.
    */
  def searchHnsw(
      segments: org.apache.spark.sql.Dataset[graft.operators.HnswIndex.Segment],
      schema: StructType,
      vecCol: String,
      q: Seq[Float],
      k: Int,
      ef: Int,
      metric: String = "l2",
      deny: Set[Long] = Set.empty): DataFrame = {
    import graft.operators.{HnswIndex, Knn}
    mergeTail(schema, k, metric, deny) { t =>
      Knn.search(t, col(vecCol), q, k, metric, tieBreak = Some(col(idCol)))
        .select(col(idCol).cast("long").as("vec_id"), col("_score"))
    } { kBase =>
      HnswIndex.search(segments, q, kBase, math.max(ef, kBase), metric,
        deny = deny)
    }
  }

  /** Realtime IVF search: the READY `list_id` generation ∪ the brute
    * tail — the scan family's instance of [[mergeTail]] (the reference's
    * buffer merge into IVF searches, vector_manager.cc:941-1012).
    * `table` is the served (already delete-gated) layout; its id column
    * is `idCol`.
    */
  def searchIvf(
      table: DataFrame,
      model: graft.operators.IvfIndex.Model,
      schema: StructType,
      vecCol: String,
      q: Seq[Float],
      k: Int,
      nprobe: Int,
      deny: Set[Long] = Set.empty,
      filter: Option[Column] = None): DataFrame = {
    import graft.operators.{IvfIndex, Knn}
    mergeTail(schema, k, model.metric, deny) { t =>
      Knn.search(t, col(vecCol), q, k, model.metric, filter = filter,
        tieBreak = Some(col(idCol)))
        .select(col(idCol).cast("long").as("vec_id"), col("_score"))
    } { kBase =>
      IvfIndex.search(table, col(vecCol), model, q, kBase, nprobe,
        filter = filter, tieBreak = Some(col(idCol)))
        .select(col(idCol).cast("long").as("vec_id"), col("_score"))
    }
  }

  /** Realtime IVFPQ search: ADC + rerank over the READY residual-code
    * generation ∪ the exactly-scored tail ([[mergeTail]]). The tail leg
    * is exact by construction — the buffer holds raw vectors, the same
    * asymmetry as the reference's memory-buffer scan.
    */
  def searchIvfPq(
      table: DataFrame,
      ivf: graft.operators.IvfIndex.Model,
      pq: graft.operators.PqIndex.Model,
      schema: StructType,
      vecCol: String,
      q: Seq[Float],
      k: Int,
      nprobe: Int,
      recallNum: Int,
      deny: Set[Long] = Set.empty,
      filter: Option[Column] = None): DataFrame = {
    import graft.operators.{Knn, PqIndex}
    mergeTail(schema, k, pq.metric, deny) { t =>
      Knn.search(t, col(vecCol), q, k, pq.metric, filter = filter,
        tieBreak = Some(col(idCol)))
        .select(col(idCol).cast("long").as("vec_id"), col("_score"))
    } { kBase =>
      PqIndex.searchIvfResidual(table, col(vecCol), ivf, pq, q, kBase,
        nprobe, math.max(recallNum, kBase), idCol = col(idCol))
        .select(col(idCol).cast("long").as("vec_id"), col("_score"))
    }
  }

  /** Realtime Vamana (DiskANN-static) search: beam walk over the READY
    * graph generation ∪ the brute tail ([[mergeTail]]). The reference's
    * static class has no realtime add of its own — the buffer union is
    * exactly how its engine keeps serving fresh writes between rebuilds.
    */
  def searchVamana(
      segments: org.apache.spark.sql.Dataset[graft.operators.VamanaIndex.Segment],
      schema: StructType,
      vecCol: String,
      q: Seq[Float],
      k: Int,
      l: Int,
      beamWidth: Int = 4,
      metric: String = "l2",
      deny: Set[Long] = Set.empty): DataFrame = {
    import graft.operators.{Knn, VamanaIndex}
    mergeTail(schema, k, metric, deny) { t =>
      Knn.search(t, col(vecCol), q, k, metric, tieBreak = Some(col(idCol)))
        .select(col(idCol).cast("long").as("vec_id"), col("_score"))
    } { kBase =>
      VamanaIndex.search(segments, q, kBase, math.max(l, kBase), beamWidth,
        metric, deny = deny)
    }
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
    // deny-gate the fold: a tail row whose id was deleted while buffered
    // must NOT fold back into the base (it would permanently resurrect
    // the deleted doc) — same ledger gate as the serving snapshot
    val deny = lifecycle.map(_.allDeletes()).getOrElse(Set.empty[Long])
    val merged = assign(snapshot(schema, deny))
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
