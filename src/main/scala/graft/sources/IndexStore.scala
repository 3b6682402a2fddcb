package graft.sources

import java.io.{FileInputStream, FileOutputStream, ObjectInputStream, ObjectOutputStream}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{BinaryIndex, IvfIndex, PqIndex}

/** Build-once cache of physical index layouts over the test fixtures.
  *
  * The reference separates index BUILD from SEARCH (auto-build at
  * training_threshold, `index/rebuild` — internal/engine/index/index.cc);
  * searches never pay the training cost. Round 1 benched the inline-train
  * path, so `q_ivf_search` measured KMeans instead of the probe plan. This
  * store persists the trained model + the partitioned table once per
  * (fixture, layout) and every subsequent search reads the layout a real
  * deployment would query:
  *
  *  - ivfFlat:  table partitioned by `list_id` → probe = partition pruning
  *  - ivfPq:    same layout + `pq_code` column → ADC scans codes only
  *  - pqFlat:   `pq_code` alongside raw vectors (column-pruned stage 1)
  *  - binary:   packed sign codes `bcode` (stage 1 reads dim/8 bytes/row)
  *
  * Location: `$SPARK_GRAFT_INDEX_DIR` or `java.io.tmpdir`/graft_index —
  * outside the repo, keyed by fixture basename + layout params, marked
  * ready atomically AFTER model+table are fully written.
  */
object IndexStore {

  /** Bump to invalidate cached layouts when build code changes. */
  private val Version = "v1"

  def rootDir: String = sys.env.getOrElse("SPARK_GRAFT_INDEX_DIR",
    sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft_index")

  /** Content fingerprint of the fixture's embeddings table: canonical
    * path + total byte size + newest mtime. Two fixtures sharing a
    * basename get distinct cache dirs, and regenerating a fixture
    * in place invalidates its cached layouts instead of silently
    * serving a stale model.
    */
  private def fingerprint(sfDir: String): String = {
    val p = Paths.get(sfDir, "embeddings.parquet").toAbsolutePath.normalize
    var size = 0L
    var mtime = 0L
    if (Files.exists(p)) {
      val stream = Files.walk(p)
      try {
        stream.iterator().forEachRemaining { f =>
          if (Files.isRegularFile(f)) {
            size += Files.size(f)
            mtime = math.max(mtime, Files.getLastModifiedTime(f).toMillis)
          }
        }
      } finally stream.close()
    }
    val h = scala.util.hashing.MurmurHash3.stringHash(s"$p|$size|$mtime")
    f"${h & 0xffffffffL}%08x"
  }

  private def dirFor(sfDir: String, kind: String): String = {
    val base = Paths.get(sfDir).toAbsolutePath.normalize.getFileName.toString
    s"$rootDir/$Version/$base-${fingerprint(sfDir)}/$kind"
  }

  private def ready(dir: String): Boolean =
    Files.exists(Paths.get(dir, "_GRAFT_READY"))

  private def markReady(dir: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(dir, "_GRAFT_READY"), "ok")
    ()
  }

  /** Build-once guard across PROCESSES: `Files.createDirectory` on a lock
    * dir is atomic, so exactly one JVM builds while others wait for the
    * READY marker (two concurrent overwrite-writes into one table dir
    * interleave deletes and part-files). Liveness is judged by the LOCK'S
    * OWN MTIME, which the builder heartbeats while it works — a slow but
    * alive builder is never raced; only a builder whose heartbeat stopped
    * for `staleMs` is presumed dead. A waiter that declares the lock stale
    * must still win `createDirectory` on the lock before building — no
    * code path ever writes the table dir without holding the lock.
    */
  private[graft] def buildOnce(dir: String, staleMs: Long = 600000L)(build: => Unit): Unit = {
    if (ready(dir)) return
    val lock = Paths.get(s"$dir.lock")
    val owner = lock.resolve("owner")
    val token = java.util.UUID.randomUUID().toString
    Files.createDirectories(Paths.get(dir).getParent)

    def tryAcquire(): Boolean =
      try {
        Files.createDirectory(lock)
        Files.writeString(owner, token)
        true
      } catch { case _: java.io.IOException => false }

    def deleteLock(): Unit =
      try { Files.deleteIfExists(owner); Files.deleteIfExists(lock); () }
      catch { case _: java.io.IOException => () }

    def buildLocked(): Unit = {
      // heartbeat: advance the lock's mtime so waiters age it by builder
      // liveness, not by their own wall-clock wait
      val hb = new Thread(() => {
        try {
          while (true) {
            Thread.sleep(math.max(staleMs / 4, 50L))
            Files.setLastModifiedTime(lock,
              java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
          }
        } catch { case _: InterruptedException | _: java.io.IOException => () }
      })
      hb.setDaemon(true)
      hb.start()
      try { if (!ready(dir)) build }
      finally {
        hb.interrupt()
        // release only if the lock is still OURS: a builder that was
        // presumed dead (paused > staleMs) and raced by a waiter must not
        // delete the new owner's lock on the way out
        val mine =
          try Files.readString(owner) == token
          catch { case _: java.io.IOException => false }
        if (mine) deleteLock()
      }
    }

    if (tryAcquire()) { buildLocked(); return }
    while (true) {
      if (ready(dir)) return
      val mtime =
        try Some(Files.getLastModifiedTime(lock).toMillis)
        catch { case _: java.io.IOException => None } // lock just vanished
      mtime match {
        case None =>
          // builder finished (READY) or crashed between create and first
          // heartbeat — loop re-checks READY, then contends for the lock
          if (ready(dir)) return
          if (tryAcquire()) { buildLocked(); return }
        case Some(t) if System.currentTimeMillis() - t > staleMs =>
          // heartbeat stopped: presumed dead. Takeover must be atomic —
          // two waiters observing staleness in the same poll window must
          // not both "delete corpse + re-acquire" (the loser's delete
          // would remove the winner's FRESH lock and let two builders
          // interleave writes). Claim = createFile of a takeover marker
          // INSIDE the stale lock (atomic, single winner), then verify
          // the owner token is still the one observed at the staleness
          // check (a live builder re-acquiring in between changes it).
          val takeover = lock.resolve("takeover")
          val observed =
            try Some(Files.readString(owner))
            catch { case _: java.io.IOException => None }
          val claimed =
            try { Files.createFile(takeover); true }
            catch {
              case _: java.nio.file.FileAlreadyExistsException =>
                // marker from a claimant that died mid-takeover: remove it
                // only once IT has aged too (a live claim completes in
                // milliseconds, so this never yanks an in-flight one)
                val markerStale =
                  try System.currentTimeMillis() -
                    Files.getLastModifiedTime(takeover).toMillis > staleMs
                  catch { case _: java.io.IOException => false }
                if (markerStale) {
                  try { Files.deleteIfExists(takeover); () }
                  catch { case _: java.io.IOException => () }
                }
                false
              case _: java.io.IOException => false // lock vanished; loop re-checks
            }
          if (claimed) {
            val still =
              try Some(Files.readString(owner))
              catch { case _: java.io.IOException => None }
            if (still == observed) {
              // corpse confirmed: adopt the lock under OUR token and build
              try {
                Files.writeString(owner, token)
                Files.deleteIfExists(takeover)
                buildLocked()
                return
              } catch { case _: java.io.IOException => () }
            } else {
              // a live builder re-acquired between observation and claim
              try { Files.deleteIfExists(takeover); () }
              catch { case _: java.io.IOException => () }
            }
          }
        case _ => Thread.sleep(200)
      }
    }
  }

  private def writeObj(path: String, o: AnyRef): Unit = {
    Files.createDirectories(Paths.get(path).getParent)
    val out = new ObjectOutputStream(new FileOutputStream(path))
    try out.writeObject(o) finally out.close()
  }

  private def readObj[T](path: String): T = {
    val in = new ObjectInputStream(new FileInputStream(path))
    try in.readObject().asInstanceOf[T] finally in.close()
  }

  private def emb(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  /** IVFFLAT layout: embeddings + `list_id`, partitioned by `list_id`. */
  def ivfFlat(spark: SparkSession, sfDir: String,
      ncentroids: Int = 16): (DataFrame, IvfIndex.Model) = {
    val dir = dirFor(sfDir, s"ivf$ncentroids")
    buildOnce(dir) {
      val e = emb(spark, sfDir)
      val model = IvfIndex.train(e, "embedding", ncentroids)
      IvfIndex.buildTable(e, "embedding", model, s"$dir/table")
      writeObj(s"$dir/model.bin", model)
      markReady(dir)
    }
    (spark.read.parquet(s"$dir/table"), readObj[IvfIndex.Model](s"$dir/model.bin"))
  }

  /** IVFPQ layout: `list_id`-partitioned table carrying `pq_code` + raw
    * vectors (the raw column is only read by the rerank stage's semi-join).
    */
  def ivfPq(spark: SparkSession, sfDir: String, ncentroids: Int = 8,
      m: Int = 8, ksub: Int = 16): (DataFrame, IvfIndex.Model, PqIndex.Model) = {
    val dir = dirFor(sfDir, s"ivfpq${ncentroids}_${m}_$ksub")
    buildOnce(dir) {
      val e = emb(spark, sfDir)
      // dim from the data, not a constant — a 128-d fixture would
      // otherwise get codebooks over its first 64 components only
      val dim = e.select(size(col("embedding"))).head().getInt(0)
      val ivf = IvfIndex.train(e, "embedding", ncentroids)
      val pq = PqIndex.train(e, "embedding", dim = dim, m = m, ksub = ksub,
        maxTrainRows = 200000L, maxIter = 8)
      PqIndex.encode(IvfIndex.assign(e, "embedding", ivf), "embedding", pq)
        .write.mode("overwrite").partitionBy("list_id").parquet(s"$dir/table")
      writeObj(s"$dir/ivf.bin", ivf)
      writeObj(s"$dir/pq.bin", pq)
      markReady(dir)
    }
    (spark.read.parquet(s"$dir/table"),
      readObj[IvfIndex.Model](s"$dir/ivf.bin"),
      readObj[PqIndex.Model](s"$dir/pq.bin"))
  }

  /** Flat PQ layout: `pq_code` alongside raw vectors, no coarse partition. */
  def pqFlat(spark: SparkSession, sfDir: String,
      m: Int = 8, ksub: Int = 16): (DataFrame, PqIndex.Model) = {
    val dir = dirFor(sfDir, s"pq${m}_$ksub")
    buildOnce(dir) {
      val e = emb(spark, sfDir)
      val dim = e.select(size(col("embedding"))).head().getInt(0)
      val pq = PqIndex.train(e, "embedding", dim = dim, m = m, ksub = ksub,
        maxTrainRows = 200000L, maxIter = 8)
      PqIndex.encode(e, "embedding", pq)
        .write.mode("overwrite").parquet(s"$dir/table")
      writeObj(s"$dir/pq.bin", pq)
      markReady(dir)
    }
    (spark.read.parquet(s"$dir/table"), readObj[PqIndex.Model](s"$dir/pq.bin"))
  }

  /** Binary (sign-bit) layout: embeddings + packed `bcode`. */
  def binary(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = dirFor(sfDir, "binary")
    buildOnce(dir) {
      BinaryIndex.encode(emb(spark, sfDir), "embedding")
        .write.mode("overwrite").parquet(s"$dir/table")
      markReady(dir)
    }
    spark.read.parquet(s"$dir/table")
  }

  /** IVF+RaBitQ layout: `list_id`-partitioned table carrying residual
    * sign codes (`rbcode`) + raw vectors for the rerank.
    */
  def binaryIvf(spark: SparkSession, sfDir: String,
      ncentroids: Int = 16): (DataFrame, IvfIndex.Model) = {
    val dir = dirFor(sfDir, s"rbivf$ncentroids")
    buildOnce(dir) {
      val e = emb(spark, sfDir)
      // reuse ivfFlat's trained quantizer (same data, same params) —
      // retraining an identical KMeans doubled the dominant warmup cost
      val ivf = ivfFlat(spark, sfDir, ncentroids)._2
      BinaryIndex.encodeResidual(IvfIndex.assign(e, "embedding", ivf), "embedding", ivf)
        .write.mode("overwrite").partitionBy("list_id").parquet(s"$dir/table")
      writeObj(s"$dir/ivf.bin", ivf)
      markReady(dir)
    }
    (spark.read.parquet(s"$dir/table"), readObj[IvfIndex.Model](s"$dir/ivf.bin"))
  }

  /** Build every layout the declared queries use — called from Bench's
    * untimed warmup so builds never pollute per-query timings.
    */
  def warm(spark: SparkSession, sfDir: String): Unit = {
    ivfFlat(spark, sfDir)
    ivfPq(spark, sfDir)
    pqFlat(spark, sfDir)
    binary(spark, sfDir)
    binaryIvf(spark, sfDir)
  }
}
