package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileContext, Options, Path}

/** Sidecar (state file / ledger / model) IO through the Hadoop
  * FileSystem API — resolved per-path by SCHEME, like the table
  * reads/writes around it. The index generations themselves are written
  * by Spark (scheme-aware already); sidecars written with `java.nio`
  * would silently land on the LOCAL disk for an `hdfs://`- or
  * `s3a://`-rooted space (the reference's backup target is
  * S3-compatible), building indexes that lose their ledger contract.
  * Every read/write here goes through the same FS handle the space path
  * resolves to, so lifecycle state rides wherever the table lives.
  *
  * Writes are tmp + rename-OVERWRITE (`FileContext.rename` — the atomic
  * replace; plain `FileSystem.rename` refuses existing destinations on
  * some FS), preserving the crash contract the `java.nio` ATOMIC_MOVE
  * gave on local paths. Appends use true `FileSystem.append` where the
  * FS supports it and fall back to read-concat-rewrite otherwise — see
  * [[appendString]] for the cross-JVM writer contract.
  */
private[graft] object SidecarIO {

  private def conf: org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  def exists(path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(conf).exists(p)
  }

  def readString(path: String): String = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    require(len <= Int.MaxValue, s"sidecar $path too large: $len")
    val buf = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0, buf)
    finally in.close()
    new String(buf, StandardCharsets.UTF_8)
  }

  def readLines(path: String): Seq[String] =
    readString(path).split("\n", -1).toSeq

  def writeString(path: String, s: String): Unit = {
    val p = new Path(path)
    val tmp = new Path(s"$path.tmp")
    val fs = p.getFileSystem(conf)
    val out = fs.create(tmp, true)
    try out.write(s.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val fc =
      if (p.toUri.getScheme == null) FileContext.getFileContext(conf)
      else FileContext.getFileContext(p.toUri, conf)
    fc.rename(tmp, p, Options.Rename.OVERWRITE)
    ()
  }

  /** Append — true `FileSystem.append` where the FS supports it (HDFS
    * and friends: O_APPEND semantics close the cross-JVM lost-update
    * window two read-concat-rewrite writers would have), falling back to
    * read-concat-rewrite on FSes that refuse append (the local
    * ChecksumFileSystem among them). ON THE FALLBACK PATH the
    * single-writer-per-space requirement stands: within one JVM the
    * lifecycle methods are `synchronized`, across JVMs a concurrent
    * writer can drop lines — run compaction and mutation from the
    * serving driver, not a side job. The final rename keeps readers
    * crash-consistent either way.
    */
  def appendString(path: String, s: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (!exists(path)) writeString(path, s)
    else {
      // probe append support at OPEN time only — a failure after bytes
      // were written must propagate, not silently double-write via the
      // fallback
      val out = try Some(fs.append(p)) catch {
        case _: UnsupportedOperationException => None
        case e: java.io.IOException
            if e.getMessage != null &&
              e.getMessage.toLowerCase.contains("not supported") => None
      }
      out match {
        case Some(o) =>
          try o.write(s.getBytes(StandardCharsets.UTF_8)) finally o.close()
        case None =>
          writeString(path, readString(path) + s)
      }
    }
  }

  def delete(path: String): Unit = {
    val p = new Path(path)
    p.getFileSystem(conf).delete(p, true)
    ()
  }

  def mkdirs(path: String): Unit = {
    val p = new Path(path)
    p.getFileSystem(conf).mkdirs(p)
    ()
  }

  /** Child entry NAMES of a directory (not paths); empty if absent. */
  def listNames(path: String): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath.getName).toSeq
  }

  /** Child DIRECTORY names of a directory; empty if absent. */
  def listDirNames(path: String): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSeq
  }

  /** Modification time (epoch ms), None if absent/unreadable. */
  def modifiedAt(path: String): Option[Long] = {
    val p = new Path(path)
    try Some(p.getFileSystem(conf).getFileStatus(p).getModificationTime)
    catch { case _: java.io.IOException => None }
  }

  /** Non-overwriting move via `FileContext.rename(…, Rename.NONE)`:
    * throws if `dst` exists, with POSIX rename semantics — unlike
    * `FileSystem.rename`, which silently moves `src` INSIDE an existing
    * destination directory (the classic mv-into gotcha that would
    * corrupt a table swap that raced a recoverer).
    */
  def rename(src: String, dst: String): Unit = {
    val s = new Path(src)
    val fc =
      if (s.toUri.getScheme == null) FileContext.getFileContext(conf)
      else FileContext.getFileContext(s.toUri, conf)
    fc.rename(s, new Path(dst), Options.Rename.NONE)
    ()
  }
}
