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
  * gave on local paths. Appends are read-concat-rewrite: ledgers are
  * bounded by one rebuild interval (pruned at READY flips), and
  * `FileSystem.append` is unsupported on several relevant FS
  * implementations.
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

  /** Append by read-concat-rewrite (see class doc for why not
    * `FileSystem.append`). Callers serialize (the lifecycle methods are
    * `synchronized`); the final rename keeps readers crash-consistent.
    */
  def appendString(path: String, s: String): Unit =
    writeString(path, (if (exists(path)) readString(path) else "") + s)

  def delete(path: String): Unit = {
    val p = new Path(path)
    p.getFileSystem(conf).delete(p, true)
    ()
  }
}
