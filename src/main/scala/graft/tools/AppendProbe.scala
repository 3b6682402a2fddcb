package graft.tools

import org.apache.spark.sql.functions._

import graft.Graft
import graft.operators.HnswIndex

/** Dev probe: HNSW incremental-append cost vs full rebuild at a given SF.
  * Splits the embeddings table at a tail fraction, builds the base, then
  * times (a) appending the tail and (b) rebuilding over everything.
  */
object AppendProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tailFrac = args.headOption.map(_.toDouble).getOrElse(0.1)
    val shards = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = Graft.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
    val n = emb.count()
    val cut = (n * (1.0 - tailFrac)).toLong
    val base = emb.filter(col("vec_id") < cut)
    val tail = emb.filter(col("vec_id") >= cut)
    val p = HnswIndex.Params(m = 16, efConstruction = 100, metric = "l2",
      numShards = shards)
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[append] $name t=${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val built = time(s"build base (${cut} rows)") {
      val d = HnswIndex.build(base, "vec_id", "embedding", p).cache()
      d.count(); d
    }
    time(s"append tail (${n - cut} rows)") {
      HnswIndex.append(built, tail, "vec_id", "embedding", p).count()
    }
    time(s"append tail x2 (warm)") {
      HnswIndex.append(built, tail, "vec_id", "embedding", p).count()
    }
    time(s"full rebuild ($n rows)") {
      HnswIndex.build(emb, "vec_id", "embedding", p).count()
    }

    // clustered layout: posting-list append (fresh sub-segments per list)
    val ivf = time(s"train quantizer ($shards lists)") {
      graft.operators.IvfIndex.train(base, "embedding", shards)
    }
    time(s"clustered build base (${cut} rows)") {
      HnswIndex.buildClustered(base, "vec_id", "embedding", p, ivf).count()
    }
    time(s"clustered append tail (${n - cut} rows)") {
      HnswIndex.appendClustered(tail, "vec_id", "embedding", p, ivf).count()
    }
    time(s"clustered append tail x2 (warm)") {
      HnswIndex.appendClustered(tail, "vec_id", "embedding", p, ivf).count()
    }

    // compressed-code generations (IVFPQ / IVFRABITQ): encode-the-delta +
    // parquet append into list_id partitions vs a full retrain+re-encode
    // rebuild, through the lifecycle (includes the layout write — the
    // real cost a background fold pays)
    val root = java.nio.file.Files.createTempDirectory("append_probe").toString
    val baseIdDf = base.select(col("vec_id").as("_id"), col("label"), col("embedding"))
    val tailIdDf = tail.select(col("vec_id").as("_id"), col("label"), col("embedding"))

    val pqSpace = s"$root/pq"
    baseIdDf.write.parquet(pqSpace)
    val lcPq = new graft.api.IndexLifecycle(spark, pqSpace)
    time(s"ivfpq rebuild base (${cut} rows)") {
      lcPq.rebuildIvfPq("embedding", ncentroids = 16, m = 8, ksub = 16)
    }
    time(s"ivfpq append tail (${n - cut} rows)") {
      lcPq.appendIvfPq(tailIdDf, "embedding")
    }
    tailIdDf.write.mode("append").parquet(pqSpace)
    time(s"ivfpq full rebuild ($n rows)") {
      lcPq.rebuildIvfPq("embedding", ncentroids = 16, m = 8, ksub = 16)
    }

    val rbSpace = s"$root/rb"
    baseIdDf.write.parquet(rbSpace)
    val lcRb = new graft.api.IndexLifecycle(spark, rbSpace)
    time(s"rabitq rebuild base (${cut} rows)") {
      lcRb.rebuildIvfRabitq("embedding", ncentroids = 16)
    }
    time(s"rabitq append tail (${n - cut} rows)") {
      lcRb.appendIvfRabitq(tailIdDf, "embedding")
    }
    tailIdDf.write.mode("append").parquet(rbSpace)
    time(s"rabitq full rebuild ($n rows)") {
      lcRb.rebuildIvfRabitq("embedding", ncentroids = 16)
    }
    spark.stop()
  }
}
