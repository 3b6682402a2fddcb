package graft.tools

import org.apache.spark.sql.functions._

import graft.Graft
import graft.operators.{IvfIndex, Knn, PqIndex}

/** Recall harness replicating the reference CI gates
  * (test/test_recall_baseline.py:301-303: recall@1 ≥ 0.5, @10 ≥ 0.8,
  * @100 ≥ 0.9 vs exact ground truth) over the embeddings fixture.
  * Prints one JSON line per index configuration.
  */
object Recall {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val nQueries = sys.env.getOrElse("SPARK_GRAFT_RECALL_QUERIES", "50").toInt
    val spark = Graft.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
    val n = emb.count()
    val queries = emb.filter($"vec_id" < nQueries)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))

    // exact ground truth @100 per query (one batched pass)
    val qDf = queries.toSeq.toDF("qid", "qv")
      .select($"qid", $"qv".cast("array<float>").as("qv"))
    val gt: Map[Long, Seq[Long]] = Knn.searchBatch(
      emb, $"embedding", struct($"vec_id"), qDf, "qid", "qv", 100, "l2")
      .select($"_qid", $"_item.vec_id", $"_score")
      .collect().groupBy(_.getLong(0))
      .map { case (qid, rows) =>
        qid -> rows.sortBy(_.getDouble(2)).map(_.getLong(1)).toSeq
      }

    def report(name: String, got: Map[Long, Seq[Long]]): Unit = {
      def recallAt(k: Int): Double = {
        val per = queries.map { case (qid, _) =>
          val g = gt(qid).take(k).toSet
          got.getOrElse(qid, Nil).take(k).count(g.contains).toDouble / math.min(k, g.size)
        }
        per.sum / per.length
      }
      println(f"""{"index":"$name","n":$n,"queries":${queries.length},"recall@1":${recallAt(1)}%.4f,"recall@10":${recallAt(10)}%.4f,"recall@100":${recallAt(100)}%.4f}""")
    }

    // FLAT (must be 1.0 by construction)
    report("FLAT", gt)

    // IVFFLAT at a few nprobe settings
    val ncent = math.max(4, math.min(64, (math.sqrt(n.toDouble) / 2).toInt))
    val ivf = IvfIndex.train(emb, "embedding", ncent)
    val assigned = IvfIndex.assign(emb, "embedding", ivf).cache()
    for (nprobe <- Seq(ncent / 8 max 1, ncent / 4 max 1, ncent / 2 max 1)) {
      val got = queries.map { case (qid, q) =>
        qid -> IvfIndex.search(assigned, $"embedding", ivf, q, 100, nprobe,
          tieBreak = Some($"vec_id")).select($"vec_id").as[Long].collect().toSeq
      }.toMap
      report(s"IVFFLAT_nc${ncent}_np$nprobe", got)
    }

    // IVFPQ: probe + ADC + rerank
    val pq = PqIndex.train(emb, "embedding", dim = 64, m = 8, ksub = 16,
      maxTrainRows = 5000L, maxIter = 10)
    val encoded = PqIndex.encode(assigned, "embedding", pq).cache()
    val got = queries.map { case (qid, q) =>
      qid -> PqIndex.searchIvf(encoded, $"embedding", ivf, pq, q,
        k = 100, nprobe = ncent / 2 max 1, recallNum = 300, idCol = $"vec_id")
        .select($"vec_id").as[Long].collect().toSeq
    }.toMap
    report(s"IVFPQ_nc${ncent}_np${ncent / 2 max 1}_m8", got)

    spark.stop()
  }
}
