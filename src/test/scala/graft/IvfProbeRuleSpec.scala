package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, Knn}
import graft.plans.RewriteIvfProbe

class IvfProbeRuleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet").cache()
  private lazy val model = IvfIndex.train(emb, "embedding", ncentroids = 8)
  private lazy val q0: Seq[Float] =
    emb.filter($"vec_id" === 0).select("embedding").head().getSeq[Float](0)

  test("rule is installed in the graft session") {
    assert(spark.experimental.extraOptimizations.contains(RewriteIvfProbe))
  }

  test("probe predicate folds to a static IN on list_id") {
    val assigned = IvfIndex.assign(emb, "embedding", model)
    val probed = assigned.filter(IvfIndex.probeFilter(assigned, model, q0, 2))
    val optimized = probed.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("ivf_probe"), s"probe not folded:\n$optimized")
    assert(optimized.contains("IN (") || optimized.contains("list_id#"),
      s"no IN over list ids:\n$optimized")
    // and it selects exactly the rows of the explicit isin probe
    val lists = model.nearestCentroids(q0, 2)
    val expected = assigned.filter($"list_id".isin(lists: _*))
      .select($"vec_id").as[Long].collect().toSet
    val got = probed.select($"vec_id").as[Long].collect().toSet
    assert(got == expected)
  }

  test("row-wise eval (rule absent) gives identical rows") {
    val assigned = IvfIndex.assign(emb, "embedding", model)
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Nil
    try {
      val probed = assigned.filter(IvfIndex.probeFilter(assigned, model, q0, 2))
      val optimized = probed.queryExecution.optimizedPlan.toString
      assert(optimized.contains("ivf_probe"), s"expected unfolded probe:\n$optimized")
      val lists = model.nearestCentroids(q0, 2)
      val expected = assigned.filter($"list_id".isin(lists: _*))
        .select($"vec_id").as[Long].collect().toSet
      assert(probed.select($"vec_id").as[Long].collect().toSet == expected)
    } finally {
      spark.experimental.extraOptimizations = saved
    }
  }

  test("folded probe reaches partition pruning on a partitioned IVF table") {
    val dir = Files.createTempDirectory("ivf_probe_tbl").toFile.getAbsolutePath
    IvfIndex.buildTable(emb, "embedding", model, dir)
    val corpus = spark.read.parquet(dir)
    val probed = corpus.filter(IvfIndex.probeFilter(corpus, model, q0, 2))
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("list_id"),
      s"folded probe did not prune partitions:\n$plan")
    // end-to-end: probe + knn == the imperative IvfIndex.search
    val viaRule = Knn.search(probed, $"embedding", q0, 5, "l2",
      tieBreak = Some($"vec_id")).select($"vec_id").as[Long].collect().toSeq
    val viaSearch = IvfIndex.search(corpus, $"embedding", model, q0, 5, 2,
      tieBreak = Some($"vec_id")).select($"vec_id").as[Long].collect().toSeq
    assert(viaRule == viaSearch)
  }
}
