package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / data-mixing operators for training-data
  * pipelines (beyond-reference surface, builder brief). Everything keys
  * off a CONTENT-DERIVED 60-bit hash, never a RNG:
  *
  *  - re-runs (and retried stages) pick the exact same rows — a stage
  *    retry under `sample()`'s per-partition RNG yields a different
  *    subset mid-job;
  *  - the sample is reproducible cross-engine (the hash is md5-based and
  *    bit-identical in DuckDB, so the oracle re-derives it);
  *  - membership is a pure per-row predicate → [[hashSample]] is
  *    map-side only, no shuffle, and composes with partition pruning.
  */
object Sampling {

  /** Uniform-in-[0,1) from the top 60 bits of md5(key) — portable
    * bit-for-bit to the SQL oracle (DuckDB reassembles the same 60-bit
    * integer from the md5 hex and divides by the same 2^60 constant).
    */
  def portableUniform(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long") /
      lit(1152921504606846976.0) // 2^60

  /** Keep a deterministic `fraction` of rows by key hash. Map-side only.
    * NULL-key rows are EXCLUDED at every fraction (membership needs an
    * identity; `null < f` is null → dropped) — the SQL oracle agrees
    * (`WHERE NULL < f` keeps nothing). Pre-assign ids (e.g.
    * [[graft.operators.Documents.withDefaultIds]]) if null-key rows must
    * participate.
    */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1]: $fraction")
    df.filter(portableUniform(key) < fraction)
  }

  /** Cap every stratum (e.g. language, source, quality bucket) at `cap`
    * rows, chosen deterministically by key hash — the class-balancing
    * step of a data-mixing pipeline.
    *
    * Scale shape: a naive window sends EVERY row of a hot stratum through
    * one task's sort. With `salt > 1` selection runs in two phases: phase
    * 1 windows over (stratum, hash-salt) keeping `cap` per salt — the
    * global cap-smallest rows of a stratum are a subset of its per-salt
    * cap-smallest, so no qualifying row is lost — and phase 2 re-windows
    * the ≤ salt·cap survivors per stratum. The hot stratum's full sort
    * never happens; phase-2 input is bounded by strata·salt·cap.
    */
  def stratifiedCap(
      df: DataFrame, stratum: Column, key: Column, cap: Int,
      salt: Int = 16): DataFrame = {
    require(cap > 0, s"cap must be > 0: $cap")
    val u = portableUniform(key)
    // null-key rows rank LAST (Spark `asc` is NULLS FIRST — unguarded
    // they'd preferentially consume every stratum's cap slots, and
    // disagree with SQL engines whose ASC defaults to NULLS LAST)
    val order = Seq(u.asc_nulls_last, key.asc_nulls_last)
    val pre =
      if (salt > 1) {
        val w1 = Window.partitionBy(stratum, pmod(hash(key), lit(salt)))
          .orderBy(order: _*)
        df.withColumn("_prn", row_number().over(w1))
          .filter(col("_prn") <= cap).drop("_prn")
      } else df
    val w2 = Window.partitionBy(stratum).orderBy(order: _*)
    pre.withColumn("_rn", row_number().over(w2))
      .filter(col("_rn") <= cap).drop("_rn")
  }

  /** Temperature (α) re-sampling across groups — the multilingual /
    * multi-domain re-balancing step (mT5's exponentiated-share sampling):
    * group g is kept with probability ∝ (n_g/N)^α, flattening the group
    * distribution toward uniform as α → 0 and leaving it proportional at
    * α = 1. `targetFrac` sets the overall expected sample size; each
    * group's per-row rate is min(1, targetFrac·N·p_g/n_g) with
    * p_g = n_g^α / Σ n^α (the N^α factors cancel). Rates that clip at 1
    * are NOT redistributed — the realized total then undershoots
    * targetFrac, the standard single-pass behavior; membership is the
    * same content-hash predicate as [[hashSample]], so re-runs pick
    * identical rows and the SQL oracle re-derives the sample exactly.
    *
    * Scale shape: one group-count aggregate (map-side combine) whose
    * result is GROUP-CARDINALITY-sized, a single-partition window over
    * those few rows to normalize (bounded by #groups, never by data),
    * then a broadcast join back — the corpus-sized pass stays map-side.
    * NULL-group rows are excluded (membership needs a group identity),
    * matching [[hashSample]]'s null-key contract.
    */
  def temperatureSample(
      df: DataFrame, groupCol: Column, key: Column,
      alpha: Double, targetFrac: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1]: $alpha")
    require(targetFrac > 0.0 && targetFrac <= 1.0,
      s"targetFrac must be in (0,1]: $targetFrac")
    val counts = df.groupBy(groupCol.as("_g")).agg(count(lit(1)).as("_n"))
    val all = Window.partitionBy()
    val rates = counts
      .withColumn("_na", pow(col("_n"), alpha))
      .withColumn("_rate", least(lit(1.0),
        lit(targetFrac) * sum("_n").over(all) * (col("_na") / sum("_na").over(all)) / col("_n")))
      .select(col("_g"), col("_rate"))
    df.join(broadcast(rates), groupCol === col("_g"))
      .filter(portableUniform(key) < col("_rate"))
      .drop("_g", "_rate")
  }

  /** Weighted mix of sources: each source contributes a deterministic
    * hash-sampled fraction, unioned by name — the "data recipe" step
    * (e.g. 100% curated + 30% web + 5% synthetic). Schemas must align.
    */
  def mix(sources: Seq[(DataFrame, Double)], keyCol: String): DataFrame = {
    require(sources.nonEmpty, "mix needs at least one source")
    sources.map { case (d, f) => hashSample(d, col(keyCol), f) }
      .reduce(_.unionByName(_))
  }
}
