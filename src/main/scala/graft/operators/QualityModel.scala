package graft.operators

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextOps.tokens

/** Model-based quality filtering — the trained-classifier step of a
  * pretraining data pipeline (the GPT-3 / CCNet recipe: score every
  * document against a model trained to separate a trusted "good" corpus
  * from raw crawl, filter or importance-sample on the score). The
  * reference engine has no model surface; this is beyond-reference
  * pipeline capability like the rest of the dedup/sampling family.
  *
  * Representation: hashed bag of words (`HashingTF`, 2^`logFeatures`
  * dims, the classic fasttext-class linear setup) → L2-regularized
  * logistic regression. Everything is Spark ML:
  *
  *  - training is DISTRIBUTED (L-BFGS over `treeAggregate` passes — one
  *    pass per iteration, no driver-side data materialization; driver
  *    holds only the 2^logFeatures coefficient vector);
  *  - scoring broadcasts those coefficients and is a map-side transform
  *    (no shuffle — plan-asserted in the spec). The sparse-dot inference
  *    is an ML-vector UDF, not codegen — acceptable by the same contract
  *    as [[Multimodal]]: model inference is per-row kernel work, and the
  *    Spark-side plumbing (broadcast, batch shape, no shuffle) is what
  *    must scale.
  *
  * Determinism: HashingTF is a pure hash; LR from a fixed (data,
  * partitioning) is deterministic, but coefficient floats can wiggle at
  * the last ulp across partitionings (treeAggregate sum order), so
  * declared-query output should round scores or rank — the declared
  * `q_quality_model` reports score-band counts.
  */
object QualityModel {

  /** Train on `labeled` rows: `textCol` + double `labelCol` (1.0 = good).
    * Returns the fitted model; `model.coefficients` is the only
    * driver-resident state (2^logFeatures doubles).
    */
  def train(
      labeled: DataFrame,
      textCol: String,
      labelCol: String,
      logFeatures: Int = 15,
      maxIter: Int = 30,
      regParam: Double = 1e-3): LogisticRegressionModel = {
    require(logFeatures >= 4 && logFeatures <= 24,
      s"logFeatures out of range: $logFeatures")
    val tf = new HashingTF().setInputCol("_words").setOutputCol("_features")
      .setNumFeatures(1 << logFeatures)
    val feats = tf.transform(
      labeled.withColumn("_words", tokens(col(textCol))))
    new LogisticRegression()
      .setFeaturesCol("_features").setLabelCol(labelCol)
      .setMaxIter(maxIter).setRegParam(regParam)
      .fit(feats)
  }

  /** Score `df`, appending `outCol` = P(label = 1 | text) in [0, 1].
    * Map-side only: the model's coefficients broadcast with the closure.
    */
  def score(
      df: DataFrame,
      model: LogisticRegressionModel,
      textCol: String,
      outCol: String = "quality_prob"): DataFrame = {
    val tf = new HashingTF().setInputCol("_words").setOutputCol("_features")
      .setNumFeatures(model.numFeatures)
    val feats = tf.transform(df.withColumn("_words", tokens(col(textCol))))
    val prob = udf((v: Vector) => v(1))
    model.setFeaturesCol("_features")
      .setProbabilityCol("_prob")
      .setPredictionCol("_pred")
      .setRawPredictionCol("_raw")
      .transform(feats)
      .withColumn(outCol, prob(col("_prob")))
      .drop("_words", "_features", "_prob", "_pred", "_raw")
  }

  /** Self-supervised weak labels from the Gopher-style heuristics: docs
    * in the best heuristic band are positives, the worst band negatives
    * (the CCNet trick of bootstrapping a model from a cheap signal so a
    * trusted corpus isn't required). `frac` takes each tail of the
    * repetition-adjusted score. Deterministic: band cut points are exact
    * percentiles of a deterministic per-row score.
    */
  def weakLabels(
      df: DataFrame,
      textCol: String,
      frac: Double = 0.25): DataFrame = {
    require(frac > 0 && frac <= 0.5, s"frac must be in (0, 0.5]: $frac")
    val q = TextOps.qualityFeatures(col(textCol), TextOps.EnStopwords)
    // higher = better: long-enough docs with diverse tokens; token
    // diversity punishes the degenerate repetition shapes
    val scored = df.withColumn("_qs",
      least(q.getField("n_tokens").cast("double") / 100.0, lit(1.0)) +
        (size(array_distinct(tokens(col(textCol)))).cast("double") /
          greatest(q.getField("n_tokens"), lit(1)).cast("double")))
    val cuts = scored.agg(
      expr(s"percentile(_qs, ${1 - frac})").as("hi"),
      expr(s"percentile(_qs, $frac)").as("lo")).head()
    val (hi, lo) = (cuts.getDouble(0), cuts.getDouble(1))
    scored
      .filter(col("_qs") >= hi || col("_qs") <= lo)
      .withColumn("label", when(col("_qs") >= hi, 1.0).otherwise(0.0))
      .drop("_qs")
  }
}
