package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{MinMaxScaler, VectorAssembler}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The corpus-quality classifier — the CCNet / LLaMA-pipeline pattern
  * (Wenzek et al. 2020; fastText quality models): train a CHEAP linear
  * model on heuristic quality labels, then score the whole corpus with
  * one map-side transform. Rule-based gates ([[graft.ops.TrainingData
  * .repetitionMetrics]]'s gopher_ok, the quality_prune threshold) are
  * brittle at the margins; the classifier smooths them into a
  * probability a curation writer can threshold per use-case — and at
  * 100 TB the economics are the point: the model trains on a sample,
  * scoring is a broadcast of a few coefficients into a linear scan
  * (the same scale shape as every map-side op here).
  *
  * Features are the engine's own registered quality signals (text
  * ratios + repetition metrics — all oracle-checked upstream), the
  * label is the Gopher composite gate. Deterministic throughout: the
  * train/holdout split is a content-hash gate (the datasetSplit rule,
  * not sample()), and LogisticRegression on a fixed feature order is
  * reproducible run-to-run. MLlib surface, so unit-tested rather than
  * oracle-checked, like [[TrendPipeline]]. */
object QualityClassifier {

  val featureCols: Array[String] = Array(
    "unique_ratio", "stop_ratio", "len_ok",
    "top_token_frac", "dup_bigram_frac", "dup_trigram_frac", "n_tokens_d")

  /** Per-doc feature/label frame: textQuality ratios joined with the
    * repetition metrics on doc_id (both linear scans; the join keys on
    * the same doc_id both sides carry). */
  def featureFrame(spark: SparkSession, dir: String): DataFrame =
    graft.ops.TextDedup.textQuality(spark, dir)
      .select(col("doc_id"), col("unique_ratio"), col("stop_ratio"), col("len_ok"))
      .join(graft.ops.TrainingData.repetitionMetrics(spark, dir)
        .select(col("doc_id"), col("top_token_frac"), col("dup_bigram_frac"),
          col("dup_trigram_frac"), col("n_tokens").cast("double").as("n_tokens_d"),
          col("gopher_ok").cast("double").as("label")), "doc_id")

  /** Deterministic content-hash holdout (the datasetSplit rule): ~80%
    * train, ~20% holdout, stable across runs and cluster layouts. */
  def hashSplit(df: DataFrame): (DataFrame, DataFrame) = {
    val gate = pmod(graft.functions.poly_hash(col("doc_id").cast("string")), lit(100L))
    (df.filter(gate < 80), df.filter(gate >= 80))
  }

  def fit(train: DataFrame): PipelineModel = {
    val assembler = new VectorAssembler()
      .setInputCols(featureCols).setOutputCol("rawFeatures")
    val scaler = new MinMaxScaler()
      .setInputCol("rawFeatures").setOutputCol("features")
    val lr = new LogisticRegression()
      .setLabelCol("label").setFeaturesCol("features")
      .setMaxIter(50).setRegParam(0.01)
    new Pipeline().setStages(Array(assembler, scaler, lr)).fit(train)
  }

  /** Score every document: (doc_id, label, quality_prob). The
    * transform is coefficients-broadcast map work — the 100 TB scoring
    * pass costs one corpus scan. */
  def scoreCorpus(model: PipelineModel, docs: DataFrame): DataFrame =
    model.transform(docs)
      .select(col("doc_id"), col("label"),
        org.apache.spark.ml.functions.vector_to_array(col("probability"))
          .getItem(1).as("quality_prob"),
        col("prediction"))
}
