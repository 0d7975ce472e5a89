package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{MinMaxScaler, VectorAssembler}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.Indicators

/** The reference's training/inference consumer (§3.2/§3.3:
  * sql_pytorch_dataloader.py + biGRU_model.py + predict.py) rebuilt as
  * an in-engine MLlib pipeline. MLlib has no GRU (SURVEY §4.3), and
  * feature/target/normalization parity — not the torch model — is the
  * engine deliverable; a logistic-regression trend classifier on the
  * SAME feature matrix demonstrates the end-to-end path:
  *
  *   bars -> indicator window layer -> multi-label targets
  *        -> time-ordered split (the chunked 80/12/8 analogue)
  *        -> MinMaxScaler (the dataloader's min-max normalization A1)
  *        -> classifier -> per-label probability
  *
  * and removes the reference's race-by-sleep inference design
  * (predict.py:141 sleeps 15 s for MariaDB writes to land): features
  * and scoring live in ONE Spark job, so `scoreLatest` is a plain
  * transform on the freshest bars — no cross-store synchronization.
  */
object TrendPipeline {

  val featureCols: Array[String] = Array(
    "vol_ma6", "vol_ma20", "price_ma20", "upper_bb_dist", "lower_bb_dist",
    "stoch", "price_change", "atr")

  /** Feature matrix + the four reference labels, warmup rows dropped
    * (lag/stoch nulls in the first window). Delegates to the
    * registered single-pass `feature_matrix` query — the oracle-checked
    * form of the reference's view-join training table. */
  def featureMatrix(spark: SparkSession, dir: String): DataFrame =
    Indicators.featureMatrix(spark, dir)

  /** Time-ordered train/test split (the dataloader's chunk split
    * semantics: no shuffling across time, sql_pytorch_dataloader.py
    * TrainValTestSplit). Partition-less rank windows here and in
    * [[scoreLatest]]: bars-not-events cardinality — see the
    * single-series bound on [[graft.ops.Indicators.indicators]]. */
  def timeSplit(df: DataFrame, trainFrac: Double = 0.8): (DataFrame, DataFrame) = {
    val n = df.count()
    val cut = (n * trainFrac).toLong
    val w = Window.orderBy("bucket")
    val ranked = df.withColumn("rn", row_number().over(w))
    (ranked.filter(col("rn") <= cut).drop("rn"),
      ranked.filter(col("rn") > cut).drop("rn"))
  }

  /** Assemble -> min-max normalize -> logistic regression on one of
    * the four labels. */
  def fit(train: DataFrame, label: String = "up1"): PipelineModel = {
    val assembler = new VectorAssembler()
      .setInputCols(featureCols).setOutputCol("rawFeatures")
    val scaler = new MinMaxScaler()
      .setInputCol("rawFeatures").setOutputCol("features")
    val lr = new LogisticRegression()
      .setLabelCol(label).setFeaturesCol("features")
      .setMaxIter(50).setRegParam(0.01)
    new Pipeline().setStages(Array(assembler, scaler, lr)).fit(train)
  }

  /** Train on the head of the series, score the tail; returns
    * (scored test set, accuracy). */
  def trainEval(spark: SparkSession, dir: String, label: String = "up1")
      : (DataFrame, Double) = {
    val (train, test) = timeSplit(featureMatrix(spark, dir))
    val model = fit(train, label)
    val scored = model.transform(test)
    val acc = scored
      .select(avg(when(col("prediction") === col(label).cast("double"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    (scored, acc)
  }

  /** The predict.py path without the sleep: score the most recent
    * complete bars directly from the live feature matrix. */
  def scoreLatest(spark: SparkSession, dir: String, model: PipelineModel, n: Int = 5): DataFrame = {
    val fm = featureMatrix(spark, dir)
    val w = Window.orderBy(col("bucket").desc)
    val latest = fm.withColumn("rn", row_number().over(w)).filter(col("rn") <= n).drop("rn")
    model.transform(latest)
      .select(col("bucket"), col("probability"), col("prediction"))
  }
}
