package graft

import org.apache.spark.sql.functions._
import graft.ml.QualityClassifier

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("quality classifier: trains on hash-split, beats the majority baseline on holdout") {
    val frame = QualityClassifier.featureFrame(spark, sf0001).cache()
    // every document is featurized, nothing null
    assert(frame.count() == graft.ops.Core.documents(spark, sf0001).count())
    assert(frame.na.drop().count() == frame.count(), "no null features allowed")
    val (train, holdout) = QualityClassifier.hashSplit(frame)
    val nTrain = train.count(); val nHold = holdout.count()
    assert(nTrain > 0 && nHold > 0 && nTrain + nHold == frame.count())
    // the hash gate is deterministic: re-splitting yields the same sets
    val (train2, _) = QualityClassifier.hashSplit(frame)
    assert(train.select("doc_id").exceptAll(train2.select("doc_id")).isEmpty)

    val model = QualityClassifier.fit(train)
    val scored = QualityClassifier.scoreCorpus(model, holdout).cache()
    assert(scored.filter($"quality_prob" < 0.0 || $"quality_prob" > 1.0).isEmpty)
    val acc = scored.filter($"prediction" === $"label").count().toDouble / nHold
    val majority = {
      val pos = holdout.filter($"label" === 1.0).count().toDouble
      math.max(pos, nHold - pos) / nHold
    }
    info(f"holdout accuracy $acc%.3f vs majority baseline $majority%.3f ($nHold%d docs)")
    // the label is a threshold-composite of the features, so a linear
    // model must at least match always-majority; a real margin means
    // it learned the gate's shape
    assert(acc >= majority - 1e-9,
      f"classifier ($acc%.3f) must not lose to the constant predictor ($majority%.3f)")
    // and the probability must rank positives above negatives overall
    // (AUC > 0.5 with a margin — label IS a function of the features)
    val auc = new org.apache.spark.ml.evaluation.BinaryClassificationEvaluator()
      .setLabelCol("label").setRawPredictionCol("quality_prob")
      .evaluate(scored.withColumn("quality_prob", $"quality_prob".cast("double")))
    info(f"holdout AUC $auc%.3f")
    assert(auc > 0.6, f"AUC $auc%.3f: probabilities must rank the gate")
    frame.unpersist(); scored.unpersist()
  }
}
