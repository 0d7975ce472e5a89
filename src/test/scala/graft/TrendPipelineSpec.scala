package graft

import graft.ml.TrendPipeline

/** End-to-end ML path: feature matrix -> time split -> MinMaxScaler ->
  * LogisticRegression -> scored tail + latest-bar inference. */
class TrendPipelineSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("feature matrix is complete and label-bearing") {
    val fm = TrendPipeline.featureMatrix(spark, sf0001).cache()
    assert(fm.count() > 100)
    TrendPipeline.featureCols.foreach { c =>
      assert(fm.filter(col(c).isNull).isEmpty, s"nulls left in $c")
    }
    // multi-label: labels are 0/1 and not mutually exclusive by design
    assert(fm.filter($"up1" > 1 || $"up1" < 0).isEmpty)
  }

  test("train/eval: beats coin flip on the held-out tail, scores latest bars") {
    val (scored, acc) = TrendPipeline.trainEval(spark, sf0001)
    assert(scored.columns.contains("probability"))
    assert(acc > 0.5, s"test accuracy $acc")
    val (train, _) = TrendPipeline.timeSplit(TrendPipeline.featureMatrix(spark, sf0001))
    val model = TrendPipeline.fit(train)
    val latest = TrendPipeline.scoreLatest(spark, sf0001, model)
    assert(latest.count() == 5)
  }
}
