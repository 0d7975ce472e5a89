package graft

import org.apache.spark.GraftTaskIO

/** Gates for the bench's per-query I/O attribution (GraftTaskIO):
  * the counters must see parquet input and shuffle traffic, and the
  * bus-drained snapshot protocol must attribute a job's bytes to the
  * delta taken around it — the property Bench's "queries_io" field
  * relies on for per-query numbers. */
class TaskIoSpec extends SparkSpec {

  test("snapshot deltas attribute a job's input and shuffle bytes to its window") {
    val c = GraftTaskIO.install(spark)
    try {
      val s0 = GraftTaskIO.snapshot(spark, c)
      // a parquet scan + a wide groupBy: both input and shuffle traffic
      ops.Core.documents(spark, sf0001)
        .groupBy("source").agg(org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.length(
            org.apache.spark.sql.functions.col("text"))))
        .collect()
      val d1 = GraftTaskIO.snapshot(spark, c) - s0
      assert(d1.input > 0, s"parquet scan bytes not counted: $d1")
      assert(d1.shuffleWrite > 0 && d1.shuffleRead > 0,
        s"groupBy shuffle bytes not counted: $d1")

      // a windowed no-op on cached memory: no NEW parquet input may be
      // attributed to this window beyond the scan it actually does
      val s2 = GraftTaskIO.snapshot(spark, c)
      spark.range(1000).selectExpr("sum(id)").collect()
      val d2 = GraftTaskIO.snapshot(spark, c) - s2
      assert(d2.input == 0, s"range scan attributed phantom input bytes: $d2")
      assert(d2.spill == 0, s"trivial job attributed phantom spill: $d2")
    } finally spark.sparkContext.removeSparkListener(c)
  }
}
