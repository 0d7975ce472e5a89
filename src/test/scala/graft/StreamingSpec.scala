package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingPipeline

case class Ev(event_id: Long, ts: Timestamp, event_type: String, value: Double)

/** Streaming semantics (SURVEY §2.9) driven through MemoryStream:
  * interval-join tolerance, chained stateful aggregation (the Spark-4
  * unlock), watermark-bounded dedup, foreachBatch sink shape.
  * Watermark-gated emissions need a second micro-batch, so tests add a
  * far-future event and processAllAvailable() twice. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("streaming interval join honors the [ts, ts+3min] tolerance") {
    implicit val sqlCtx = spark.sqlContext
    val left = MemoryStream[(Long, Timestamp)]
    val right = MemoryStream[(Long, Timestamp)]
    val joined = StreamingPipeline.intervalJoin(
      left.toDF().toDF("l_id", "ts"),
      right.toDF().toDF("r_id", "ts"))
      .select("l_id", "r_id")
    val q = joined.writeStream.format("memory").queryName("ij_out")
      .outputMode("append").start()
    try {
      left.addData((1L, t("2024-01-01 10:00:30")))
      left.addData((2L, t("2024-01-01 10:06:00")))
      right.addData(
        (10L, t("2024-01-01 10:01:00")), // joins 1 (same bucket, within 3min)
        (11L, t("2024-01-01 10:04:30")), // 10:00 bucket but > 10:00:30+3min -> no
        (12L, t("2024-01-01 10:05:30"))) // 10:05 bucket, before l2 -> no
      q.processAllAvailable()
      val got = spark.table("ij_out").select("l_id", "r_id").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 10L)))
    } finally q.stop()
  }

  test("streaming 5-min bars (the aggregation the reference offloaded to MariaDB)") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Ev]
    val bars = StreamingPipeline.streamingBars(src.toDF())
    val q = bars.writeStream.format("memory").queryName("bars_out")
      .outputMode("append").start()
    try {
      src.addData(
        Ev(1, t("2024-01-01 10:00:10"), "e", 10.0),
        Ev(2, t("2024-01-01 10:02:00"), "e", 30.0),
        Ev(3, t("2024-01-01 10:04:59"), "e", 20.0),
        Ev(4, t("2024-01-01 10:07:00"), "e", 99.0))
      q.processAllAvailable()
      // advance the watermark past both windows in a second batch
      src.addData(Ev(5, t("2024-01-01 10:30:00"), "e", 1.0))
      q.processAllAvailable()
      val rows = spark.table("bars_out")
        .orderBy("bucket")
        .select($"bucket".cast("string"), $"high", $"low", $"close", $"volume")
        .as[(String, Double, Double, Double, Long)].collect()
      assert(rows.length == 2)
      assert(rows(0) == (("2024-01-01 10:00:00", 30.0, 10.0, 20.0, 3L)))
      assert(rows(1) == (("2024-01-01 10:05:00", 99.0, 99.0, 99.0, 1L)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark drops dup keys within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Ev]
    val dd = StreamingPipeline.dedupWithinWatermark(src.toDF(), Seq("event_id"))
    val q = dd.writeStream.format("memory").queryName("dd_out")
      .outputMode("append").start()
    try {
      src.addData(
        Ev(1, t("2024-01-01 10:00:00"), "a", 1.0),
        Ev(1, t("2024-01-01 10:00:30"), "a", 1.0), // dup within watermark
        Ev(2, t("2024-01-01 10:01:00"), "b", 2.0))
      q.processAllAvailable()
      val ids = spark.table("dd_out").select("event_id").as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L))
    } finally q.stop()
  }

  test("foreachBatch parquet sink: skips empty batches, stamps batch_id") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val src = MemoryStream[Ev]
    val q = StreamingPipeline
      .foreachBatchParquetSink(src.toDF(), s"$dir/data", s"$dir/ckpt")
      .start()
    try {
      src.addData(Ev(1, t("2024-01-01 10:00:00"), "a", 1.0))
      q.processAllAvailable()
      val out = spark.read.parquet(s"$dir/data")
      assert(out.count() == 1)
      assert(out.columns.contains("batch_id"))
    } finally q.stop()
  }
}
