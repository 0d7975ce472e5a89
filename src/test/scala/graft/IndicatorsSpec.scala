package graft

import org.apache.spark.sql.functions._
import graft.ops.{Core, Indicators}

/** Hand-computed expectations for the bar/indicator layer (W1-W8)
  * on tiny in-memory frames, plus structural checks on testdata. */
class IndicatorsSpec extends SparkSpec {
  import spark.implicits._

  private def mkBars(closes: Seq[Double]): org.apache.spark.sql.DataFrame =
    closes.zipWithIndex.map { case (c, i) =>
      (java.sql.Timestamp.valueOf(f"2024-01-01 ${i * 5 / 60}%02d:${i * 5 % 60}%02d:00"),
        c, c + 1.0, c - 1.0, c, 1L)
    }.toDF("bucket", "open", "high", "low", "close", "volume")

  test("price_ma20 over a short series is the running mean") {
    val out = Indicators.withIndicators(mkBars(Seq(10.0, 20.0, 30.0)))
      .select("price_ma20").as[Double].collect()
    assert(out(0) == 10.0)
    assert(out(1) == 15.0)
    assert(out(2) == 20.0)
  }

  test("price_change is close - lag(close), null-first") {
    val out = Indicators.withIndicators(mkBars(Seq(10.0, 25.0, 5.0)))
      .select("price_change").collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getDouble(0) == 15.0)
    assert(out(2).getDouble(0) == -20.0)
  }

  test("atr over constant-range bars equals the range (15-row frame)") {
    val out = Indicators.withIndicators(mkBars(Seq.fill(20)(50.0)))
      .select("atr").as[Double].collect()
    // high-low = 2.0 everywhere
    assert(out.forall(_ == 2.0))
  }

  test("stoch is null when the 15-row window has zero range, else in [0,1]") {
    val flat = Indicators.withIndicators(mkBars(Seq.fill(5)(7.0)))
      .select("stoch").collect()
    assert(flat.forall(_.isNullAt(0)))
    val out = Indicators.withIndicators(mkBars(Seq(1.0, 9.0, 5.0)))
      .select("stoch").as[java.lang.Double].collect()
    assert(out(1) == 1.0) // 9 is the max of {1,9}
    assert(out(2) == 0.5) // (5-1)/(9-1)
  }

  test("bollinger distances: upper + lower = 4 * std (nstd=2 identity)") {
    val df = Indicators.withIndicators(mkBars(Seq(10.0, 14.0, 18.0, 10.0, 14.0)))
    val rows = df.select($"upper_bb_dist" + $"lower_bb_dist").as[Double].collect()
    // upper+lower = (avg+2s-c) + (c-avg+2s) = 4s >= 0
    assert(rows.forall(_ >= 0.0))
  }

  test("targets schema + tail semantics (lead null -> ELSE 0)") {
    val t = graft.ops.Indicators.targets(spark, sf0001)
    assert(t.columns.toSeq == Seq("bucket", "p0_close", "p8_close", "p15_close", "atr",
      "up1", "up2", "down1", "down2"))
    // tail rows: lead null -> labels 0 (reference ELSE-0 semantics)
    val tail = t.orderBy(desc("bucket")).limit(1)
      .select("up1", "up2", "down1", "down2").collect()(0)
    assert((0 until 4).forall(i => tail.getInt(i) == 0))
  }

  test("bars partition: one row per 5-min bucket, volume sums to row count") {
    val b = Indicators.bars(spark, sf0001)
    val n = Core.events(spark, sf0001).count()
    assert(b.agg(sum("volume")).as[Long].collect()(0) == n)
    assert(b.groupBy("bucket").count().filter($"count" > 1).isEmpty)
  }
}
