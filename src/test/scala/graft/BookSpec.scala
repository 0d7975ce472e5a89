package graft

import org.apache.spark.sql.functions._
import graft.ops.Book

/** Semantics checks for the order-book feature block (F1-F13),
  * including the reference quirks that MUST hold (SURVEY §7.3). */
class BookSpec extends SparkSpec {
  import spark.implicits._

  lazy val feats = Book.bookFeatures(spark, sf0001).cache()
  lazy val book = Book.book(spark, sf0001).cache()

  test("spread is bid - ask (negative; reference quirk F7)") {
    val spreads = feats.select("spread").as[Double].collect()
    assert(spreads.forall(_ < 0.0)) // synthesized books always cross: bid0 < ask0
    // -(2 * 1/32) up to fp rounding of (value - off) - (value + off)
    assert(spreads.forall(s => math.abs(s + 0.0625) < 1e-9))
  }

  test("micro_price lies between bid_0 and ask_0 when both sizes > 0") {
    val rows = book.select($"event_id", $"bid_0", $"ask_0", $"bid_0_size", $"ask_0_size")
      .join(feats.select($"event_id", $"micro_price"), "event_id")
      .filter($"bid_0_size" > 0 && $"ask_0_size" > 0)
      .select($"bid_0" <= $"micro_price" && $"micro_price" <= $"ask_0").as[Boolean].collect()
    assert(rows.nonEmpty && rows.forall(identity))
  }

  test("delta = sum(ask sizes) - sum(bid sizes) (quirk F5)") {
    val sample = book.limit(50)
    val askSum = (0 until Book.nLevels).map(i => col(s"ask_${i}_size")).reduce(_ + _)
    val bidSum = (0 until Book.nLevels).map(i => col(s"bid_${i}_size")).reduce(_ + _)
    val expected = sample.select($"event_id", (askSum - bidSum).as("d"))
    val got = feats.select($"event_id", $"delta")
    assert(expected.join(got, "event_id").filter($"d" =!= $"delta").isEmpty)
  }

  test("bids_ord_wa weights distance from best bid; zero book -> 0") {
    // bid_0 - bid_i = 2i/32 >= 0, so the WA is nonnegative
    assert(feats.filter($"bids_ord_wa" < 0.0).isEmpty)
    // asks: ask_0 - ask_i <= 0 -> nonpositive (quirk F3)
    assert(feats.filter($"asks_ord_wa" > 0.0).isEmpty)
  }

  test("vol_imbalance in [-1, 1]") {
    assert(feats.filter(abs($"vol_imbalance") > 1.0).isEmpty)
  }

  test("relative levels are 0 exactly when the level price is 0 (F8)") {
    // synthesized prices are never 0, so rel = bid_0 - bid_i = 2i/32 exactly
    val r = feats.select("bid_3_rel").as[Double].collect()
    assert(r.forall(_ == 6.0 / 32.0))
  }

  test("calendar one-hots: day_1..4 sum <= 1, all-zero on Friday+ (F12)") {
    val cal = Book.calendarFeatures(spark, sf0001)
    val bad = cal.filter($"day_1" + $"day_2" + $"day_3" + $"day_4" > 1)
    assert(bad.isEmpty)
    val friday = cal.filter($"week_day" >= 5)
      .filter($"day_1" + $"day_2" + $"day_3" + $"day_4" =!= 0)
    assert(friday.isEmpty)
  }

  test("candle features: wick_prct filled 0 on zero-range candle (F1/P7)") {
    val c = Book.candleFeatures(spark, sf0001)
    assert(c.filter($"candle_size" === 0.0 && $"wick_prct" =!= 0.0).isEmpty)
  }
}
