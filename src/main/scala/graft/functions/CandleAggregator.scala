package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A tick as the typed aggregator consumes it. */
case class Tick(event_id: Long, value: Double)

/** Merge state: running OHLC extremes with the event ids that own the
  * open/close picks (so merge order can never change the result). */
case class CandleBuf(
    openId: Long, open: Double,
    high: Double, low: Double,
    closeId: Long, close: Double,
    volume: Long)

/** The finished 5-minute candle. */
case class Candle(open: Double, high: Double, low: Double, close: Double, volume: Long)

/** Typed OHLCV candle as an `Aggregator[IN, BUF, OUT]` — the custom-agg
  * surface SURVEY §2.10 (U2) names: the reference needed none for
  * parity, and this demonstrates the extension point with the same
  * semantics as the untyped `bars` query (open = value at min
  * event_id, close = value at max event_id — the deterministic
  * tie-break the streaming bars also use). Commutative + associative
  * by construction, so partial (map-side) aggregation holds: `reduce`
  * and `merge` both take id-keyed extremes. Usable as
  * `ds.groupByKey(...).agg(CandleAggregator.toColumn)`. */
object CandleAggregator extends Aggregator[Tick, CandleBuf, Candle] {

  override def zero: CandleBuf =
    CandleBuf(Long.MaxValue, 0.0, Double.NegativeInfinity, Double.PositiveInfinity,
      Long.MinValue, 0.0, 0L)

  override def reduce(b: CandleBuf, t: Tick): CandleBuf =
    CandleBuf(
      if (t.event_id < b.openId) t.event_id else b.openId,
      if (t.event_id < b.openId) t.value else b.open,
      math.max(b.high, t.value),
      math.min(b.low, t.value),
      if (t.event_id > b.closeId) t.event_id else b.closeId,
      if (t.event_id > b.closeId) t.value else b.close,
      b.volume + 1L)

  override def merge(a: CandleBuf, b: CandleBuf): CandleBuf =
    CandleBuf(
      if (a.openId <= b.openId) a.openId else b.openId,
      if (a.openId <= b.openId) a.open else b.open,
      math.max(a.high, b.high),
      math.min(a.low, b.low),
      if (a.closeId >= b.closeId) a.closeId else b.closeId,
      if (a.closeId >= b.closeId) a.close else b.close,
      a.volume + b.volume)

  override def finish(r: CandleBuf): Candle =
    Candle(r.open, r.high, r.low, r.close, r.volume)

  override def bufferEncoder: Encoder[CandleBuf] = Encoders.product[CandleBuf]
  override def outputEncoder: Encoder[Candle] = Encoders.product[Candle]
}
