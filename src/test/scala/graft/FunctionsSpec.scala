package graft

import org.apache.spark.sql.functions._
import graft.functions.{dot_product, poly_hash, PolyHash}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions: Column API, SQL registration, and
  * codegen/interpreted agreement. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("poly_hash: Column API, SQL registration, interpreted agreement") {
    graft.functions.register(spark)
    val viaSql = spark.sql("SELECT poly_hash('hello world')").as[Long].head()
    val viaCol = Seq("hello world").toDF("s")
      .select(poly_hash($"s")).as[Long].head()
    val direct = PolyHash.hash(UTF8String.fromString("hello world"))
    assert(viaSql == direct && viaCol == direct)
    // empty string hashes to 0 (matches the oracle's CASE guard)
    assert(Seq("").toDF("s").select(poly_hash($"s")).as[Long].head() == 0L)
  }

  test("sanitizeColumns: P10 key cleanup at select time") {
    val df = Seq((1, 2.0)).toDF("Nonfarm. Payrolls", "Unemployment Rate")
    val clean = graft.ops.Relational.sanitizeColumns(df)
    assert(clean.columns.toSeq == Seq("Nonfarm_Payrolls", "Unemployment_Rate"))
  }

  test("dot_product equals the HOF fold bit-for-bit on real embeddings") {
    val emb = graft.ops.Core.embeddings(spark, sf0001).limit(50)
    val hof = aggregate(
      zip_with($"embedding", $"embedding", (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val diff = emb.select(
        dot_product($"embedding", $"embedding").as("native"), hof.as("hofv"))
      .filter($"native" =!= $"hofv")
    assert(diff.isEmpty, "native and HOF dot products must be bit-identical")
  }

  test("CandleAggregator (typed Aggregator) matches the untyped bars query") {
    import graft.functions.{CandleAggregator, Tick}
    val ev = graft.ops.Core.events(spark, sf0001)
    val typed = ev
      .select(graft.ops.Core.bucket5m($"ts").as("bucket"), $"event_id", $"value")
      .as[(java.sql.Timestamp, Long, Double)]
      .groupByKey(_._1)
      .mapValues { case (_, id, v) => Tick(id, v) }
      .agg(CandleAggregator.toColumn)
      .toDF("bucket", "candle")
      .select($"bucket", $"candle.open", $"candle.high", $"candle.low",
        $"candle.close", $"candle.volume")
    val untyped = graft.ops.Indicators.bars(spark, sf0001)
      .select($"bucket", $"open", $"high", $"low", $"close", $"volume")
    assert(typed.count() == untyped.count())
    assert(typed.except(untyped).isEmpty && untyped.except(typed).isEmpty,
      "typed Aggregator candles must equal the untyped min_by/max_by bars")
  }

  test("dot_product rejects non-float arrays at analysis time") {
    graft.functions.register(spark)
    val doubles = Seq(Seq(1.0, 2.0)).toDF("a") // array<double>
    doubles.createOrReplaceTempView("dp_doubles")
    val ex = intercept[Exception] {
      spark.sql("SELECT dot_product(a, a) FROM dp_doubles").collect()
    }
    assert(ex.getMessage.contains("array<float>"),
      s"expected an analysis-time type error, got: ${ex.getMessage}")
  }
}
