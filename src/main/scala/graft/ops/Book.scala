package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Order-book feature block (SURVEY.md §2.3 F1-F13, reference
  * spark_consumer.py:187-432) over a 7-level book synthesized
  * deterministically from `events` (FIXTURES.md §B): the same rows can
  * be built by DuckDB with identical SQL, so every feature is
  * oracle-checkable.
  *
  * Synthesis rules (exact in both engines):
  *   bid_i = value - (2i+1)/32;  ask_i = value + (2i+1)/32
  *     (offsets are multiples of 2^-5 — exactly representable doubles,
  *      so the SQL literal parses to the identical bit pattern)
  *   bid_i_size = h < 5 ? 0 : h*10  with  h = (event_id*(2i+3) + 7i) % 101
  *   ask_i_size = h < 5 ? 0 : h*10  with  h = (event_id*(2i+5) + 11i+3) % 103
  *     (integer math — exact; size 0 plays the reference's missing-level
  *      -> fillna(0) role, spark_consumer.py:311)
  *
  * Reference quirks preserved (SURVEY §7.3): spread = bid - ask (F7),
  * delta = asks - bids (F5), WA features weight *distance from best*
  * (F2/F3), Friday/week-5 all-zero one-hot (F12/F13), session_start
  * as-written bug (F11).
  */
object Book extends QueryModule {

  val nLevels = 7

  private def bidOff(i: Int): Double = (2 * i + 1) * 0.03125
  private def askOff(i: Int): Double = (2 * i + 1) * 0.03125

  // --- Spark side ---------------------------------------------------------

  private def bid(i: Int): Column = col("value") - lit(bidOff(i))
  private def ask(i: Int): Column = col("value") + lit(askOff(i))
  /** Level-i book sizes (public: Normalize's A2 pooling reuses them). */
  def bidSize(i: Int): Column = {
    val h = (col("event_id") * lit(2 * i + 3) + lit(7 * i)) % lit(101)
    when(h < 5, lit(0L)).otherwise(h * lit(10))
  }
  def askSize(i: Int): Column = {
    val h = (col("event_id") * lit(2 * i + 5) + lit(11 * i + 3)) % lit(103)
    when(h < 5, lit(0L)).otherwise(h * lit(10))
  }
  /** The same size expressions as DuckDB SQL (shared with Normalize). */
  def bidSizeSql(i: Int): String =
    s"(CASE WHEN ((event_id * ${2 * i + 3} + ${7 * i}) % 101) < 5 THEN 0 ELSE ((event_id * ${2 * i + 3} + ${7 * i}) % 101) * 10 END)"
  def askSizeSql(i: Int): String =
    s"(CASE WHEN ((event_id * ${2 * i + 5} + ${11 * i + 3}) % 103) < 5 THEN 0 ELSE ((event_id * ${2 * i + 5} + ${11 * i + 3}) % 103) * 10 END)"

  /** The synthesized book as named columns (the decode/flatten shape
    * P2/P3 lands in). Carries event_type so the per-series training
    * matrix (Indicators.featureMatrixBy, r16) can partition on it;
    * consumers select by name, and Catalyst prunes it everywhere
    * else. */
  def book(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq(col("event_id"), col("ts"), col("event_type"), col("value")) ++
      (0 until nLevels).flatMap { i =>
        Seq(bid(i).as(s"bid_$i"), bidSize(i).as(s"bid_${i}_size"),
          ask(i).as(s"ask_$i"), askSize(i).as(s"ask_${i}_size"))
      }
    Core.events(spark, dir).select(cols: _*)
  }

  /** Names of the F2-F8 scalar features in reference emission order
    * (spark_consumer.py:320-400): 6 scalars + 12 relative levels. */
  val featureNames: Seq[String] =
    Seq("bids_ord_wa", "asks_ord_wa", "vol_imbalance", "delta", "micro_price", "spread") ++
      (1 until nLevels).flatMap(i => Seq(s"bid_${i}_rel", s"ask_${i}_rel"))

  /** The 14 per-level size columns the reference KEEPS in its training
    * table (spark_consumer.py:379-400 drops only level-0 prices; sizes
    * survive into stock_data_joined and are normalized later by the
    * dataloader's book-wide pooling A2). */
  val sizeNames: Seq[String] =
    (0 until nLevels).flatMap(i => Seq(s"bid_${i}_size", s"ask_${i}_size"))

  /** F2-F8 as named Columns over the wide book layout (shared by
    * `bookFeatures` and `Indicators.featureMatrix`). Aligned 1:1 with
    * `featureNames`. */
  def featureCols: Seq[Column] = {
    def c(n: String) = col(n)
    // F2/F3: depth-weighted distance from best (quirk: distance, not price)
    val bidNum = (0 until nLevels).map(i =>
      (c("bid_0") - c(s"bid_$i")) * c(s"bid_${i}_size").cast("double")).reduceLeft(_ + _)
    val bidDen = (0 until nLevels).map(i => c(s"bid_${i}_size")).reduceLeft(_ + _)
    val askNum = (0 until nLevels).map(i =>
      (c("ask_0") - c(s"ask_$i")) * c(s"ask_${i}_size").cast("double")).reduceLeft(_ + _)
    val askDen = (0 until nLevels).map(i => c(s"ask_${i}_size")).reduceLeft(_ + _)
    val sumBid = bidDen
    val sumAsk = askDen
    val b0s = c("bid_0_size").cast("double")
    val a0s = c("ask_0_size").cast("double")
    val imbDen = b0s + a0s
    val i01 = b0s / imbDen
    val relCols = (1 until nLevels).flatMap { i =>
      Seq(
        when(c(s"bid_$i") =!= 0.0, c("bid_0") - c(s"bid_$i")).otherwise(0.0).as(s"bid_${i}_rel"),
        when(c(s"ask_$i") =!= 0.0, c("ask_0") - c(s"ask_$i")).otherwise(0.0).as(s"ask_${i}_rel"))
    }
    Seq(
      when(bidDen === 0, lit(0.0)).otherwise(bidNum / bidDen.cast("double")).as("bids_ord_wa"),
      when(askDen === 0, lit(0.0)).otherwise(askNum / askDen.cast("double")).as("asks_ord_wa"),
      when(imbDen === 0.0, lit(0.0)).otherwise((b0s - a0s) / imbDen).as("vol_imbalance"),
      (sumAsk - sumBid).as("delta"),
      when(imbDen === 0.0, lit(0.0))
        .otherwise(i01 * c("ask_0") + (lit(1.0) - i01) * c("bid_0")).as("micro_price"),
      when(c("ask_0") =!= 0.0 && c("bid_0") =!= 0.0, c("bid_0") - c("ask_0"))
        .otherwise(0.0).as("spread")) ++ relCols
  }

  /** F2-F8 — order-book scalar features (spark_consumer.py:320-400). */
  def bookFeatures(spark: SparkSession, dir: String): DataFrame =
    book(spark, dir).select(col("event_id") +: featureCols: _*)

  /** The synthesized wide book as a DuckDB subquery (event_id, ts, value,
    * bid_i/ask_i prices + sizes) — shared by bookFeatures and
    * Indicators.featureMatrix oracles. */
  val bookSqlFrom: String = {
    val bookCols = (Seq("event_id", "ts", "event_type", "value") ++
      (0 until nLevels).flatMap(i => Seq(
        s"(value - ${bidOff(i)}) AS bid_$i", s"${bidSizeSql(i)} AS bid_${i}_size",
        s"(value + ${askOff(i)}) AS ask_$i", s"${askSizeSql(i)} AS ask_${i}_size"))).mkString(", ")
    s"(SELECT $bookCols FROM ${Core.sqlEvents})"
  }

  /** F2-F8 as `expr AS name` DuckDB select-list items over `bookSqlFrom`,
    * aligned 1:1 with `featureNames`. */
  val featureExprsSql: Seq[String] = {
    val bidNum = (0 until nLevels).map(i =>
      s"(bid_0 - bid_$i) * CAST(bid_${i}_size AS DOUBLE)").mkString(" + ")
    val bidDen = (0 until nLevels).map(i => s"bid_${i}_size").mkString(" + ")
    val askNum = (0 until nLevels).map(i =>
      s"(ask_0 - ask_$i) * CAST(ask_${i}_size AS DOUBLE)").mkString(" + ")
    val askDen = (0 until nLevels).map(i => s"ask_${i}_size").mkString(" + ")
    val relCols = (1 until nLevels).flatMap { i =>
      Seq(
        s"CASE WHEN bid_$i <> 0.0 THEN bid_0 - bid_$i ELSE 0.0 END AS bid_${i}_rel",
        s"CASE WHEN ask_$i <> 0.0 THEN ask_0 - ask_$i ELSE 0.0 END AS ask_${i}_rel")
    }
    Seq(
      s"CASE WHEN ($bidDen) = 0 THEN 0.0 ELSE ($bidNum) / CAST($bidDen AS DOUBLE) END AS bids_ord_wa",
      s"CASE WHEN ($askDen) = 0 THEN 0.0 ELSE ($askNum) / CAST($askDen AS DOUBLE) END AS asks_ord_wa",
      """CASE WHEN CAST(bid_0_size AS DOUBLE) + CAST(ask_0_size AS DOUBLE) = 0.0 THEN 0.0
        |       ELSE (CAST(bid_0_size AS DOUBLE) - CAST(ask_0_size AS DOUBLE)) / (CAST(bid_0_size AS DOUBLE) + CAST(ask_0_size AS DOUBLE)) END AS vol_imbalance""".stripMargin,
      s"($askDen) - ($bidDen) AS delta",
      """CASE WHEN CAST(bid_0_size AS DOUBLE) + CAST(ask_0_size AS DOUBLE) = 0.0 THEN 0.0
        |       ELSE (CAST(bid_0_size AS DOUBLE) / (CAST(bid_0_size AS DOUBLE) + CAST(ask_0_size AS DOUBLE))) * ask_0
        |            + (1.0 - (CAST(bid_0_size AS DOUBLE) / (CAST(bid_0_size AS DOUBLE) + CAST(ask_0_size AS DOUBLE)))) * bid_0 END AS micro_price""".stripMargin,
      "CASE WHEN ask_0 <> 0.0 AND bid_0 <> 0.0 THEN bid_0 - ask_0 ELSE 0.0 END AS spread") ++ relCols
  }

  val bookFeaturesSql: String =
    s"""SELECT event_id,
       |  ${featureExprsSql.mkString(",\n  ")}
       |FROM $bookSqlFrom""".stripMargin

  /** F1 — candle/wick features over 5-min bars (spark_consumer.py:187-193):
    * wick_prct NULL on zero candle, then filled 0 (P7). */
  def candleFeatures(spark: SparkSession, dir: String): DataFrame = {
    val b = Indicators.bars(spark, dir)
    val candle = col("high") - col("low")
    val wick = when(col("close") >= col("open"), col("high") - col("close"))
      .otherwise(col("low") - col("close"))
    b.select(
      col("bucket"),
      candle.as("candle_size"),
      wick.as("wick_size"),
      when(candle === 0.0, lit(0.0)).otherwise(wick / candle).as("wick_prct"))
  }

  val candleFeaturesSql: String =
    s"""WITH bars AS (${Indicators.barsSql})
       |SELECT bucket,
       |  high - low AS candle_size,
       |  CASE WHEN "close" >= "open" THEN high - "close" ELSE low - "close" END AS wick_size,
       |  CASE WHEN high - low = 0.0 THEN 0.0
       |       ELSE (CASE WHEN "close" >= "open" THEN high - "close" ELSE low - "close" END) / (high - low) END AS wick_prct
       |FROM bars""".stripMargin

  /** F9-F13 — calendar features + one-hot encodings
    * (spark_consumer.py:402-432): ISO weekday, week-of-month, the
    * as-written session_start predicate (documented bug: intent was
    * "first 2h after open", implemented as hour>=11 AND minute>=30 -> 0),
    * day_1..4 / week_1..4 one-hots with Friday / week-5 all-zero. */
  def calendarFeatures(spark: SparkSession, dir: String): DataFrame = {
    val wd = (weekday(col("ts")) + lit(1)).as("week_day") // 1=Mon..7=Sun
    // Calendar-aligned week-of-month, matching the reference's
    // date_format(ts,'W') under its en-US locale (week starts Sunday,
    // minimal days in first week = 1): with w0 = Sunday-based weekday
    // of the 1st of the month (0=Sun..6=Sat), W = (day-1+w0)/7 + 1.
    // e.g. Sun 2024-03-03 (Mar 1 = Fri, w0=5) -> (2+5)/7+1 = 2, as 'W'
    // gives. Pure integer math, identical in both engines.
    val womExpr = expr(
      "CAST((day(ts) - 1 + (dayofweek(trunc(ts, 'MM')) - 1)) div 7 AS INT) + 1")
    val wom = womExpr.as("week_of_month")
    // as-written reference predicate (documented bug F11: 12:15 ->
    // minute 15 < 30 -> flagged as session start) ...
    val sess = when(hour(col("ts")) >= 11 && minute(col("ts")) >= 30, 0).otherwise(1).as("session_start")
    // ... and the corrected intent ("first 2h after the 9:30 open"):
    // 1 before 11:30, 0 after — exposed alongside (SURVEY §7.3)
    val sessFixed = when(hour(col("ts")) < 11 ||
      (hour(col("ts")) === 11 && minute(col("ts")) < 30), 1).otherwise(0).as("session_start_fixed")
    val dayHot = (1 to 4).map(k =>
      when(weekday(col("ts")) + lit(1) === k, 1).otherwise(0).as(s"day_$k"))
    val weekHot = (1 to 4).map(k =>
      when(womExpr === k, 1).otherwise(0).as(s"week_$k"))
    Core.events(spark, dir).select(Seq(col("event_id"), wd, wom, sess, sessFixed) ++ dayHot ++ weekHot: _*)
  }

  val calendarFeaturesSql: String = {
    val dayHot = (1 to 4).map(k =>
      s"CASE WHEN isodow(ts) = $k THEN 1 ELSE 0 END AS day_$k").mkString(",\n  ")
    // DuckDB dayofweek: 0=Sun..6=Sat — already the Sunday-based w0
    val womSql = "CAST((day(ts) - 1 + dayofweek(date_trunc('month', ts))) // 7 AS INTEGER) + 1"
    val weekHot = (1 to 4).map(k =>
      s"CASE WHEN $womSql = $k THEN 1 ELSE 0 END AS week_$k").mkString(",\n  ")
    s"""SELECT event_id,
       |  CAST(isodow(ts) AS INTEGER) AS week_day,
       |  $womSql AS week_of_month,
       |  CASE WHEN hour(ts) >= 11 AND minute(ts) >= 30 THEN 0 ELSE 1 END AS session_start,
       |  CASE WHEN hour(ts) < 11 OR (hour(ts) = 11 AND minute(ts) < 30) THEN 1 ELSE 0 END AS session_start_fixed,
       |  $dayHot,
       |  $weekHot
       |FROM ${Core.sqlEvents}""".stripMargin
  }

  /** S2/P6 — the IEX book-restructure shape (getMarketData.py:117-127
    * reshapes bids/asks lists into numbered levels): array-of-struct
    * levels -> posexplode generator -> one row per (event, level).
    * The inverse of the wide numbered-column layout. */
  def bookLevels(spark: SparkSession, dir: String): DataFrame = {
    val bidArr = array((0 until nLevels).map(i =>
      struct(bid(i).as("price"), bidSize(i).as("sz"))): _*)
    val askArr = array((0 until nLevels).map(i =>
      struct(ask(i).as("price"), askSize(i).as("sz"))): _*)
    Core.events(spark, dir)
      .select(col("event_id"), posexplode(bidArr).as(Seq("level", "b")),
        askArr.as("asks"))
      .select(col("event_id"), col("level"),
        col("b.price").as("bid_price"), col("b.sz").as("bid_size"),
        element_at(col("asks"), col("level") + 1).getField("price").as("ask_price"),
        element_at(col("asks"), col("level") + 1).getField("sz").as("ask_size"))
  }

  val bookLevelsSql: String = {
    val perLevel = (0 until nLevels).map { i =>
      s"""SELECT event_id, $i AS "level",
         |  (value - ${bidOff(i)}) AS bid_price,
         |  (CASE WHEN ((event_id * ${2 * i + 3} + ${7 * i}) % 101) < 5 THEN 0 ELSE ((event_id * ${2 * i + 3} + ${7 * i}) % 101) * 10 END) AS bid_size,
         |  (value + ${askOff(i)}) AS ask_price,
         |  (CASE WHEN ((event_id * ${2 * i + 5} + ${11 * i + 3}) % 103) < 5 THEN 0 ELSE ((event_id * ${2 * i + 5} + ${11 * i + 3}) % 103) * 10 END) AS ask_size
         |FROM ${Core.sqlEvents}""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""SELECT event_id, CAST("level" AS INTEGER) AS "level", bid_price, bid_size, ask_price, ask_size
       |FROM ($perLevel)""".stripMargin
  }

  override def queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "book_features" -> (bookFeatures _),
    "candle_features" -> (candleFeatures _),
    "calendar_features" -> (calendarFeatures _),
    "book_levels" -> (bookLevels _))

  override def oracle: Seq[(String, String)] = Seq(
    "book_features" -> bookFeaturesSql,
    "candle_features" -> candleFeaturesSql,
    "calendar_features" -> calendarFeaturesSql,
    "book_levels" -> bookLevelsSql)
}
