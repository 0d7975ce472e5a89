package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** A1/A2 — the dataloader's chunked min-max normalization
  * (sql_pytorch_dataloader.py:90-144): per-chunk MIN/MAX per column
  * with the epsilon bump on degenerate ranges (max += max*0.001, or
  * 0.001 when max == 0), plus the book-wide pooling of per-level size
  * ranges (A2, sql_pytorch_dataloader.py:117-144): the actual
  * synthesized book sizes (Book.bidSize/askSize — h*10 with the <5→0
  * floor) across ALL 7 bid and 7 ask levels, collapsed to a single
  * book-wide range via least/greatest over the per-level aggregates.
  *
  * The reference issued 2 SQL queries per chunk (82 round trips);
  * here one grouped aggregation computes every chunk's params in a
  * single distributed pass — chunk id is a pure function of event_id,
  * so the groupBy partial-aggregates map-side before one shuffle.
  */
object Normalize extends QueryModule {

  private val chunk = (col("event_id") / lit(1000)).cast("long").as("chunk")

  /** Per-chunk min/max of the price-like and json-decoded columns with
    * the reference's epsilon bump, plus pooled book size range (A2)
    * from the synthesized book sizes. */
  def chunkMinmax(spark: SparkSession, dir: String): DataFrame = {
    val sizeCols = (0 until Book.nLevels).flatMap { i =>
      Seq(Book.bidSize(i).as(s"bsz_$i"), Book.askSize(i).as(s"asz_$i"))
    }
    val ev = Core.events(spark, dir)
      .select(Seq(col("event_id"), col("value"),
        get_json_object(col("props"), "$.k").cast("int").as("k")) ++ sizeCols: _*)
    def bump(mn: Column, mx: Column): Column =
      when(mn === mx, when(mx =!= 0.0, mx + mx * lit(0.001)).otherwise(lit(0.001))).otherwise(mx)
    val sizeMins = (0 until Book.nLevels).flatMap(i =>
      Seq(min(col(s"bsz_$i")), min(col(s"asz_$i"))))
    val sizeMaxs = (0 until Book.nLevels).flatMap(i =>
      Seq(max(col(s"bsz_$i")), max(col(s"asz_$i"))))
    val g = ev.groupBy(chunk).agg(
      min(col("value")).as("value_min"), max(col("value")).as("value_max_raw"),
      min(col("k")).cast("int").as("k_min"), max(col("k")).cast("int").as("k_max_raw"),
      least(sizeMins: _*).as("book_size_min"),
      greatest(sizeMaxs: _*).as("book_size_max"))
    g.select(col("chunk"),
      col("value_min"), bump(col("value_min"), col("value_max_raw")).as("value_max"),
      col("k_min"),
      bump(col("k_min").cast("double"), col("k_max_raw").cast("double")).as("k_max"),
      col("book_size_min"), col("book_size_max"))
  }

  val chunkMinmaxSql: String = {
    val sizeSel = (0 until Book.nLevels).flatMap(i => Seq(
      s"${Book.bidSizeSql(i)} AS bsz_$i", s"${Book.askSizeSql(i)} AS asz_$i")).mkString(",\n    ")
    val sizeMins = (0 until Book.nLevels).flatMap(i =>
      Seq(s"CAST(min(bsz_$i) AS BIGINT)", s"CAST(min(asz_$i) AS BIGINT)")).mkString(", ")
    val sizeMaxs = (0 until Book.nLevels).flatMap(i =>
      Seq(s"CAST(max(bsz_$i) AS BIGINT)", s"CAST(max(asz_$i) AS BIGINT)")).mkString(", ")
    s"""WITH ev AS (
       |  SELECT event_id, value,
       |    CAST(json_extract_string(props, '$$.k') AS INTEGER) AS k,
       |    $sizeSel
       |  FROM ${Core.sqlEvents}),
       |g AS (
       |  SELECT CAST(event_id // 1000 AS BIGINT) AS chunk,
       |    min(value) AS value_min, max(value) AS value_max_raw,
       |    CAST(min(k) AS INTEGER) AS k_min, CAST(max(k) AS INTEGER) AS k_max_raw,
       |    least($sizeMins) AS book_size_min,
       |    greatest($sizeMaxs) AS book_size_max
       |  FROM ev GROUP BY 1)
       |SELECT chunk, value_min,
       |  CASE WHEN value_min = value_max_raw
       |       THEN CASE WHEN value_max_raw <> 0.0 THEN value_max_raw + value_max_raw * 0.001 ELSE 0.001 END
       |       ELSE value_max_raw END AS value_max,
       |  k_min,
       |  CASE WHEN CAST(k_min AS DOUBLE) = CAST(k_max_raw AS DOUBLE)
       |       THEN CASE WHEN CAST(k_max_raw AS DOUBLE) <> 0.0 THEN CAST(k_max_raw AS DOUBLE) + CAST(k_max_raw AS DOUBLE) * 0.001 ELSE 0.001 END
       |       ELSE CAST(k_max_raw AS DOUBLE) END AS k_max,
       |  book_size_min, book_size_max
       |FROM g""".stripMargin
  }

  /** A1 applied — min-max normalize `value` within its chunk
    * (sql_pytorch_dataloader.py:239 `(x - min) / (max - min)`), the
    * params joined back on the chunk key. No broadcast hint: params is
    * rows/1000 entries (data-proportional), so AQE broadcasts it at
    * small SF and falls back to a chunk-partitioned shuffle join —
    * both sides already keyed by chunk — once it outgrows the
    * threshold. */
  def minmaxNormalize(spark: SparkSession, dir: String): DataFrame = {
    val params = chunkMinmax(spark, dir)
      .select(col("chunk"), col("value_min"), col("value_max"))
    Core.events(spark, dir)
      .withColumn("chunk", chunk)
      .join(params, "chunk")
      .select(col("event_id"),
        ((col("value") - col("value_min")) / (col("value_max") - col("value_min")))
          .as("value_norm"))
  }

  val minmaxNormalizeSql: String =
    s"""WITH params AS (SELECT chunk, value_min, value_max FROM ($chunkMinmaxSql))
       |SELECT e.event_id,
       |  (e.value - p.value_min) / (p.value_max - p.value_min) AS value_norm
       |FROM (SELECT *, CAST(event_id // 1000 AS BIGINT) AS chunk FROM ${Core.sqlEvents}) e
       |JOIN params p USING (chunk)""".stripMargin

  /** Z-score normalization per series — the standardization twin of the
    * reference's min-max (the other normalizer every feature pipeline
    * offers; min-max is what the reference ships, z-score is what its
    * biGRU's tanh gates usually want). Mean and population stddev are
    * derived from EXACT decimal sums with the same s2 - s1^2/c tree the
    * indicator layer uses, so the doubles match the oracle bit-for-bit.
    * One grouped aggregation (map-side partials, keys = event types)
    * joined back — AQE broadcasts the handful of param rows. Degenerate
    * series (zero variance) yield null, not a division blow-up. */
  def zscoreNormalize(spark: SparkSession, dir: String): DataFrame = {
    val vDec = Core.dec2(col("value"))
    val g = Core.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(sum(vDec).as("s1"), sum(vDec * vDec).as("s2"), count(lit(1)).as("c"))
    val s1d = col("s1").cast("double")
    val s2d = col("s2").cast("double")
    val cd = col("c").cast("double")
    val mean = s1d / cd
    val std = sqrt(greatest((s2d - s1d * s1d / cd) / cd, lit(0.0)))
    val params = g.select(col("event_type"), mean.as("mean"), std.as("std"))
    Core.events(spark, dir)
      .join(params, "event_type")
      .select(col("event_id"), col("event_type"),
        when(col("std") > 0.0, (col("value") - col("mean")) / col("std")).as("value_z"))
  }

  val zscoreNormalizeSql: String =
    s"""WITH g AS (
       |  SELECT event_type,
       |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1d,
       |    CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s2d,
       |    CAST(COUNT(*) AS DOUBLE) AS cd
       |  FROM ${Core.sqlEvents} GROUP BY 1),
       |params AS (
       |  SELECT event_type, s1d / cd AS mean,
       |    sqrt(greatest((s2d - s1d * s1d / cd) / cd, 0.0)) AS std
       |  FROM g)
       |SELECT e.event_id, e.event_type,
       |  CASE WHEN p.std > 0.0 THEN (e.value - p.mean) / p.std END AS value_z
       |FROM ${Core.sqlEvents} e JOIN params p USING (event_type)""".stripMargin

  /** The dataloader's sliding-window batch extraction
    * (sql_pytorch_dataloader.py:8-18 window_indices: width-5 trailing
    * slices, stride 1): per 5-min bar, the trailing window of closes
    * as an ordered slice. Values travel as exact decimal strings so
    * both engines render identically; warmup rows (short windows)
    * carry their partial slice, as the reference's first chunk does.
    * Partition-less window: bars-not-events cardinality — see the
    * single-series bound on [[graft.ops.Indicators.indicators]]. */
  def windowSlices(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy("bucket").rowsBetween(-4, 0)
    Indicators.bars(spark, dir)
      .select(col("bucket"),
        concat_ws(",",
          collect_list(col("close").cast("decimal(18,2)").cast("string")).over(w))
          .as("win_closes"),
        count(lit(1)).over(w).as("win_len"))
  }

  val windowSlicesSql: String =
    s"""WITH bars AS (${Indicators.barsSql})
       |SELECT bucket,
       |  list_aggregate(list(CAST(CAST("close" AS DECIMAL(18,2)) AS VARCHAR)) OVER w, 'string_agg', ',') AS win_closes,
       |  COUNT(*) OVER w AS win_len
       |FROM bars
       |WINDOW w AS (ORDER BY bucket ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)""".stripMargin

  override def queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "chunk_minmax" -> (chunkMinmax _),
    "minmax_normalize" -> (minmaxNormalize _),
    "zscore_normalize" -> (zscoreNormalize _),
    "window_slices" -> (windowSlices _))

  override def oracle: Seq[(String, String)] = Seq(
    "chunk_minmax" -> chunkMinmaxSql,
    "minmax_normalize" -> minmaxNormalizeSql,
    "zscore_normalize" -> zscoreNormalizeSql,
    "window_slices" -> windowSlicesSql)
}
