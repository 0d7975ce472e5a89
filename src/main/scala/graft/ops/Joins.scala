package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** J1 — the reference's interval (tolerance) stream-stream join
  * (spark_consumer.py:434-477): inner join on equal 5-min bucket AND
  * other_ts in [deep_ts, deep_ts + 3 min]. Batch analogue here (the
  * streaming form with watermarks lives in graft.streaming); `purchase`
  * events stand in for the DEEP book stream, `view` events for the VIX
  * stream (FIXTURES.md §B mapping).
  *
  * Scale: the equi bucket key is what makes this join hash-partitionable
  * (the reference added it for exactly that reason — SURVEY §4.1); the
  * range predicate is evaluated post-shuffle within each bucket. At
  * 100 TB both sides shuffle on bucket — bounded state, no cross
  * product beyond a bucket.
  */
object Joins extends QueryModule {

  def intervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Core.events(spark, dir)
    val deep = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("deep_id"), col("ts").as("deep_ts"),
        col("value").as("deep_value"), Core.bucket5m(col("ts")).as("bucket"))
    val vix = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("vix_id"), col("ts").as("vix_ts"),
        col("value").as("vix_value"), Core.bucket5m(col("ts")).as("bucket"))
    deep.join(vix,
        deep("bucket") === vix("bucket") &&
          col("vix_ts") >= col("deep_ts") &&
          col("vix_ts") <= col("deep_ts") + expr("INTERVAL 3 MINUTES"),
        "inner")
      .select(col("deep_id"), col("deep_ts"), col("deep_value"),
        col("vix_id"), col("vix_ts"), col("vix_value"))
  }

  val intervalJoinSql: String =
    s"""WITH e AS (SELECT *, ${Core.bucket5mSql} AS bucket FROM ${Core.sqlEvents})
       |SELECT d.event_id AS deep_id, d.ts AS deep_ts, d.value AS deep_value,
       |       v.event_id AS vix_id, v.ts AS vix_ts, v.value AS vix_value
       |FROM e d JOIN e v
       |  ON d.bucket = v.bucket
       | AND v.ts >= d.ts AND v.ts <= d.ts + INTERVAL 3 MINUTES
       |WHERE d.event_type = 'purchase' AND v.event_type = 'view'""".stripMargin

  /** J1 + O1 — the wide join output deduplicated (spark_consumer.py:477
    * guards re-emission with a full-row dropDuplicates). */
  def intervalJoinDedup(spark: SparkSession, dir: String): DataFrame =
    intervalJoin(spark, dir)
      .select(col("deep_id"),
        Core.bucket5m(col("deep_ts")).as("bucket"))
      .dropDuplicates()

  val intervalJoinDedupSql: String =
    s"""SELECT DISTINCT deep_id, make_timestamp((epoch_us(deep_ts) // 300000000) * 300000000) AS bucket
       |FROM ($intervalJoinSql)""".stripMargin

  override def queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "interval_join" -> ((s, d) => intervalJoin(s, d)),
    "interval_join_dedup" -> ((s, d) => intervalJoinDedup(s, d)))

  override def oracle: Seq[(String, String)] = Seq(
    "interval_join" -> intervalJoinSql,
    "interval_join_dedup" -> intervalJoinDedupSql)
}
