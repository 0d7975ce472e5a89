package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamReader, DataStreamWriter, Trigger}

/** Deployment edges of the streaming layer: the Kafka source/sink
  * builders (S1/K2/K3, spark_consumer.py:94-101 + 490-502) and the
  * JDBC micro-batch writer (K1, spark_consumer.py:68-84).
  *
  * The sandbox ships no Kafka connector jar and no broker, so the
  * Kafka builders return the fully-configured DataStreamReader /
  * DataStreamWriter and leave `.load()` / `.start()` to the
  * deployment (where spark-sql-kafka is on the cluster classpath) —
  * the option maps themselves are unit-tested. The JDBC writer IS
  * integration-tested, against embedded Derby (the one JDBC engine on
  * the Spark classpath).
  */
object Connectors {

  /** S1 — the consumer's subscription options (spark_consumer.py:94-101
    * subscribes the 5 topics; O5's seek_to_end is `startingOffsets =
    * latest`, the config-only equivalent called out in SURVEY §2.5). */
  def kafkaSourceOptions(bootstrap: String, topics: Seq[String],
      startingOffsets: String = "latest"): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrap,
      "subscribe" -> topics.mkString(","),
      "startingOffsets" -> startingOffsets,
      // the reference polls a live feed: on retention-expired offsets
      // it resumes from the earliest available rather than dying
      "failOnDataLoss" -> "false")

  /** The configured source: `kafkaSource(...).load()` is the one line
    * that differs from the MemoryStream the tests drive — the decode
    * plan (StreamingPipeline.decodeJsonStream) is source-agnostic. */
  def kafkaSource(spark: SparkSession, bootstrap: String, topics: Seq[String],
      startingOffsets: String = "latest"): DataStreamReader =
    spark.readStream.format("kafka")
      .options(kafkaSourceOptions(bootstrap, topics, startingOffsets))

  /** K2/K3 — the signal/prediction producer options
    * (spark_consumer.py:490-502 writes the joined timestamp to the
    * signal topic; predict.py's producer has the same shape). */
  def kafkaSinkOptions(bootstrap: String, topic: String, checkpoint: String): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrap,
      "topic" -> topic,
      "checkpointLocation" -> checkpoint)

  /** The configured sink over a (key?, value) projection — compose with
    * StreamingPipeline.signalProjection for the reference's payload.
    * `trigger` is the S6 polling cadence (producer.py:258 polls every
    * 5 minutes -> Trigger.ProcessingTime("5 minutes")). */
  def kafkaSink(df: DataFrame, bootstrap: String, topic: String, checkpoint: String,
      trigger: Option[Trigger] = Some(Trigger.ProcessingTime("5 minutes"))): DataStreamWriter[Row] = {
    val w = df.writeStream.format("kafka")
      .options(kafkaSinkOptions(bootstrap, topic, checkpoint))
      .outputMode("append")
    trigger.fold(w)(w.trigger)
  }

  /** K4 — the console debug sink (the reference tails its streams with
    * format("console") while developing; spark_consumer.py keeps one
    * commented out). Same builder shape as the Kafka/parquet sinks so
    * the swap is one line in either direction. */
  def consoleSink(df: DataFrame, numRows: Int = 20,
      trigger: Option[Trigger] = None): DataStreamWriter[Row] = {
    val w = df.writeStream.format("console")
      .option("numRows", numRows.toString)
      .option("truncate", "true")
      .outputMode("append")
    trigger.fold(w)(w.trigger)
  }

  /** K1, JDBC form — the reference's foreachBatch JDBC append
    * (spark_consumer.py:68-84) was at-least-once: a micro-batch
    * replayed after a failure appended a second copy. This variant is
    * idempotent the same way the parquet sink is: the write is keyed
    * by batch_id, and a replay first clears its own batch_id rows
    * (delete-then-append; the delete is a no-op first time through).
    * Scale note: the delete predicate hits one batch_id — an indexed
    * point-range delete, not a table scan, on any real store.
    *
    * Crash window: the DELETE and the append run on separate
    * connections without a wrapping transaction, so a crash between
    * them leaves this batch's rows absent UNTIL Structured Streaming
    * replays the micro-batch (the checkpoint only advances after the
    * sink returns) — eventual exactly-once, with a transient gap
    * rather than transient duplicates. */
  def writeBatchIdempotentJdbc(batch: DataFrame, batchId: Long, url: String,
      table: String, props: java.util.Properties): Unit =
    if (!batch.isEmpty) {
      // identifier quoting must mirror Spark's jdbc writer EXACTLY:
      // it emits the table name unquoted (so the store case-folds it,
      // SIGNALS on Derby) but quotes every column through the dialect
      // ("batch_id" stays lowercase). A DELETE quoted differently
      // resolves to missing identifiers, and swallowing that error
      // would look exactly like "nothing to delete" and quietly break
      // exactly-once — so existence is checked via metadata (folded
      // per the store's identifier case) and the delete itself is
      // allowed to throw.
      val dialect = org.apache.spark.sql.jdbc.JdbcDialects.get(url)
      val conn = java.sql.DriverManager.getConnection(url, props)
      try {
        val meta = conn.getMetaData
        val lookup =
          if (meta.storesUpperCaseIdentifiers) table.toUpperCase
          else if (meta.storesLowerCaseIdentifiers) table.toLowerCase
          else table
        val exists = {
          val rs = meta.getTables(null, null, lookup, null)
          try rs.next() finally rs.close()
        }
        if (exists) {
          // parameterized batch_id: the value is a Long from the
          // streaming engine, but a PreparedStatement keeps the
          // statement text constant (plan cache friendly) and immune
          // to any future widening of the key type
          val ps = conn.prepareStatement(
            s"DELETE FROM $table WHERE ${dialect.quoteIdentifier("batch_id")} = ?")
          try { ps.setLong(1, batchId); ps.executeUpdate() }
          finally ps.close()
        }
      } finally conn.close()
      batch.withColumn("batch_id", lit(batchId))
        .write.mode("append").jdbc(url, table, props)
    }

  /** The streaming sink wrapping [[writeBatchIdempotentJdbc]], with the
    * S6 trigger cadence exposed like the parquet sink's. */
  def foreachBatchJdbcSink(df: DataFrame, url: String, table: String,
      props: java.util.Properties, checkpoint: String,
      trigger: Option[Trigger] = None): DataStreamWriter[Row] = {
    val w = df.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatchIdempotentJdbc(batch, batchId, url, table, props)
      }
    trigger.fold(w)(w.trigger)
  }
}
