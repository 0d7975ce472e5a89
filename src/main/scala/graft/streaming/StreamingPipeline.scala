package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Per-key running state carried across micro-batches (the custom
  * stateful-operator surface: KeyValueGroupedDataset.mapGroupsWithState). */
case class RunningAgg(key: String, n: Long, sum: Double, maxValue: Double)

/** Output row of [[StreamingPipeline.streamingSeqPacking]] — the
  * training-sequence coordinates of one packed document (same columns
  * as the batch `seq_packing` query). */
case class PackedDoc(doc_id: Long, shard: Long, n_tokens: Int,
  seq_first: Long, seq_last: Long, seq_offset: Long)

/** transformWithState processor for [[StreamingPipeline.runningStatsTWS]]:
  * one named ValueState variable per key, no TTL, no timers. */
class RunningStatsProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[String, (String, Double), RunningAgg] {
  @transient private var state: org.apache.spark.sql.streaming.ValueState[RunningAgg] = _

  override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    state = getHandle.getValueState[RunningAgg]("agg",
      org.apache.spark.sql.Encoders.product[RunningAgg],
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[(String, Double)],
      timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[RunningAgg] = {
    val prev = if (state.exists()) state.get()
      else RunningAgg(key, 0L, 0.0, Double.MinValue)
    var n = prev.n
    var s = prev.sum
    var mx = prev.maxValue
    rows.foreach { r =>
      n += 1; s += r._2; if (r._2 > mx) mx = r._2
    }
    val next = RunningAgg(key, n, s, mx)
    state.update(next)
    Iterator.single(next)
  }
}

/** The reference's streaming layer (SURVEY.md §2.9) rebuilt on Spark 4
  * Structured Streaming. Works on any streaming DataFrame with
  * (event_id long, ts timestamp, event_type string, value double) —
  * in tests a MemoryStream, in production a Kafka source with the
  * same downstream plan (S1: the source swap is one `readStream`
  * line; the plan below is source-agnostic).
  *
  * What the reference could NOT do on Spark 2.4.4 and we can:
  * chained stateful operators in append mode (Spark >= 3.4) — the
  * rolling aggregations it pushed out to MariaDB views run in-stream
  * here (`streamingBars`), and dedup state is watermark-bounded
  * (`dropDuplicatesWithinWatermark`) instead of unbounded.
  */
object StreamingPipeline {

  /** P5 — 5-min floor bucket (streaming-safe expression). */
  def bucket5m(ts: Column): Column =
    timestamp_micros((floor(unix_micros(ts) / lit(3.0e8)) * lit(3.0e8)).cast("long"))

  /** P1-P7 shape on a raw JSON stream: decode with explicit schema,
    * flatten, parse timestamp, bucket, fill — the per-topic pipeline
    * of spark_consumer.py:102-111 (any of the 5 sources). */
  def decodeJsonStream(raw: DataFrame, schemaDdl: String): DataFrame =
    raw.selectExpr("CAST(value AS STRING) AS json")
      .select(from_json(col("json"), org.apache.spark.sql.types.StructType.fromDDL(schemaDdl)).as("m"))
      .select(col("m.*"))
      .withColumn("ts", to_timestamp(col("Timestamp"), "yyyy-MM-dd HH:mm:ss"))
      .drop("Timestamp")
      .withColumn("bucket", bucket5m(col("ts")))

  /** J1 — watermarked interval join: equal 5-min bucket AND
    * right.ts in [left.ts, left.ts + 3 min], both sides watermarked
    * 5 min (spark_consumer.py:434-477). The bucket equi-key bounds the
    * symmetric-hash state and makes the join hash-partitionable. */
  def intervalJoin(left: DataFrame, right: DataFrame): DataFrame = {
    val l = left.withColumn("bucket", bucket5m(col("ts")))
      .withColumnRenamed("ts", "l_ts").withWatermark("l_ts", "5 minutes")
    val r = right.withColumn("bucket", bucket5m(col("ts")))
      .withColumnRenamed("ts", "r_ts").withWatermark("r_ts", "5 minutes")
    l.join(r,
      l("bucket") === r("bucket") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr("INTERVAL 3 MINUTES"),
      "inner")
  }

  /** A5 unlocked — the streaming windowed aggregation the reference
    * had to abandon (spark_consumer.py:116-149, README:137-141):
    * tumbling 5-min OHLCV-style bars with watermark-gated append
    * emission. Chained stateful ops are legal in Spark >= 3.4, so
    * downstream joins/aggs can consume this directly. */
  def streamingBars(events: DataFrame): DataFrame =
    events.withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "5 minutes").as("w"))
      .agg(
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        // tie-break on event_id (not ts): two events sharing a timestamp
        // would make a ts-keyed pick nondeterministic across runs; the
        // batch bars (Indicators.bars) pick close by event_id, so the
        // streaming form matches them exactly
        max_by(col("value"), col("event_id")).as("close"),
        count(lit(1)).as("volume"))
      .select(col("w.start").as("bucket"), col("high"), col("low"), col("close"), col("volume"))

  /** O1 streaming — watermark-bounded dedup
    * (dropDuplicatesWithinWatermark, Spark >= 3.5): replaces the
    * reference's unbounded-state dropDuplicates. */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String]): DataFrame =
    events.withWatermark("ts", "5 minutes")
      .dropDuplicatesWithinWatermark(keys)

  /** The reference's whole consumer DAG (spark_consumer.py:434-488):
    * the DEEP book stream inner-joined with each auxiliary stream
    * (VIX / volume / COT / indicators) on equal 5-min bucket AND
    * aux_ts in [deep_ts, deep_ts + 3 min], all sides watermarked
    * 5 min, then full-row dedup. `deep` must carry a `ts` column;
    * each aux (name, df) must carry `ts` plus its payload columns
    * (pre-renamed to be disjoint). Returns the wide joined frame with
    * deep's columns plus each aux's payload and `<name>_ts`. */
  def referenceDag(deep: DataFrame, auxes: Seq[(String, DataFrame)]): DataFrame = {
    val deepW = deep.withColumn("bucket", bucket5m(col("ts")))
      .withWatermark("ts", "5 minutes")
    val joined = auxes.foldLeft(deepW) { case (acc, (name, aux)) =>
      val a = aux
        .withColumnRenamed("ts", s"${name}_ts")
        .withColumn(s"${name}_bucket", bucket5m(col(s"${name}_ts")))
        .withWatermark(s"${name}_ts", "5 minutes")
      val step = acc.join(a,
        col("bucket") === col(s"${name}_bucket") &&
          col(s"${name}_ts") >= col("ts") &&
          col(s"${name}_ts") <= col("ts") + expr("INTERVAL 3 MINUTES"),
        "inner").drop(s"${name}_bucket")
      // keep the aux timestamp VALUE but clear its event-time tag:
      // chained stateful operators require one event-time column per
      // stream (deep's ts stays the watermark carrier)
      step.select(step.columns.map {
        case c if c == s"${name}_ts" =>
          col(c).as(c, org.apache.spark.sql.types.Metadata.empty)
        case c => col(c)
      }: _*)
    }
    joined.dropDuplicatesWithinWatermark()
  }

  /** Chained stateful operators — the Spark >= 3.4 unlock the whole
    * redesign hinges on (README: "the streaming limitation
    * disappears"): a second windowed aggregation over the streaming
    * bars (10-min rollup of 5-min bars). On 2.4.4 this threw
    * "Multiple streaming aggregations are not supported". */
  def streamingBarsRollup(events: DataFrame): DataFrame = {
    val bars = events.withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "5 minutes").as("w"))
      .agg(max(col("value")).as("high"), min(col("value")).as("low"),
        count(lit(1)).as("volume"))
    // window-over-window (Spark >= 3.4): group the 5-min window struct
    // into its enclosing 10-min window; the watermark propagates
    // through the first aggregation, no re-watermarking.
    bars.groupBy(window(col("w"), "10 minutes").as("w10"))
      .agg(max(col("high")).as("high"), min(col("low")).as("low"),
        sum(col("volume")).as("volume"))
      .select(col("w10.start").as("bucket10"), col("high"), col("low"), col("volume"))
  }

  /** The STREAMING indicator layer (W1/W2, create_database.py:76-103)
    * — the README's headline unlock made concrete: the rolling 6-bar
    * price/volume moving averages the reference computed in MariaDB
    * views run in-stream as a SECOND windowed aggregation over the
    * streaming bars. Row-frame windows (ROWS BETWEEN 5 PRECEDING)
    * don't exist on streams, but on a gapless 5-minute bar series the
    * 6-bar trailing frame IS the 30-minute sliding time window ending
    * at the bar: window(window_time(w), "30 minutes", "5 minutes")
    * puts bar B in exactly the windows [B-25m, B+5m) ... [B, B+30m),
    * and the one that ENDS at B+5m is B's trailing frame. Emission is
    * watermark-gated append; equality with the batch
    * Indicators.withIndicators frame on the same data is asserted in
    * StreamingSpec. Numeric treatment mirrors batch exactly: volume
    * sums are long (exact), price sums go through DECIMAL(18,2). */
  def streamingIndicators(events: DataFrame): DataFrame =
    barsMovingAvg(barsKeepWindow(events.withWatermark("ts", "5 minutes")))

  /** Third stateful depth: watermark-bounded dedup -> windowed bars ->
    * sliding MA, all chained in one append-mode stream (Spark >= 3.4;
    * each op on 2.4.4 would have thrown past the first). */
  def streamingIndicatorDag(events: DataFrame): DataFrame =
    barsMovingAvg(barsKeepWindow(
      events.withWatermark("ts", "5 minutes")
        .dropDuplicatesWithinWatermark(Seq("event_id"))))

  /** [[streamingBars]] keeping the window struct (the event-time
    * carrier a downstream windowed agg chains on). */
  private def barsKeepWindow(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "5 minutes").as("w"))
      .agg(
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("event_id")).as("close"),
        count(lit(1)).as("volume"))

  private def barsMovingAvg(bars: DataFrame): DataFrame =
    bars
      .groupBy(window(window_time(col("w")), "30 minutes", "5 minutes").as("wma"))
      .agg(
        (sum(col("volume")).cast("double") / count(lit(1)).cast("double")).as("vol_ma6"),
        (sum(col("close").cast("decimal(18,2)")).cast("double") /
          count(lit(1)).cast("double")).as("price_ma6"),
        count(lit(1)).as("n_bars"),
        max(col("w.start")).as("last_bar"))
      // the window ending at B+5m is bar B's trailing 6-bar frame; a
      // sliding window whose last contained bar is NOT its end bar is a
      // trailing artifact (it "ends" at a bucket with no bar — the
      // batch row frame has no such row), so it is filtered out
      // post-agg (stateless, append-safe)
      .filter(col("last_bar") === col("wma.end") - expr("INTERVAL 5 MINUTES"))
      .select(col("last_bar").as("bucket"),
        col("price_ma6"), col("vol_ma6"), col("n_bars"))

  /** K2 — the Kafka signal-sink projection (spark_consumer.py:490-502):
    * the joined timestamp JSON-encoded into a `value` column; the
    * writeStream target (format("kafka") + checkpointLocation) is the
    * only part that differs per deployment. */
  def signalProjection(df: DataFrame, tsCol: String): DataFrame =
    df.select(to_json(struct(col(tsCol).cast("string").as("Timestamp"))).as("value"))

  /** Custom per-key state across micro-batches via mapGroupsWithState
    * (the arbitrary-stateful surface the brief calls for): running
    * count/sum/max per series key, emitted per update. The reference
    * kept no cross-batch state in Spark at all (everything went to
    * MariaDB); this is the in-engine form. Output mode: update. */
  def runningStats(df: DataFrame): Dataset[RunningAgg] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("event_type").cast("string"), col("value").cast("double"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[RunningAgg, RunningAgg](GroupStateTimeout.NoTimeout) {
        (key, rows, state) =>
          val prev = state.getOption.getOrElse(RunningAgg(key, 0L, 0.0, Double.MinValue))
          var n = prev.n
          var s = prev.sum
          var mx = prev.maxValue
          rows.foreach { r =>
            n += 1; s += r._2; if (r._2 > mx) mx = r._2
          }
          val next = RunningAgg(key, n, s, mx)
          state.update(next)
          next
      }
  }

  /** The Spark 4 successor of [[runningStats]]: the same per-key
    * running aggregate through `transformWithState` — typed
    * StatefulProcessor with named state variables instead of the
    * single opaque GroupState blob. At scale this is the API that
    * matters: state lives in the RocksDB state store (spills beyond
    * heap; required by transformWithState), variables get independent
    * TTLs, and timers replace the single timeout. Equality with the
    * mapGroupsWithState form is asserted in StreamingSpec. */
  def runningStatsTWS(df: DataFrame): Dataset[RunningAgg] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("event_type").cast("string"), col("value").cast("double"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .transformWithState(
        new RunningStatsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
  }

  /** Sessionization in-stream: session_window merges events closer
    * than the gap into one growing window per key; state closes (and
    * the session emits, in append mode) once the watermark passes the
    * session end + gap. The batch twin is Relational.userSessions —
    * same gap semantics via lag/cumsum windows. */
  def streamingSessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", "5 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"),
        max(col("value")).as("max_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("max_value"))

  /** The training-data curation pipeline (corpus_pipeline's quality
    * gate + exact dedup) in STREAMING form — what a continuously-fed
    * 100 TB corpus actually runs: per-document quality scoring is
    * stateless map work, and exact dedup keys on the content digest
    * with watermark-bounded state (a duplicate arriving within the
    * watermark is dropped; state is evicted after it, so dedup memory
    * is bounded by ingest rate, not corpus size). Input schema:
    * (doc_id long, ts timestamp, text string, lang string). */
  def streamingCorpusIngest(docs: DataFrame, minQuality: Double = 0.55): DataFrame = {
    val toks = col("toks")
    docs
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), col("ts"), col("lang"),
        md5(col("text").cast("binary")).as("digest"),
        size(toks).as("n_tokens"),
        graft.ops.TextDedup.qualityScoreCol(col("text"), toks).as("quality_score"))
      .filter(col("quality_score") >= minQuality)
      .withWatermark("ts", "5 minutes")
      .dropDuplicatesWithinWatermark(Seq("digest"))
  }

  /** NEAR-duplicate streaming dedup: the map-side SimHash64 sketch is
    * a plain expression (graft.functions.SimHashPack via
    * TextDedup.simhash64Col), so it composes with watermark-bounded
    * dedup — a document whose 64-bit signature collides with one seen
    * inside the watermark is dropped. Signature equality is the
    * hamming-0 band of the batch simhash_pairs operator. What it
    * provably catches beyond exact-digest dedup: any rewrite that
    * preserves the shingle MULTISET — the bit votes are a commutative
    * sum over shingles, so reordering sections around shared boundary
    * context (the template/boilerplate-shuffle dup class) or
    * re-serializing with new ids/timestamps yields the identical
    * signature deterministically. What it does NOT promise: token-level
    * edits change the multiset and, with ~64 bits over short docs, some
    * zero-margin bit usually flips (measured while building the spec —
    * a one-token edit in a 150-shingle doc flipped the signature), so
    * edit-distance near-dups stay with the offline banded pipeline.
    * With the same bounded state as digest dedup. The full batch
    * near-dup pipeline (banded candidates -> clusters) needs the
    * whole corpus; this is its ingest-time complement, standard in
    * 100 TB pipelines: cheap sketch-equality gate in-stream, full
    * clustering offline. Input schema: (doc_id long, ts timestamp,
    * text string, lang string).
    *
    * Documents too short to shingle (< 3 tokens) PASS THROUGH: they
    * get a per-doc dedup key instead of a signature, so the gate never
    * deletes a document it cannot fingerprint (an earlier draft's
    * filter dropped them from the corpus entirely — data loss, not
    * dedup; and a shared null/zero signature would have collapsed all
    * short docs to one survivor). The key is a tagged string, so a
    * signature can never collide with a doc id. */
  def streamingNearDupIngest(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("simhash64",
        when(size(col("toks")) > 2,
          graft.ops.TextDedup.simhash64Col(graft.functions.token_ngrams(col("toks"), 3))))
      .withColumn("dedup_key",
        when(col("simhash64").isNotNull, concat(lit("s:"), col("simhash64")))
          .otherwise(concat(lit("d:"), col("doc_id"))))
      .drop("toks")
      .withWatermark("ts", "5 minutes")
      .dropDuplicatesWithinWatermark(Seq("dedup_key"))
      .drop("dedup_key")

  /** STREAMING sequence packing: the batch
    * [[graft.ops.TrainingData.seqPacking]] layout computed as
    * documents arrive — each shard's packing cursor (ONE long: the
    * cumulative token count) is the only cross-batch state, carried by
    * flatMapGroupsWithState. A continuously-fed corpus can therefore
    * emit training-sequence coordinates at ingest: thousands of shards
    * cost kilobytes of state, nothing like the windowed-agg state the
    * other stateful ops hold. Within a micro-batch the group's rows
    * sort by doc_id (iterator order is not contractual); ACROSS
    * batches the packing order is arrival order — equality with the
    * batch window form holds when docs arrive in doc_id order per
    * shard (asserted in StreamingSpec over multiple batches). No
    * watermark: the state never expires by design (a packing cursor is
    * meaningful for the stream's lifetime). Input: (doc_id, text). */
  def streamingSeqPacking(docs: DataFrame): Dataset[PackedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val L = graft.ops.TrainingData.seqLen
    val S = graft.ops.TrainingData.nShards
    docs
      .select(col("doc_id").cast("long"),
        size(split(col("text"), " ")).as("n_tokens"))
      .as[(Long, Int)]
      .groupByKey { case (id, _) => id % S }
      .flatMapGroupsWithState[Long, PackedDoc](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (shard, rows, state) =>
          var cum = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(_._1).map { case (id, n) =>
            val start = cum
            cum += n
            PackedDoc(id, shard, n, start / L, (cum - 1) / L, start % L)
          }
          state.update(cum)
          out.iterator
      }
  }

  /** K1 — the foreachBatch sink shape (spark_consumer.py:68-84):
    * empty-batch skip + idempotent batchId-keyed write (the production
    * fix SURVEY §7.3 calls out: the reference's JDBC append was
    * at-least-once). Idempotency comes from partitioning the output by
    * batch_id and dynamically overwriting only that partition — a
    * replayed micro-batch after a failure rewrites its own
    * `batch_id=N/` directory instead of appending a duplicate copy. */
  def foreachBatchParquetSink(df: DataFrame, outDir: String, checkpoint: String,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val w = df.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatchIdempotent(batch, batchId, outDir)
      }
    // S6 — the reference's 5-minute polling loop (producer.py:258) maps
    // to Trigger.ProcessingTime("5 minutes") here; tests drive a short
    // cadence and assert the executor actually runs processing-time
    trigger.fold(w)(w.trigger)
  }

  /** The per-micro-batch body of [[foreachBatchParquetSink]]: skip empty
    * batches, else rewrite exactly the `batch_id=N/` partition. Running
    * it twice with the same batchId (a replay) leaves one copy. */
  def writeBatchIdempotent(batch: DataFrame, batchId: Long, outDir: String): Unit =
    if (!batch.isEmpty) {
      batch.withColumn("batch_id", lit(batchId))
        .write
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .mode("overwrite")
        .parquet(outDir)
    }
}
