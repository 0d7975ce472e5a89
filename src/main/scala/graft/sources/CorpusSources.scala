package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Landed-corpus ingestion edges (builder brief "another source
  * format"): web-scale text corpora arrive as JSONL / CSV drops long
  * before they are columnar. These readers pin three decisions a
  * 100 TB ingest cannot leave to defaults:
  *
  *   1. EXPLICIT schema, never inference — schema inference runs a
  *      whole extra pass over the input (doubling ingest I/O) and
  *      silently widens types per-drop (an all-null day turns a column
  *      to string and poisons downstream casts).
  *   2. Line-level decode via the TEXT source + from_json/from_csv,
  *      not the format readers' internal corrupt-record machinery: the
  *      internal `_corrupt_record` column cannot be queried on its own
  *      (Spark raises QUERY_ONLY_CORRUPT_RECORD_COLUMN because column
  *      pruning would leave nothing parsed), while a parse STRUCT with
  *      a corrupt field is just another column — prunable, cacheable,
  *      and the raw line stays addressable for quarantine/replay.
  *      Text-source lines are also splittable exactly like the format
  *      readers' (and a .gz drop is one task either way — shard drops
  *      at the producer).
  *   3. Convert to parquet EARLY: text formats parse every byte of
  *      every line per query — no column pruning, no predicate
  *      pushdown, no row-group skipping. The read path here exists to
  *      feed a parquet landing write, after which every graft op gets
  *      the columnar scan it was planned for.
  */
object CorpusSources {

  val corruptCol = "_corrupt_record"

  /** The documents-table schema as a landed-drop contract. */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Decode one-line records. Blank/whitespace-only lines are NOT
    * records (shard-concatenation separators) and are dropped before
    * decode; any other line whose parse comes back as a NULL struct —
    * from_json returns null rather than a corrupt-record struct for
    * inputs like a bare whitespace payload — is routed to quarantine
    * rather than leaking through as an all-null "clean" row (the
    * failure mode a blank-line drop exposed: such rows passed the
    * corrupt filter, then vanished in the quality gate — in neither
    * corpus nor quarantine). */
  private def decoded(raw: DataFrame, parse: org.apache.spark.sql.Column,
      full: StructType): DataFrame = {
    val quarantined = struct(full.fields.map { f =>
      (if (f.name == corruptCol) col("raw_line") else lit(null).cast(f.dataType))
        .as(f.name)
    }: _*)
    raw.filter(trim(col("value")) =!= "")
      .select(col("value").as("raw_line"), parse.as("r"))
      .withColumn("r", when(col("r").isNull, quarantined).otherwise(col("r")))
      .select(col("raw_line"), col("r.*"))
  }

  /** Read a JSONL drop under an explicit schema; lines that fail to
    * parse carry their raw text in `_corrupt_record` (data columns
    * null), everything else decodes typed. */
  def readJsonl(spark: SparkSession, path: String,
      schema: StructType = documentsSchema): DataFrame = {
    val full = schema.add(corruptCol, StringType)
    decoded(spark.read.text(path),
      from_json(col("value"), full,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corruptCol)),
      full)
  }

  /** Read a headered CSV drop under an explicit schema, same corrupt
    * capture. The header line is recognized by its literal text and
    * dropped before decode (from_csv sees data lines only). Multi-line
    * records are out of contract: they would make the drop
    * non-splittable (one parser must see the whole file), so the
    * producer contract is one record per line with newlines escaped. */
  def readCsv(spark: SparkSession, path: String,
      schema: StructType = documentsSchema): DataFrame = {
    val full = schema.add(corruptCol, StringType)
    val header = schema.fieldNames.mkString(",")
    decoded(spark.read.text(path).filter(col("value") =!= lit(header)),
      from_csv(col("value"), full,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corruptCol)),
      full)
  }

  /** Incremental drop processing: the STREAMING twin of [[readJsonl]]
    * — Structured Streaming's file source watches the drop directory
    * and each new file becomes (part of) a micro-batch, giving
    * exactly-once ingest over landed files with zero extra
    * infrastructure (no broker: the filesystem is the queue; the
    * checkpoint tracks which files are consumed). Decode is the
    * identical from_json projection, so the batch and streaming paths
    * cannot drift. `maxFilesPerTrigger` bounds micro-batch size — the
    * backpressure knob for a backlog of drops. */
  def streamJsonl(spark: SparkSession, path: String,
      schema: StructType = documentsSchema,
      maxFilesPerTrigger: Int = 16): DataFrame = {
    val full = schema.add(corruptCol, StringType)
    decoded(
      spark.readStream
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .text(path),
      from_json(col("value"), full,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corruptCol)),
      full)
  }

  /** The STREAMING twin of [[readCsv]] — same explicit schema, same
    * corrupt capture, same file-source incremental semantics as
    * [[streamJsonl]]. Header lines are recognized by literal text and
    * dropped BEFORE decode, which in streaming matters twice: every
    * newly dropped file carries its own header, and a header decoded
    * under PERMISSIVE would otherwise quarantine once per drop. */
  def streamCsv(spark: SparkSession, path: String,
      schema: StructType = documentsSchema,
      maxFilesPerTrigger: Int = 16): DataFrame = {
    val full = schema.add(corruptCol, StringType)
    val header = schema.fieldNames.mkString(",")
    decoded(
      spark.readStream
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .text(path)
        .filter(col("value") =!= lit(header)),
      from_csv(col("value"), full,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corruptCol)),
      full)
  }

  /** End-to-end landed-drop curation — the composition a continuously
    * fed corpus actually runs, wiring this module's edges to the
    * engine's gates and writer:
    *
    *   file-drop micro-batches ([[streamJsonl]])
    *     -> corrupt-line quarantine ([[splitCorrupt]])
    *     -> quality gate (the corpus_pipeline score, stateless map work)
    *     -> within-batch exact dedup on the content digest
    *     -> idempotent batch-partitioned parquet landing
    *        (StreamingPipeline.writeBatchIdempotent: a replayed batch
    *        rewrites its own batch_id=N/ partition, never duplicates)
    *
    * One foreachBatch produces BOTH outputs from one pass over each
    * micro-batch: `outDir/corpus/` (curated rows) and
    * `outDir/quarantine/` (raw malformed lines for replay). Dedup here
    * is within-batch only — each landed file is deduped as it arrives;
    * CROSS-batch dedup is the stateful path
    * (StreamingPipeline.streamingCorpusIngest / streamingNearDupIngest)
    * whose watermark state a landing writer deliberately does not
    * carry. Returns the started query; callers own its lifecycle. */
  def curateDrops(spark: SparkSession, dropDir: String, outDir: String,
      checkpoint: String, minQuality: Double = 0.55,
      format: String = "jsonl")
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.streaming.StreamingPipeline.writeBatchIdempotent
    val stream = format match {
      case "jsonl" => streamJsonl(spark, dropDir)
      case "csv" => streamCsv(spark, dropDir)
      case other => sys.error(s"curateDrops: unknown drop format '$other'")
    }
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // two sinks + the writer's isEmpty probes would otherwise
        // re-read and re-parse the drop files up to 4x per batch — the
        // standard multi-sink foreachBatch persist
        batch.persist()
        try {
          // Every input line must land in exactly one of corpus /
          // quarantine / (legitimately) the quality-gate floor. A line
          // that parses clean but carries null text ({"doc_id":1})
          // gets a null quality_score; the bare >= gate would drop it
          // via three-valued logic — in neither corpus nor quarantine,
          // the silent-vanish failure mode this module exists to
          // prevent (ADVICE r4). So: malformed = failed parse OR null
          // text OR null score; only scoreable rows face the quality
          // gate.
          val scored = batch.withColumn("quality_score",
            when(col("text").isNotNull, graft.ops.TextDedup.qualityScoreCol(
              col("text"), split(col("text"), " "))))
          val malformed = col(corruptCol).isNotNull || col("quality_score").isNull
          val bad = scored.filter(malformed).select(col("raw_line"))
          val curated = scored
            .filter(!malformed && col("quality_score") >= minQuality)
            .drop(corruptCol, "raw_line")
            .withColumn("digest", md5(col("text").cast("binary")))
            .dropDuplicates("digest")
          writeBatchIdempotent(curated, batchId, s"$outDir/corpus")
          writeBatchIdempotent(bad, batchId, s"$outDir/quarantine")
          ()
        } finally { batch.unpersist(); () }
      }
      .start()
  }

  /** Split a decoded drop into (clean, quarantine): clean rows drop
    * the raw line and corrupt column; quarantine keeps only the raw
    * line for inspection/replay. Both sides are filters over one scan
    * — the quarantine side is near-empty on a healthy drop. */
  def splitCorrupt(df: DataFrame): (DataFrame, DataFrame) = {
    val clean = df.filter(col(corruptCol).isNull).drop(corruptCol, "raw_line")
    val bad = df.filter(col(corruptCol).isNotNull).select(col("raw_line"))
    (clean, bad)
  }
}
