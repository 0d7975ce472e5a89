package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (north-star extension): media as opaque
  * `binary` columns + typed metadata, with decode / feature-extract
  * implemented as distributed per-partition transforms.
  *
  * The container has no image/audio codecs (builder brief), so the
  * decode step is a clearly-marked deterministic STUB; the Spark-side
  * plumbing — binary schema, batch iteration shape, partition-level
  * amortization (one "decoder init" per partition, the way a real
  * codec/model handle would be opened once per executor task) — is
  * real and tested (MultimodalSpec).
  *
  * `mediaMeta` is the oracle-checked slice: binary ingestion + metadata
  * extraction expressed in pure SQL functions (octet_length/sha256),
  * since DuckDB can reproduce those over the same synthesized payloads.
  */
object Multimodal extends QueryModule {

  /** Synthesized media payloads: text bytes stand in for an encoded
    * image; width/height derive from doc fields deterministically. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Core.documents(spark, dir).select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      (col("n_chars") % 64 * 16 + 16).cast("int").as("width_hint"),
      (col("doc_id") % 32 * 16 + 16).cast("int").as("height_hint"))

  /** Oracle-checked metadata pass: P1-style binary cast + digest +
    * size metadata (the schema/plumbing layer of multimodal ingest). */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).select(
      col("doc_id"),
      octet_length(col("payload")).as("n_bytes"),
      sha2(col("payload"), 256).as("digest"),
      col("width_hint"), col("height_hint"),
      (col("width_hint") * col("height_hint")).as("n_pixels_est"))

  val mediaMetaSql: String =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
      |  sha256(text) AS digest,
      |  CAST(n_chars % 64 * 16 + 16 AS INTEGER) AS width_hint,
      |  CAST(doc_id % 32 * 16 + 16 AS INTEGER) AS height_hint,
      |  CAST(n_chars % 64 * 16 + 16 AS INTEGER) * CAST(doc_id % 32 * 16 + 16 AS INTEGER) AS n_pixels_est
      |FROM documents""".stripMargin

  /** Feature extraction to a fixed-dimension vector — the multimodal ->
    * embedding step of a training pipeline (a real system runs a vision
    * tower here; the brief's container has none, so each dimension is a
    * deterministic poly-hash of the payload under a per-dimension
    * prefix). One native-expression pass per dimension, all map-side;
    * dimensions as scalar columns so the oracle compare stays exact.
    * The norm is derived with a left-folded IEEE tree both engines
    * write identically. */
  private val embedDims = 8

  def mediaEmbed(spark: SparkSession, dir: String): DataFrame = {
    val dims = 0 until embedDims
    val es = dims.map { j =>
      (graft.functions.poly_hash(concat(lit(j.toString), col("text"))).cast("double") /
        lit(1000003.0)).as(s"e$j")
    }
    val base = Core.documents(spark, dir).select(col("doc_id") +: es: _*)
    val normSq = dims.map(j => col(s"e$j") * col(s"e$j")).reduceLeft[Column](_ + _)
    base.withColumn("norm", sqrt(normSq))
  }

  val mediaEmbedSql: String = {
    val dims = 0 until embedDims
    val es = dims.map { j =>
      s"CAST(${TextDedup.charHashSql(s"('$j' || text)")} AS DOUBLE) / 1000003.0 AS e$j"
    }.mkString(",\n  ")
    val normSq = dims.map(j => s"e$j * e$j").mkString(" + ")
    s"""SELECT doc_id, ${dims.map(j => s"e$j").mkString(", ")}, sqrt($normSq) AS norm
       |FROM (SELECT doc_id, $es FROM documents)""".stripMargin
  }

  /** Frame sampling as an oracle-checked query: every stride-th
    * 64-char chunk of the payload with per-chunk digests (video
    * keyframe extraction shape — the generator fans each document out
    * to its sampled frames, all map-side). Empty documents are gated
    * out on BOTH sides: Spark's integer `/` truncates (length-1)/step
    * toward zero while DuckDB's `//` floors it, so an empty text would
    * emit one zero-byte chunk here and none in the oracle. */
  private val defaultChunkChars = 64
  private val defaultChunkStride = 4

  def mediaChunks(spark: SparkSession, dir: String,
      chunkChars: Int = defaultChunkChars, stride: Int = defaultChunkStride): DataFrame = {
    val step = chunkChars * stride
    Core.documents(spark, dir)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), ((length(col("text")) - 1) / lit(step)).cast("int")),
          i => col("text").substr(i * step + 1, lit(chunkChars)))))
      .select(col("doc_id"), col("pos").as("chunk_idx"),
        length(col("col")).as("n_bytes"),
        md5(col("col").cast("binary")).as("digest"))
  }

  /** Built from the same chunkChars/stride constants as the Scala side
    * so the two can't drift. */
  val mediaChunksSql: String = {
    val step = defaultChunkChars * defaultChunkStride
    s"""SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
       |  CAST(length(substring(text, i*$step+1, $defaultChunkChars)) AS INTEGER) AS n_bytes,
       |  md5(substring(text, i*$step+1, $defaultChunkChars)) AS digest
       |FROM (SELECT doc_id, text,
       |        unnest(range(0, CAST((length(text)-1)//$step AS INTEGER)+1)) AS i
       |      FROM documents WHERE length(text) > 0)""".stripMargin
  }

  // --- decode / feature-extract plumbing (not oracle-expressible) ---------

  /** A decoded frame: what a real image decode would yield. */
  case class DecodedFrame(doc_id: Long, width: Int, height: Int,
      n_bytes: Int, mean_intensity: Double)

  /** STUB decoder: a real implementation would call an image codec
    * here (e.g. javax.imageio / ffmpeg bindings); this container has
    * none, so it derives a deterministic fake frame from the payload
    * bytes. The signature and batching shape are the real ones. */
  def decodeStub(payload: Array[Byte], widthHint: Int, heightHint: Int): DecodedFrame = {
    var acc = 0L
    var i = 0
    while (i < payload.length) { acc = (acc * 31 + (payload(i) & 0xff)) % 100003L; i += 1 }
    DecodedFrame(-1L, widthHint, heightHint, payload.length, (acc % 256L).toDouble)
  }

  /** Distributed decode: mapPartitions so per-partition setup (codec /
    * model handle) happens once per task, not once per row — the shape
    * that matters at 100 TB where decoder init dominates small rows. */
  def decodeFrames(spark: SparkSession, dir: String): DataFrame = {
    val media = mediaTable(spark, dir)
    import spark.implicits._
    media.select("doc_id", "payload", "width_hint", "height_hint")
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { rows =>
        // per-partition decoder init would go here (opened once per task)
        rows.map { case (id, payload, w, h) =>
          decodeStub(payload, w, h).copy(doc_id = id)
        }
      }
      .toDF()
  }

  /** Frame sampling shape for video-like payloads: explode a payload
    * into every-nth-chunk "frames" (posexplode over a computed array —
    * the generator pattern S2/P6 uses for order-book levels). */
  def sampleChunks(spark: SparkSession, dir: String, chunkBytes: Int = 64, stride: Int = 4): DataFrame =
    mediaTable(spark, dir)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), ((octet_length(col("payload")) - 1) / lit(chunkBytes * stride)).cast("int")),
          i => col("payload").substr((i * chunkBytes * stride + 1).cast("int"), lit(chunkBytes)))))
      .withColumnsRenamed(Map("pos" -> "chunk_idx", "col" -> "chunk"))

  override def queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "media_meta" -> ((s, d) => mediaMeta(s, d)),
    "media_embed" -> ((s, d) => mediaEmbed(s, d)),
    "media_chunks" -> ((s, d) => mediaChunks(s, d)))

  override def oracle: Seq[(String, String)] = Seq(
    "media_meta" -> mediaMetaSql,
    "media_embed" -> mediaEmbedSql,
    "media_chunks" -> mediaChunksSql)
}
