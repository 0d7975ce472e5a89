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

  def mediaChunks(spark: SparkSession, dir: String): DataFrame = {
    val chunkChars = defaultChunkChars
    val step = chunkChars * defaultChunkStride
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

  /** A decoded frame: what a real image decode would yield. `format`
    * is parsed from the container's magic bytes ("png"/"jpeg"/"gif",
    * or "unknown" for unrecognized payloads). */
  case class DecodedFrame(doc_id: Long, format: String, width: Int, height: Int,
      n_bytes: Int, mean_intensity: Double)

  /** REAL container-header decode (r6 verdict #7), pure Scala over the
    * raw bytes — no codec library involved, because none is needed for
    * the header layer:
    *  - PNG: 8-byte signature `89 50 4E 47 0D 0A 1A 0A`, then the IHDR
    *    chunk (always first, per the PNG spec) with big-endian
    *    width/height at offsets 16/20;
    *  - JPEG: `FF D8` SOI, then a walk of the marker segments (each
    *    `FF marker len16 payload`) to the first SOFn frame header
    *    (C0-CF minus the non-frame C4/C8/CC), which carries big-endian
    *    height/width at offsets +5/+7; fill bytes (`FF FF`) and
    *    standalone markers (RSTn/TEM) are skipped without a length;
    *  - GIF: `GIF87a`/`GIF89a`, little-endian width/height at 6/8.
    * Returns ("unknown", -1, -1) for anything else — including
    * truncated headers: every index is bounds-checked, so a cut-off
    * stream degrades to unknown instead of throwing mid-task.
    * PIXEL decode (the part that genuinely needs a codec) remains out
    * of scope for this container; [[decodeStub]] keeps standing in for
    * it, clearly marked. */
  def parseMediaHeader(p: Array[Byte]): (String, Int, Int) = {
    val unknown = ("unknown", -1, -1)
    def u8(i: Int): Int = p(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    if (p.length >= 24 &&
        u8(0) == 0x89 && u8(1) == 0x50 && u8(2) == 0x4e && u8(3) == 0x47 &&
        u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a &&
        u8(12) == 'I' && u8(13) == 'H' && u8(14) == 'D' && u8(15) == 'R')
      ("png", be32(16), be32(20))
    else if (p.length >= 2 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      var out = unknown
      var done = false
      while (!done && i + 1 < p.length) {
        if (u8(i) != 0xff) done = true // desynced / corrupt stream
        else u8(i + 1) match {
          case 0xff => i += 1 // fill byte before a marker
          case m if m == 0x01 || (m >= 0xd0 && m <= 0xd8) => i += 2 // TEM/RSTn/SOI: no length
          case 0xd9 => done = true // EOI before any frame header
          case m =>
            if (i + 3 >= p.length) done = true
            else {
              val len = be16(i + 2)
              if (len < 2) done = true
              else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
                // SOFn: [len16 precision8 height16 width16 ...]
                if (i + 8 < p.length) out = ("jpeg", be16(i + 7), be16(i + 5))
                done = true
              } else i += 2 + len
            }
        }
      }
      out
    } else if (p.length >= 10 &&
        u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F' && u8(3) == '8' &&
        (u8(4) == '7' || u8(4) == '9') && u8(5) == 'a')
      ("gif", le16(6), le16(8))
    else unknown
  }

  /** STUB pixel decoder: a real implementation would call an image
    * codec here (e.g. javax.imageio / ffmpeg bindings); this container
    * has none, so it derives a deterministic fake intensity from the
    * payload bytes. The signature and batching shape are the real
    * ones; the header fields come from [[parseMediaHeader]] when the
    * payload carries a recognized container. */
  def decodeStub(payload: Array[Byte], widthHint: Int, heightHint: Int): DecodedFrame = {
    var acc = 0L
    var i = 0
    while (i < payload.length) { acc = (acc * 31 + (payload(i) & 0xff)) % 100003L; i += 1 }
    val (fmt, w, h) = parseMediaHeader(payload)
    if (fmt == "unknown")
      DecodedFrame(-1L, fmt, widthHint, heightHint, payload.length, (acc % 256L).toDouble)
    else
      DecodedFrame(-1L, fmt, w, h, payload.length, (acc % 256L).toDouble)
  }

  /** Distributed decode: mapPartitions so per-partition setup (codec /
    * model handle) happens once per task, not once per row — the shape
    * that matters at 100 TB where decoder init dominates small rows.
    * Header fields (format/width/height) are REAL (magic-byte parse);
    * the intensity is the documented stub. Hints only apply to
    * unrecognized payloads. */
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
    "media_meta" -> (mediaMeta _),
    "media_embed" -> (mediaEmbed _),
    "media_chunks" -> (mediaChunks _))

  override def oracle: Seq[(String, String)] = Seq(
    "media_meta" -> mediaMetaSql,
    "media_embed" -> mediaEmbedSql,
    "media_chunks" -> mediaChunksSql)
}
