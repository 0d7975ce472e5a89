package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

/** Plumbing tests for the multimodal (binary column) layer: the decode
  * step itself is a stub (no codecs in this container), the schema /
  * partition-level batching / generator shapes are real. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeFrames: one frame per payload, deterministic stub features") {
    val frames = Multimodal.decodeFrames(spark, sf0001).cache()
    val n = graft.ops.Core.documents(spark, sf0001).count()
    assert(frames.count() == n)
    assert(frames.columns.toSeq ==
      Seq("doc_id", "format", "width", "height", "n_bytes", "mean_intensity"))
    assert(frames.filter($"n_bytes" <= 0).isEmpty)
    assert(frames.filter($"mean_intensity" < 0.0 || $"mean_intensity" > 255.0).isEmpty)
    // the synthetic text payloads carry no media container: the REAL
    // header parse must classify all of them unknown (hint passthrough)
    assert(frames.filter($"format" =!= "unknown").isEmpty)
    // deterministic: same run twice, same values
    val a = frames.orderBy("doc_id").select("mean_intensity").as[Double].collect()
    val b = Multimodal.decodeFrames(spark, sf0001)
      .orderBy("doc_id").select("mean_intensity").as[Double].collect()
    assert(a.sameElements(b))
  }

  test("media header parse: PNG/JPEG/GIF magic-byte fixtures, truncation-safe") {
    // PNG: signature + IHDR length/type + width=640 height=480 + tail
    def be32(v: Int) = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ "IHDR".getBytes ++ be32(640) ++ be32(480) ++
      Array[Byte](8, 6, 0, 0, 0)
    assert(Multimodal.parseMediaHeader(png) == ("png", 640, 480))
    // JPEG: SOI, APP0 segment (16 bytes), then SOF0 with h=333 w=512
    def be16(v: Int) = Array[Byte]((v >>> 8).toByte, v.toByte)
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte) ++
      (Array[Byte](0xff.toByte, 0xe0.toByte) ++ be16(16) ++ Array.fill[Byte](14)(0)) ++
      (Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(17) ++ Array[Byte](8) ++
        be16(333) ++ be16(512) ++ Array.fill[Byte](10)(0))
    assert(Multimodal.parseMediaHeader(jpeg) == ("jpeg", 512, 333))
    // JPEG with a fill byte (FF FF FF C0 ...) still finds the frame
    val jpegFill = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++
      (Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(17) ++ Array[Byte](8) ++
        be16(10) ++ be16(20) ++ Array.fill[Byte](10)(0))
    assert(Multimodal.parseMediaHeader(jpegFill) == ("jpeg", 20, 10))
    // GIF89a little-endian 320x200
    val gif = "GIF89a".getBytes ++ Array[Byte](0x40, 0x01, 0xc8.toByte, 0x00, 0, 0)
    assert(Multimodal.parseMediaHeader(gif) == ("gif", 320, 200))
    // truncation and garbage degrade to unknown, never throw
    assert(Multimodal.parseMediaHeader(png.take(20)) == ("unknown", -1, -1))
    assert(Multimodal.parseMediaHeader(Array[Byte](0xff.toByte, 0xd8.toByte)) == ("unknown", -1, -1))
    assert(Multimodal.parseMediaHeader("not an image at all".getBytes) == ("unknown", -1, -1))
    assert(Multimodal.parseMediaHeader(Array.empty[Byte]) == ("unknown", -1, -1))
    // JPEG whose entropy stream desyncs before any SOF: unknown
    val jpegBad = Array[Byte](0xff.toByte, 0xd8.toByte, 0x00, 0x12)
    assert(Multimodal.parseMediaHeader(jpegBad) == ("unknown", -1, -1))
    // and the distributed path picks headers up end-to-end
    val df = Seq((1L, png, 9, 9), (2L, jpeg, 9, 9), (3L, "plain".getBytes, 7, 8))
      .toDF("doc_id", "payload", "width_hint", "height_hint")
    val decoded = df.as[(Long, Array[Byte], Int, Int)].mapPartitions { rows =>
      rows.map { case (id, p, w, h) => Multimodal.decodeStub(p, w, h).copy(doc_id = id) }
    }.toDF().orderBy("doc_id")
      .select("doc_id", "format", "width", "height")
      .as[(Long, String, Int, Int)].collect().toSeq
    assert(decoded == Seq((1L, "png", 640, 480), (2L, "jpeg", 512, 333),
      (3L, "unknown", 7, 8)))
  }

  test("sampleChunks: strided frame sampling covers every payload") {
    val chunks = Multimodal.sampleChunks(spark, sf0001).cache()
    assert(chunks.select("doc_id").distinct().count() ==
      graft.ops.Core.documents(spark, sf0001).count())
    assert(chunks.filter($"chunk_idx" < 0).isEmpty)
    assert(chunks.filter(octet_length($"chunk") === 0).isEmpty)
  }

  test("mediaEmbed: fixed-dim features in [0,1), norm consistent") {
    val e = Multimodal.mediaEmbed(spark, sf0001).cache()
    assert(e.count() == graft.ops.Core.documents(spark, sf0001).count())
    (0 until 8).foreach { j =>
      assert(e.filter(col(s"e$j") < 0.0 || col(s"e$j") >= 1.0).isEmpty, s"e$j out of range")
    }
    // norm agrees with a recomputed sum of squares
    val normSq = (0 until 8).map(j => col(s"e$j") * col(s"e$j")).reduceLeft(_ + _)
    assert(e.filter(abs(sqrt(normSq) - $"norm") > 1e-12).isEmpty)
  }

  test("mediaChunks: strided sampling reassembles offsets consistently") {
    val c = Multimodal.mediaChunks(spark, sf0001).cache()
    assert(c.select("doc_id").distinct().count() ==
      graft.ops.Core.documents(spark, sf0001).count())
    assert(c.filter($"n_bytes" <= 0 || $"n_bytes" > 64).isEmpty)
    // chunk_idx dense from 0 per doc
    val bad = c.groupBy("doc_id")
      .agg(min("chunk_idx").as("mn"), max("chunk_idx").as("mx"), count(lit(1)).as("n"))
      .filter($"mn" =!= 0 || $"mx" =!= $"n" - 1)
    assert(bad.isEmpty)
  }

  test("media metadata digests match spark-side sha2 of the payload") {
    val meta = Multimodal.mediaMeta(spark, sf0001)
    val recheck = Multimodal.mediaTable(spark, sf0001)
      .select($"doc_id", sha2($"payload", 256).as("digest2"))
    assert(meta.join(recheck, "doc_id").filter($"digest" =!= $"digest2").isEmpty)
  }
}
