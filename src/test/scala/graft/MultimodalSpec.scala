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
      Seq("doc_id", "width", "height", "n_bytes", "mean_intensity"))
    assert(frames.filter($"n_bytes" <= 0).isEmpty)
    assert(frames.filter($"mean_intensity" < 0.0 || $"mean_intensity" > 255.0).isEmpty)
    // deterministic: same run twice, same values
    val a = frames.orderBy("doc_id").select("mean_intensity").as[Double].collect()
    val b = Multimodal.decodeFrames(spark, sf0001)
      .orderBy("doc_id").select("mean_intensity").as[Double].collect()
    assert(a.sameElements(b))
  }

  test("sampleChunks: strided frame sampling covers every payload") {
    val chunks = Multimodal.sampleChunks(spark, sf0001).cache()
    assert(chunks.select("doc_id").distinct().count() ==
      graft.ops.Core.documents(spark, sf0001).count())
    assert(chunks.filter($"chunk_idx" < 0).isEmpty)
    assert(chunks.filter(octet_length($"chunk") === 0).isEmpty)
  }

  test("media metadata digests match spark-side sha2 of the payload") {
    val meta = Multimodal.mediaMeta(spark, sf0001)
    val recheck = Multimodal.mediaTable(spark, sf0001)
      .select($"doc_id", sha2($"payload", 256).as("digest2"))
    assert(meta.join(recheck, "doc_id").filter($"digest" =!= $"digest2").isEmpty)
  }
}
