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
