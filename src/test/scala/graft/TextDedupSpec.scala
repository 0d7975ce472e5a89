package graft

import org.apache.spark.sql.functions._
import graft.ops.TextDedup

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  test("lsh candidates cover the high-jaccard pairs (recall of the scale path)") {
    val exact = TextDedup.ngramJaccardPairs(spark, sf0001)
      .filter($"jaccard" >= 0.8).select("doc_a", "doc_b")
    val cand = TextDedup.minhashLshCandidates(spark, sf0001)
    // every >=0.8 pair must be proposed by banding (8 perms, 4 bands of 2:
    // per-band hit prob s^2 = 0.64 -> miss prob (1-0.64)^4 ~ 1.7%; the
    // planted dups in this corpus are all found)
    val missed = exact.join(cand, Seq("doc_a", "doc_b"), "left_anti")
    assert(missed.isEmpty, "LSH banding missed a >=0.8 Jaccard pair")
  }

  test("jaccard is symmetric-free (a<b) and within (0,1]") {
    val p = TextDedup.ngramJaccardPairs(spark, sf0001).cache()
    assert(p.filter($"doc_a" >= $"doc_b").isEmpty)
    assert(p.filter($"jaccard" <= 0.0 || $"jaccard" > 1.0).isEmpty)
  }

  test("exact dedup partitions the corpus (sum of copies = row count)") {
    val d = TextDedup.dedupExact(spark, sf0001)
    val total = d.agg(sum("n_copies")).as[Long].collect()(0)
    assert(total == graft.ops.Core.documents(spark, sf0001).count())
  }

  test("fingerprint is stable and collision-sparse") {
    val fp = TextDedup.docFingerprint(spark, sf0001).cache()
    val n = fp.count()
    val distinct = fp.select("fingerprint").distinct().count()
    assert(distinct > n * 9 / 10) // mod 1000003 on ~500 docs: few collisions
  }

  test("simhash near-dup pairs align with high jaccard pairs") {
    val sim = TextDedup.simhashPairs(spark, sf0001)
    val exact = TextDedup.ngramJaccardPairs(spark, sf0001)
      .filter($"jaccard" >= 0.95).select("doc_a", "doc_b")
    val missed = exact.join(sim, Seq("doc_a", "doc_b"), "left_anti")
    // 32-bit simhash at hamming<=4 catches every >=0.95 Jaccard pair here
    assert(missed.isEmpty, "simhash missed a >=0.95 Jaccard pair")
  }

  test("banded simhash pair search equals the all-pairs scan") {
    val banded = TextDedup.simhashPairsBanded(spark, sf0001)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Int)].collect().toSet
    val allPairs = TextDedup.simhashPairs(spark, sf0001)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Int)].collect().toSet
    assert(banded == allPairs,
      s"pigeonhole banding must be exact: ${allPairs.diff(banded).size} missed, ${banded.diff(allPairs).size} extra")
  }

  test("dataset split partitions the corpus near 80/12/8") {
    val s = TextDedup.datasetSplit(spark, sf0001).cache()
    val total = s.agg(sum("n_docs")).as[Long].collect()(0)
    assert(total == graft.ops.Core.documents(spark, sf0001).count())
    val train = s.filter($"split" === "train").select("n_docs").as[Long].collect()(0)
    val frac = train.toDouble / total.toDouble
    assert(frac > 0.65 && frac < 0.95, s"train fraction $frac far from 0.80")
  }

  test("boilerplate ngrams: top-20, ranked by document frequency") {
    val b = TextDedup.boilerplateNgrams(spark, sf0001).orderBy("rnk").cache()
    assert(b.count() == 20)
    val freqs = b.select("doc_freq").as[Long].collect()
    assert(freqs.zip(freqs.tail).forall { case (a, c) => a >= c }, "doc_freq must be non-increasing by rank")
  }

  test("text metrics: token counts positive, ratios bounded") {
    val t = TextDedup.textTokens(spark, sf0001)
    assert(t.filter($"n_tokens" <= 0).isEmpty)
    val q = TextDedup.textQuality(spark, sf0001)
    assert(q.filter($"unique_ratio" <= 0.0 || $"unique_ratio" > 1.0).isEmpty)
    assert(q.filter($"quality_score" < 0.0 || $"quality_score" > 1.0).isEmpty)
  }
}
