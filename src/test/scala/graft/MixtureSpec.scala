package graft

import org.apache.spark.sql.functions._
import graft.ops.{Core, Mixture, TextDedup}

class MixtureSpec extends SparkSpec {
  import spark.implicits._

  test("source caps: exactly min(capK, n_source) kept per source, ranks are a permutation") {
    val out = Mixture.sourceCaps(spark, sf0001).cache()
    val perSource = out.groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum("kept").as("n_kept"),
        max("src_rank").as("max_rank"),
        countDistinct("src_rank").as("n_ranks"))
      .as[(String, Long, Long, Int, Long)].collect()
    assert(perSource.nonEmpty)
    perSource.foreach { case (src, n, kept, maxRank, nRanks) =>
      assert(kept == math.min(15L, n), s"$src kept $kept of $n")
      // ranks 1..n with no gaps or repeats (the window is a total order)
      assert(maxRank.toLong == n && nRanks == n, s"$src ranks not a permutation")
    }
    out.unpersist()
  }

  test("temperature sample keeps more than hard stratification, less than everything") {
    val temp = Mixture.temperatureSample(spark, sf0001)
      .select("lang", "n_lang", "n_kept").as[(String, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    val hard = TextDedup.stratifiedSample(spark, sf0001)
      .select("lang", "n_kept").as[(String, Long)].collect().toMap
    val nMin = temp.values.map(_._1).min
    temp.foreach { case (lang, (nLang, kept)) =>
      assert(kept <= nLang)
      if (nLang == nMin) assert(kept == nLang, s"smallest lang $lang must keep all")
      // soft flattening admits at least the hard-stratified sample size
      // (rate sqrt(m/n) >= m/n) up to hash-binomial noise on tiny langs
      else assert(kept >= hard(lang) - 2, s"$lang temp $kept < hard ${hard(lang)}")
    }
  }

  test("keep_rate is the exact sqrt ratio (the cross-engine-exact contract)") {
    val rows = Mixture.temperatureSample(spark, sf0001)
      .select("n_lang", "keep_rate").as[(Long, Double)].collect()
    val nMin = rows.map(_._1).min
    rows.foreach { case (n, r) =>
      assert(r == math.sqrt(nMin.toDouble / n.toDouble), s"rate for n=$n")
    }
  }

  test("source similarity: planted near-mirror source ranks above the background") {
    // build a corpus where srcX is a shuffled copy of src0's docs (same
    // shingles, new doc ids) and srcY is unrelated
    val docs = Core.documents(spark, sf0001)
    val base = docs.filter($"source" === "src0")
    val mirror = base.withColumn("doc_id", $"doc_id" + 100000L)
      .withColumn("source", lit("srcX"))
    val planted = docs.unionByName(mirror)
    val sim = Mixture.sourceSimilarityFrom(planted)
      .select("src_a", "src_b", "jaccard_est")
      .as[(String, String, Double)].collect()
    val mirrorEst = sim.collectFirst {
      case ("src0", "srcX", j) => j case ("srcX", "src0", j) => j
    }.get
    val background = sim.collect {
      case (a, b, j) if Set(a, b) != Set("src0", "srcX") => j
    }
    // identical shingle sets -> estimator is exactly 1; background
    // sources share only generator vocabulary-level trigrams
    assert(mirrorEst == 1.0, s"mirror pair estimated $mirrorEst")
    assert(background.forall(_ < mirrorEst),
      s"background max ${background.max} >= mirror $mirrorEst")
  }

  test("bottom-k union estimator is within s.e. bounds on a half-overlap plant") {
    // srcZ copies half of src0's docs: true Jaccard of shingle sets
    // ~0.5 (plus vocabulary background); k=64 gives s.e. ~ 1/8
    val docs = Core.documents(spark, sf0001)
    val base = docs.filter($"source" === "src0")
    val ids = base.select("doc_id").as[Long].collect().sorted
    val half = ids.take(ids.length / 2).toSet
    val partial = base.filter($"doc_id".isin(half.toSeq: _*))
      .withColumn("doc_id", $"doc_id" + 200000L)
      .withColumn("source", lit("srcZ"))
    val planted = docs.filter($"source" === "src0").unionByName(partial)
    val est = Mixture.sourceSimilarityFrom(planted)
      .select("jaccard_est").as[Double].collect().head
    // true J = |half| / |full| over distinct shingle hashes; compute it
    val arr = planted
      .withColumn("toks", split($"text", " "))
      .select($"source",
        explode(array_distinct(graft.functions.token_ngrams($"toks", 3))).as("ng"))
      .select($"source", graft.functions.poly_hash($"ng").as("h")).distinct()
    val a = arr.filter($"source" === "src0").select("h").as[Long].collect().toSet
    val b = arr.filter($"source" === "srcZ").select("h").as[Long].collect().toSet
    val trueJ = a.intersect(b).size.toDouble / a.union(b).size.toDouble
    assert(math.abs(est - trueJ) <= 3.0 / 8.0, s"est $est vs true $trueJ")
  }

  test("source drift: TVD bounded, totals tie out, skew-planted source ranks first") {
    val d = Mixture.sourceDrift(spark, sf0001).cache()
    val docs = graft.ops.Core.documents(spark, sf0001)
    assert(d.count() == docs.select("source").distinct().count())
    assert(d.agg(sum($"n_docs")).as[Long].head() == docs.count())
    assert(d.filter($"tvd_chars" < 0.0 || $"tvd_chars" > 1.0 ||
      $"tvd_lang" < 0.0 || $"tvd_lang" > 1.0).isEmpty, "TVD must be in [0,1]")
    // plant a source concentrated in one extreme length bucket and one
    // language: it must show the LARGEST drift on both axes
    val planted = docs.select($"source", $"lang", $"n_chars").unionByName(
      spark.range(0, 40).select(lit("srcSKEW").as("source"),
        lit("zz").as("lang"), (lit(2000L) + col("id")).as("n_chars")))
    val pd = Mixture.sourceDriftFrom(planted).cache()
    val top = pd.orderBy($"tvd_chars".desc).select("source").as[String].head()
    val topL = pd.orderBy($"tvd_lang".desc).select("source").as[String].head()
    assert(top == "srcSKEW" && topL == "srcSKEW",
      s"planted skew must rank first, got chars=$top lang=$topL")
    // exact hand-computed fixture (the cross-engine-exact contract):
    // A = 2 docs in buckets {0,1} lang en; B = 2 docs in bucket 9 lang zh
    // -> TVD_chars(A) = 1/2*(|1/2-1/4| + |1/2-1/4| + |0-1/2|) = 0.5,
    //    TVD_lang(A) = 1/2*(|1-1/2| + |0-1/2|) = 0.5; symmetric for B
    val tiny = Seq(
      ("A", "en", 50L), ("A", "en", 150L),
      ("B", "zh", 950L), ("B", "zh", 970L)).toDF("source", "lang", "n_chars")
    val tinyOut = Mixture.sourceDriftFrom(tiny)
      .as[(String, Long, Double, Double)].collect().sortBy(_._1)
    assert(tinyOut.toSeq == Seq(("A", 2L, 0.5, 0.5), ("B", 2L, 0.5, 0.5)),
      s"hand-computed TVD mismatch: ${tinyOut.mkString(", ")}")
    d.unpersist(); pd.unpersist()
  }

  test("drift baseline probe: corpus-mirror batch at zero, planted skew near one, batch-only keys counted") {
    val dir = java.nio.file.Files.createTempDirectory("graft_drift_base").toString
    Mixture.writeDriftBaseline(spark, sf0001, dir)
    val docs = graft.ops.Core.documents(spark, sf0001)
    // a batch that IS the corpus under one source label: every batch
    // fraction equals the baseline fraction, so the integer-exact TVD
    // is exactly 0.0 on both axes — no tolerance needed
    val mirror = docs.select(lit("mirror").as("source"), $"lang", $"n_chars")
    // a source concentrated in one alien bucket and language: both its
    // keys are batch-only, so its TVD is exactly 1.0 if (and only if)
    // batch-only keys carry their full mass
    val plant = spark.range(0, 30).select(lit("plant").as("source"),
      lit("zz").as("lang"), (lit(5000L) + col("id")).as("n_chars"))
    val got = Mixture.probeDriftBaseline(spark, mirror.unionByName(plant), dir)
      .as[(String, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) == Seq("mirror", "plant"))
    val Seq((_, nMirror, mc, ml), (_, nPlant, pc, pl)) = got
    assert(nMirror == docs.count() && nPlant == 30L)
    assert(mc == 0.0 && ml == 0.0, s"corpus-mirror batch must sit at TVD 0, got $mc/$ml")
    assert(pc == 1.0 && pl == 1.0, s"fully-alien source must sit at TVD 1, got $pc/$pl")
  }

  test("exact source overlap: mirror pair at 1.0, sketch estimates track the exact values") {
    val docs = Core.documents(spark, sf0001)
    val mirror = docs.filter($"source" === "src0")
      .withColumn("doc_id", $"doc_id" + 100000L)
      .withColumn("source", lit("srcX"))
    val planted = docs.unionByName(mirror)
    val exact = Mixture.sourceOverlapExactFrom(planted)
      .select("src_a", "src_b", "n_a", "n_b", "n_shared", "jaccard")
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(exact.nonEmpty)
    exact.foreach { case (a, b, na, nb, sh, j) =>
      assert(a < b && sh >= 1 && sh <= math.min(na, nb), s"$a/$b counts")
      assert(j > 0.0 && j <= 1.0, s"$a/$b jaccard $j")
    }
    // identical shingle sets -> EXACT jaccard is 1 (the sketch test
    // only got the estimator to 1; this is the ground truth)
    val mirrorJ = exact.collectFirst { case ("src0", "srcX", _, _, _, j) => j }.get
    assert(mirrorJ == 1.0, s"mirror pair exact jaccard $mirrorJ")
    // calibration: every sketch estimate within 3 s.e. (3/8 at k=64)
    // of its exact value — the claim that justifies running the
    // sketch INSTEAD of this query at corpus scale
    val est = Mixture.sourceSimilarityFrom(planted)
      .select("src_a", "src_b", "jaccard_est")
      .as[(String, String, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    val errs = exact.map { case (a, b, _, _, _, j) => math.abs(est((a, b)) - j) }
    assert(errs.forall(_ <= 3.0 / 8.0), s"max sketch error ${errs.max}")
    assert(errs.sum / errs.length <= 0.15, s"mean sketch error ${errs.sum / errs.length}")
  }

  test("KMV distinct: error within bounds, small-source branch exact, estimate positive") {
    val rows = Mixture.distinctShinglesKmv(spark, sf0001)
      .select("source", "n_exact", "kth_hash", "est_kmv", "rel_err")
      .as[(String, Long, Option[Long], Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, nExact, kth, est, relErr) =>
      assert(est > 0.0, s"$src estimate $est")
      assert(relErr == (est - nExact) / nExact.toDouble, s"$src rel_err wiring")
      kth match {
        case Some(h) =>
          assert(nExact >= Mixture.kmvK, s"$src has kth_hash but only $nExact")
          assert(est == 63.0 * 1000003.0 / h.toDouble, s"$src estimator arithmetic")
          // 4 sigma at s.e. ~ 1/sqrt(k-1) ~ 0.126
          assert(math.abs(relErr) <= 0.5, s"$src rel_err $relErr")
        case None =>
          assert(nExact < Mixture.kmvK && est == nExact.toDouble,
            s"$src small-source branch must be exact")
      }
    }
    // exercise the <k branch explicitly: a 1-doc source has few shingles
    val tiny = Seq((999999L, "a b c d e f", "en", "srcTINY", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val t = Mixture.distinctShinglesKmvFrom(tiny)
      .select("n_exact", "kth_hash", "est_kmv").as[(Long, Option[Long], Double)]
      .collect().head
    assert(t._1 == 4L && t._2.isEmpty && t._3 == 4.0, s"tiny source: $t")
  }

  test("vocab growth: buckets contiguous log2, cumulatives tie out to corpus totals") {
    val g = Mixture.vocabGrowth(spark, sf0001)
      .select("bucket", "n_docs", "n_token_occurrences", "n_new_types",
        "cum_tokens", "cum_types")
      .as[(Int, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    val docs = Core.documents(spark, sf0001)
    val nDocs = docs.count()
    // log2 buckets: 0 .. floor(log2(n)) contiguous, so the curve stays
    // a handful of rows at ANY corpus size
    val expectBuckets = (0 to (63 - java.lang.Long.numberOfLeadingZeros(nDocs))).toList
    assert(g.map(_._1).toList == expectBuckets, s"buckets ${g.map(_._1).toList}")
    assert(g.map(_._2).sum == nDocs)
    val totalToks = docs.select(sum(size(split($"text", " ")))).as[Long].head()
    val totalTypes = docs
      .select(explode(split($"text", " ")).as("t")).distinct().count()
    assert(g.last._5 == totalToks, s"final cum_tokens ${g.last._5} != $totalToks")
    assert(g.last._6 == totalTypes, s"final cum_types ${g.last._6} != $totalTypes")
    // cumulative columns are running sums of the per-bucket columns
    val runTok = g.scanLeft(0L)(_ + _._3).tail
    val runTyp = g.scanLeft(0L)(_ + _._4).tail
    assert(g.map(_._5).toSeq == runTok.toSeq && g.map(_._6).toSeq == runTyp.toSeq)
  }

  test("mixture gate: self-baseline reproduces temperature_sample, unknown lang keeps all") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mixgate").toString
    Mixture.writeDriftBaseline(spark, sf0001, dir)
    val docs = Core.documents(spark, sf0001)
    val gated = Mixture.probeMixtureGate(spark, docs, dir).cache()
    assert(gated.count() == docs.count(), "gate must emit a verdict per doc")
    // gating the corpus against its own baseline IS temperatureSample:
    // per-lang kept counts and keep rates must match exactly
    val fromGate = gated.groupBy("lang")
      .agg(max($"keep_rate").as("keep_rate"), sum($"kept").as("n_kept"))
      .as[(String, Double, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val fromTemp = Mixture.temperatureSample(spark, sf0001)
      .select("lang", "keep_rate", "n_kept")
      .as[(String, Double, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(fromGate == fromTemp, s"gate $fromGate != temperature $fromTemp")
    // a language the baseline never saw keeps everything at rate 1.0
    val alien = Seq((777777L, "alien words here now", "zz", "srcA", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val a = Mixture.probeMixtureGate(spark, alien, dir)
      .select("keep_rate", "kept").as[(Double, Int)].collect().head
    assert(a == ((1.0, 1)), s"unknown lang must keep at rate 1.0, got $a")
    gated.unpersist()
  }

  test("streaming mixture gate equals the batch probe, lands idempotently per batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val baseDir = java.nio.file.Files.createTempDirectory("graft_smg_b").toString + "/base"
    val outDir = java.nio.file.Files.createTempDirectory("graft_smg_o").toString + "/out"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_smg_c").toString
    Mixture.writeDriftBaseline(spark, sf0001, baseDir)
    val sample = Core.documents(spark, sf0001).orderBy("doc_id").limit(20)
      .select("doc_id", "text", "lang").as[(Long, String, String)].collect().toSeq
    val batch2 = Seq((888888L, "novel language content", "qq"))
    val src = MemoryStream[(Long, String, String)]
    val q = Mixture.streamingMixtureGate(spark,
      src.toDF().toDF("doc_id", "text", "lang"), baseDir, outDir, ckpt)
    try {
      src.addData(sample: _*)
      q.processAllAvailable()
      src.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(outDir)
    assert(got.count() == 21 && got.select("batch_id").distinct().count() == 2)
    def probeOf(rows: Seq[(Long, String, String)]) =
      Mixture.probeMixtureGate(spark, rows.toDF("doc_id", "text", "lang"), baseDir)
    val expect = probeOf(sample).unionByName(probeOf(batch2))
    val gotRows = got.drop("batch_id")
    assert(gotRows.exceptAll(expect).isEmpty && expect.exceptAll(gotRows).isEmpty,
      "streaming gate rows must equal the per-batch probe outputs")
  }

  test("vocab index probe: self-probe has zero OOV, alien batch hits 1.0, counts tie out") {
    val idxDir = java.nio.file.Files.createTempDirectory("graft_vocab").toString
    Mixture.writeVocabIndex(spark, sf0001, idxDir)
    val docs = Core.documents(spark, sf0001)
    // probing the corpus against its own vocabulary: nothing is new
    val self = Mixture.probeVocabIndex(spark, docs, idxDir)
      .select("source", "n_new_types", "n_new_occurrences", "oov_rate")
      .as[(String, Long, Long, Double)].collect()
    assert(self.nonEmpty)
    self.foreach { case (src, nt, no, r) =>
      assert(nt == 0L && no == 0L && r == 0.0, s"$src self-probe must be in-vocab")
    }
    // a fully-alien batch is 100% OOV
    val alien = Seq((1L, "zyx wvu tsr zyx", "qq", "srcNEW", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val a = Mixture.probeVocabIndex(spark, alien, idxDir)
      .select("n_occurrences", "n_types", "n_new_types", "n_new_occurrences", "oov_rate")
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(a == ((4L, 3L, 3L, 4L, 1.0)), s"alien batch: $a")
    // totals tie out against the corpus token stream
    val total = Mixture.probeVocabIndex(spark, docs, idxDir)
      .agg(sum($"n_occurrences")).as[Long].head()
    val expect = docs.select(sum(size(split($"text", " ")))).as[Long].head()
    assert(total == expect, s"occurrences $total != corpus tokens $expect")
  }

  test("streaming vocab probe equals the batch probe, lands idempotently per batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val idxDir = java.nio.file.Files.createTempDirectory("graft_svp_i").toString + "/idx"
    val outDir = java.nio.file.Files.createTempDirectory("graft_svp_o").toString + "/out"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_svp_c").toString
    Mixture.writeVocabIndex(spark, sf0001, idxDir)
    val sample = Core.documents(spark, sf0001).orderBy("doc_id").limit(15)
      .select("source", "text").as[(String, String)].collect().toSeq
    val batch2 = Seq(("srcNEW", "qqq www eee qqq"))
    val src = MemoryStream[(String, String)]
    val q = Mixture.streamingVocabProbe(spark,
      src.toDF().toDF("source", "text"), idxDir, outDir, ckpt)
    try {
      src.addData(sample: _*)
      q.processAllAvailable()
      src.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(outDir)
    assert(got.select("batch_id").distinct().count() == 2)
    def probeOf(rows: Seq[(String, String)]) =
      Mixture.probeVocabIndex(spark, rows.toDF("source", "text"), idxDir)
    val expect = probeOf(sample).unionByName(probeOf(batch2))
    val gotRows = got.drop("batch_id")
    assert(gotRows.exceptAll(expect).isEmpty && expect.exceptAll(gotRows).isEmpty,
      "streaming vocab rows must equal the per-batch probe outputs")
  }

  test("drift baseline merge over disjoint slices equals the full rebuild") {
    val docs = Core.documents(spark, sf0001)
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString + "/b"
    val (bEven, bOdd, bMerged, bFull) =
      (tmp("graft_be"), tmp("graft_bo"), tmp("graft_bm"), tmp("graft_bf"))
    Mixture.writeDriftBaselineFrom(docs.filter($"doc_id" % 2 === 0), bEven)
    Mixture.writeDriftBaselineFrom(docs.filter($"doc_id" % 2 === 1), bOdd)
    Mixture.mergeDriftBaselines(spark, Seq(bEven, bOdd), bMerged)
    Mixture.writeDriftBaselineFrom(docs, bFull)
    val m = spark.read.parquet(bMerged)
    val f = spark.read.parquet(bFull)
    assert(m.exceptAll(f).isEmpty && f.exceptAll(m).isEmpty,
      "merged drift baseline must equal the full rebuild")
    // and it drives the probe identically
    val viaMerged = Mixture.probeDriftBaseline(spark, docs, bMerged)
    val viaFull = Mixture.probeDriftBaseline(spark, docs, bFull)
    assert(viaMerged.exceptAll(viaFull).isEmpty && viaFull.exceptAll(viaMerged).isEmpty)
  }

  test("vocab index merge over disjoint slices equals the full rebuild") {
    val docs = Core.documents(spark, sf0001)
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString + "/idx"
    val (vEven, vOdd, vMerged, vFull) =
      (tmp("graft_ve"), tmp("graft_vo"), tmp("graft_vm"), tmp("graft_vf"))
    Mixture.writeVocabIndexFrom(docs.filter($"doc_id" % 2 === 0), vEven)
    Mixture.writeVocabIndexFrom(docs.filter($"doc_id" % 2 === 1), vOdd)
    Mixture.mergeVocabIndexes(spark, Seq(vEven, vOdd), vMerged)
    Mixture.writeVocabIndexFrom(docs, vFull)
    val m = spark.read.parquet(vMerged)
    val f = spark.read.parquet(vFull)
    assert(m.exceptAll(f).isEmpty && f.exceptAll(m).isEmpty,
      "merged vocab index must equal the full rebuild (disjoint slices)")
  }

  test("vocab rebuild-forget probe: df mass drops by exactly the takedown carriers") {
    val out = Mixture.vocabRebuildForgetProbe(spark, sf0001)
      .select("tok", "df_before", "df_after", "df_forgotten")
      .as[(String, Long, Long, Long)].collect()
    assert(out.nonEmpty, "full index must be non-empty at sf0.001")
    out.foreach { case (tok, b, a, f) =>
      assert(f == b - a && a <= b && a >= 0, s"$tok: inconsistent df split ($b, $a, $f)")
    }
    // non-vacuity of the FORGET direction: the takedown slice is
    // non-empty, so the rebuild genuinely lost df mass — a rebuild
    // that silently kept the takedown docs would show zero deltas
    // everywhere and fail here (and hash-mismatch against the oracle)
    assert(out.map(_._4).sum > 0, "rebuild must forget df mass corpus-wide")
    // the expected per-token drop, recomputed independently: the
    // number of TAKEDOWN docs carrying the token
    val docs = graft.ops.Core.documents(spark, sf0001)
    val expected = docs.filter($"doc_id" % 10 === 4)
      .select($"doc_id", explode(split($"text", " ")).as("tok")).distinct()
      .groupBy("tok").count()
      .as[(String, Long)].collect().toMap
    out.foreach { case (tok, _, _, f) =>
      assert(f == expected.getOrElse(tok, 0L),
        s"$tok: forgot $f, takedown slice carried ${expected.getOrElse(tok, 0L)}")
    }
  }

  test("epoch realization: copies bracket epochs, source totals realize the plan") {
    val plan = Mixture.mixturePlan(spark, sf0001)
      .select("source", "epochs", "target_tokens")
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val copies = Mixture.epochRealize(spark, sf0001).cache()
    val docs = Core.documents(spark, sf0001)
    assert(copies.count() == docs.count(), "one realization row per document")
    // every copy count is floor(epochs) or floor(epochs)+1 of its source
    copies.select("source", "n_copies").as[(String, Long)].collect()
      .foreach { case (src, n) =>
        val lo = math.floor(plan(src)._1).toLong
        assert(n == lo || n == lo + 1, s"$src copies $n outside [$lo, ${lo + 1}]")
      }
    // realized token mass per source approximates its target: the only
    // slack is the hash-binomial choice of which docs get the extra
    // copy (bounded by the largest single doc's token count)
    val tokensPerDoc = docs
      .select($"doc_id", $"source", size(split($"text", " ")).cast("long").as("n_toks"))
    val realized = copies.join(tokensPerDoc, Seq("doc_id"))
      .groupBy(tokensPerDoc("source"))
      .agg(sum($"n_copies" * $"n_toks").as("realized_tokens"))
      .as[(String, Long)].collect().toMap
    val maxDoc = tokensPerDoc.agg(max($"n_toks")).as[Long].head()
    plan.foreach { case (src, (_, target)) =>
      val got = realized(src).toDouble
      assert(math.abs(got - target) <= 3.0 * maxDoc,
        s"$src realized $got vs target $target (slack ${3.0 * maxDoc})")
    }
    copies.unpersist()
  }

  test("mixture plan: fractions normalize, budget ties out, epochs/rate consistent") {
    val p = Mixture.mixturePlan(spark, sf0001).cache()
    val docs = graft.ops.Core.documents(spark, sf0001)
    assert(p.count() == docs.select("source").distinct().count())
    assert(p.agg(sum($"n_docs")).as[Long].head() == docs.count())
    // both fraction columns are distributions (left-to-right fold makes
    // the target normalizer deterministic, so the sums are clean)
    val (natSum, tgtSum, tgtTokSum) = p.agg(sum($"natural_frac"), sum($"target_frac"),
      sum($"target_tokens")).as[(Double, Double, Double)].head()
    assert(math.abs(natSum - 1.0) < 1e-9, s"natural_frac sums to $natSum")
    assert(math.abs(tgtSum - 1.0) < 1e-9, s"target_frac sums to $tgtSum")
    // the allocation exhausts the budget exactly (up to fp roundoff)
    assert(math.abs(tgtTokSum - Mixture.planBudget.toDouble) < 1e-6,
      s"allocated $tgtTokSum of ${Mixture.planBudget}")
    // per-row consistency: epochs = target_tokens / n_tokens,
    // sample_rate = min(1, epochs)
    val rows = p.as[(String, Long, Long, Double, Double, Double, Double, Double)]
      .collect()
    rows.foreach { case (src, _, nTok, _, _, tgtTok, ep, rate) =>
      assert(math.abs(ep - tgtTok / nTok.toDouble) < 1e-12, s"$src epochs")
      assert(rate == math.min(1.0, ep), s"$src sample_rate")
    }
    // sqrt-flattening: monotone in token mass (rank-preserving), and
    // the EXTREME sources move toward uniform — the largest source's
    // target share shrinks below its natural share, the smallest
    // grows above it. (Deliberately NOT asserted for middle sources:
    // between the arithmetic and sqrt-weighted means a source's
    // target can legitimately exceed both its natural share and
    // uniform.)
    val byTok = rows.sortBy(_._3)
    assert(byTok.map(_._5).zip(byTok.tail.map(_._5)).forall { case (a, b) => a <= b },
      "target_frac must be monotone in n_tokens")
    if (byTok.head._3 != byTok.last._3) {
      assert(byTok.last._5 < byTok.last._4, "largest source must flatten down")
      assert(byTok.head._5 > byTok.head._4, "smallest source must flatten up")
    }
    p.unpersist()
  }
}
