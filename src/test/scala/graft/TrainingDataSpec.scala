package graft

import org.apache.spark.sql.functions._
import graft.ops.{Core, TrainingData}

class TrainingDataSpec extends SparkSpec {
  import spark.implicits._

  test("repetition metrics: modal count matches an explode-groupBy recount") {
    // the sorted-run fold is the map-side O(n log n) form; recount the
    // modal token the slow way (explode + groupBy + max) and compare
    val fast = TrainingData.repetitionMetrics(spark, sf0001)
      .select("doc_id", "top_token_cnt")
    val slow = Core.documents(spark, sf0001)
      .select($"doc_id", explode(split($"text", " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max($"c").cast("int").as("expected"))
    val bad = fast.join(slow, "doc_id")
      .filter($"top_token_cnt" =!= $"expected")
    assert(bad.isEmpty, s"sorted-run modal count diverged: ${bad.count()} docs")
  }

  test("repetition metrics: fractions bounded, gate consistent with its inputs") {
    val m = TrainingData.repetitionMetrics(spark, sf0001).cache()
    assert(m.filter($"top_token_frac" <= 0.0 || $"top_token_frac" > 1.0).isEmpty)
    assert(m.filter($"dup_bigram_frac" < 0.0 || $"dup_bigram_frac" >= 1.0).isEmpty)
    val inconsistent = m.filter(
      ($"gopher_ok" === 1) =!= ($"top_token_frac" <= 0.2 && $"dup_bigram_frac" <= 0.2 &&
        $"dup_trigram_frac" <= 0.18 && $"n_tokens".between(8, 100000)))
    assert(inconsistent.isEmpty, "gopher_ok disagrees with its component thresholds")
  }

  test("dup spans: every doc present, span counts match token counts") {
    val d = TrainingData.dupSpans(spark, sf0001).cache()
    val docs = Core.documents(spark, sf0001)
    assert(d.count() == docs.count(), "short docs must not drop out")
    // n_spans = floor(n_tokens / 16) for every doc (including 0)
    val expected = docs.select($"doc_id",
      (size(split($"text", " ")) / 16).cast("long").as("exp_spans"))
    val bad = d.join(expected, "doc_id").filter($"n_spans" =!= $"exp_spans")
    assert(bad.isEmpty, "span count must be floor(n_tokens/16)")
    assert(d.filter($"n_dup_spans" > $"n_spans").isEmpty)
  }

  test("dup spans: exact duplicate docs have all spans flagged") {
    // dedupExact's multi-copy groups share full text -> every span of
    // every copy collides; such docs must report dup_span_frac = 1
    // (when they have at least one span)
    val copies = graft.ops.TextDedup.dedupExact(spark, sf0001)
      .filter($"n_copies" > 1).select($"keep_id".as("doc_id"))
    val d = TrainingData.dupSpans(spark, sf0001)
    val unflagged = d.join(copies, "doc_id")
      .filter($"n_spans" > 0 && $"dup_span_frac" < 1.0)
    assert(unflagged.isEmpty, "a verbatim-duplicated doc has an unflagged span")
  }

  test("cdc chunks: chunks tile each doc, verbatim copies fully flagged") {
    val c = TrainingData.cdcChunks(spark, sf0001).cache()
    val docs = Core.documents(spark, sf0001)
    assert(c.count() == docs.count(), "every doc must produce >= 1 chunk")
    assert(c.filter($"n_chunks" < 1 || $"n_dup_chunks" > $"n_chunks").isEmpty)
    // chunk token spans tile the doc exactly: per-doc token total from
    // the chunk stream equals the doc's token count (recount via the
    // chunk boundaries is implicit in hashing the joined text; here we
    // assert the multi-copy invariant instead)
    val copies = graft.ops.TextDedup.dedupExact(spark, sf0001)
      .filter($"n_copies" > 1).select($"keep_id".as("doc_id"))
    val unflagged = c.join(copies, "doc_id").filter($"dup_chunk_frac" < 1.0)
    assert(unflagged.isEmpty, "a verbatim-duplicated doc has an unflagged chunk")
  }

  test("cdc chunks: native kernel equals the interpreted HOF chunk build") {
    val docs = Core.documents(spark, sf0001)
    val fast = TrainingData.cdcChunkStream(docs)
      .as[(Long, Int, Long)].collect().toSet
    val slow = TrainingData.cdcChunkStreamHof(docs)
      .as[(Long, Int, Long)].collect().toSet
    assert(fast == slow,
      s"kernel/HOF divergence: ${slow.diff(fast).size} missing, ${fast.diff(slow).size} extra")
  }

  test("cdc chunks: boundaries survive a prefix insertion (vs fixed windows)") {
    // the CDC property: prepending tokens shifts every fixed window
    // but only the chunks up to the first content boundary — all later
    // chunks still collide with the original
    val txt = Core.documents(spark, sf0001)
      .orderBy($"doc_id").limit(1).select($"text").as[String].collect()(0)
    val pair = Seq((0L, txt), (1L, "zzz qqq " + txt)).toDF("doc_id", "text")
    val hs = TrainingData.cdcChunkStream(pair)
      .select($"doc_id", $"h").as[(Long, Long)].collect()
    val orig = hs.filter(_._1 == 0L).map(_._2)
    val shifted = hs.filter(_._1 == 1L).map(_._2).toSet
    val surviving = orig.count(shifted.contains)
    assert(orig.length >= 3, s"doc too short for the invariance check (${orig.length} chunks)")
    assert(surviving >= orig.length - 1,
      s"CDC must preserve all chunks after the first boundary: $surviving/${orig.length} survived")
  }

  test("winnowing: every doc kept, exact copies share all fingerprints") {
    val wf = TrainingData.winnowFingerprints(spark, sf0001).cache()
    val docs = Core.documents(spark, sf0001)
    assert(wf.count() == docs.count())
    assert(wf.filter($"n_shared_fps" > $"n_fingerprints").isEmpty)
    val copies = graft.ops.TextDedup.dedupExact(spark, sf0001)
      .filter($"n_copies" > 1).select($"keep_id".as("doc_id"))
    val unflagged = wf.join(copies, "doc_id")
      .filter($"n_fingerprints" > 0 && $"shared_frac" < 1.0)
    assert(unflagged.isEmpty, "a verbatim copy has an unshared fingerprint")
  }

  test("winnowing guarantee: a planted >= w+2 token overlap shares a fingerprint") {
    // MOSS guarantee: a shared token run of >= winnowW + 2 tokens (one
    // full window of 3-gram hashes) must yield >= 1 shared fingerprint
    // even though the copy sits at a different offset in unrelated text
    val run = "alpha beta gamma delta epsilon zeta eta theta" // 8 tokens > 4+2
    val a = "one two three " + run + " four five six"
    val b = "p q r s t u v w x y z " + run
    val pair = Seq((0L, a), (1L, b)).toDF("doc_id", "text")
    val fps = TrainingData.winnowSelect(pair)
      .as[(Long, Long)].collect()
    val fa = fps.filter(_._1 == 0L).map(_._2).toSet
    val fb = fps.filter(_._1 == 1L).map(_._2).toSet
    assert(fa.intersect(fb).nonEmpty,
      s"planted overlap produced no shared fingerprint (|a|=${fa.size}, |b|=${fb.size})")
  }

  test("bpe pairs: counts match a substring recount, pairs are 2 chars") {
    val top = TrainingData.bpePairs(spark, sf0001).cache()
    assert(top.filter(length($"pair") =!= 2).isEmpty)
    // independent recount: posexplode each token's characters, join
    // adjacent positions instead of slicing inside a lambda
    val chars = Core.documents(spark, sf0001)
      .select(explode(split($"text", " ")).as("tok"))
      .withColumn("tid", monotonically_increasing_id())
      .select($"tid", posexplode(split($"tok", "")))
      .toDF("tid", "pos", "ch")
    val slow = chars.as("a")
      .join(chars.as("b"), $"a.tid" === $"b.tid" && $"a.pos" + 1 === $"b.pos")
      .select(concat($"a.ch", $"b.ch").as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("expected"))
    val bad = top.join(slow, "pair").filter($"n_occurrences" =!= $"expected")
    assert(bad.isEmpty, "bpe pair count diverged from the positional recount")
  }

  test("seq packing: streaming cursor form equals the batch window form") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // 20 docs over 8 shards, fed in doc_id order across TWO micro-batches
    // (the equality precondition: per-shard arrival order = doc_id order)
    val texts = (0L until 20L).map(i => (i, Seq.fill(3 + (i % 5).toInt)("w").mkString(" ")))
    val src = MemoryStream[(Long, String)]
    val packed = graft.streaming.StreamingPipeline
      .streamingSeqPacking(src.toDF().toDF("doc_id", "text"))
    val q = packed.writeStream.format("memory").queryName("pack_out")
      .outputMode("append").start()
    try {
      src.addData(texts.take(10): _*)
      q.processAllAvailable()
      src.addData(texts.drop(10): _*)
      q.processAllAvailable()
      val got = spark.table("pack_out")
        .select("doc_id", "shard", "n_tokens", "seq_first", "seq_last", "seq_offset")
        .as[(Long, Long, Int, Long, Long, Long)].collect().toSet
      val batch = TrainingData.seqPackingFrom(texts.toDF("doc_id", "text"))
        .as[(Long, Long, Int, Long, Long, Long)].collect().toSet
      assert(got == batch,
        s"streaming/batch packing divergence: ${batch.diff(got).size} missing, ${got.diff(batch).size} extra")
    } finally q.stop()
  }

  test("lm doc score: probabilities bounded, trigram counts exact, short docs unscoreable not dropped") {
    val s = TrainingData.lmDocScore(spark, sf0001).cache()
    val docs = Core.documents(spark, sf0001)
    assert(s.count() == docs.count(), "every document must appear, scoreable or not")
    // qp quantizes DOWN, so 0 < avg_p <= 1 for any scoreable doc
    assert(s.filter($"n_trigrams" > 0 &&
      ($"avg_p" <= 0.0 || $"avg_p" > 1.0)).isEmpty)
    assert(s.filter($"n_trigrams" === 0 && $"avg_p".isNotNull).isEmpty,
      "unscoreable docs carry an explicit NULL score")
    // n_trigrams is exactly tokens - 2 for docs with >= 3 tokens
    val bad = s.join(docs.select($"doc_id",
        size(split($"text", " ")).as("nt")), "doc_id")
      .filter(($"nt" >= 3 && $"n_trigrams" =!= $"nt" - 2) ||
        ($"nt" < 3 && $"n_trigrams" =!= 0))
    assert(bad.isEmpty, "trigram counts must match token counts")
    // the score must actually discriminate (a constant score would
    // pass the bounds above but carry no curation signal)
    val range = s.filter($"avg_p".isNotNull)
      .agg(max($"avg_p"), min($"avg_p")).as[(Double, Double)].collect()(0)
    assert(range._1 > range._2, "score must discriminate documents")
    s.unpersist()
  }

  test("iterative BPE: greedy non-overlapping merges, K rounds, deterministic ties") {
    def vocab(text: String, k: Int): Map[String, Long] =
      TrainingData.bpeVocabFrom(Seq((1L, text)).toDF("doc_id", "text"), k)
        .as[(String, Long)].collect().toMap
    // even run: [a,a,a,a] must fold to [aa,aa] (non-overlap), odd run
    // to [aa,a]; two rounds then merge aa+aa
    assert(vocab("aaaa aaaa aa aaa", 1) ==
      Map("aa" -> 6L, "a" -> 1L), "round 1 merges (a,a) greedily")
    assert(vocab("aaaa aaaa aa aaa", 2) ==
      Map("aaaa" -> 2L, "aa" -> 2L, "a" -> 1L), "round 2 merges (aa,aa)")
    // tie-breaking: (l,o) and (o,w) both appear 3x; lexicographic pair
    // order picks (l,o) first — then the merge cascade rebuilds words
    assert(vocab("low low lower", 4) == Map("low" -> 2L, "lower" -> 1L),
      "4 deterministic rounds rebuild low/lower")
    // K larger than available merges: fold becomes the identity once
    // no pair remains (the left-join-null path)
    assert(vocab("ab ab", 5) == Map("ab" -> 2L))
  }

  test("bpe token ids: dense frequency-ranked ids, sequences replay the merges in order") {
    // "ab ab b" with 1 merge round: (a,b) wins with weight 2 ->
    // word "ab" encodes as the single symbol ab, "b" stays b.
    // Vocabulary: ab x2, b x1 -> ids ab=0, b=1 (occurrences desc).
    // Document order: ab ab b -> [0, 0, 1].
    val seqs = TrainingData.bpeTokenIdSeqsFrom(
      Seq((1L, "ab ab b")).toDF("doc_id", "text"), rounds = 1)
      .as[(Long, Int, Seq[Int])].collect()
      .map { case (d, n, ids) => d -> ((n, ids)) }.toMap
    assert(seqs(1L) == ((3, Seq(0, 0, 1))),
      s"expected [0,0,1] for 'ab ab b' after one (a,b) merge, got $seqs")
    // corpus-level invariants at sf0.001: ids are DENSE 0..V-1 over
    // the vocabulary, and total sequence mass equals encode's token
    // mass (same merge table, so the two must agree token-for-token)
    val corpus = TrainingData.bpeTokenIdSeqs(spark, sf0001).cache()
    val ids = corpus.select(explode($"token_ids").as("id")).cache()
    val v = TrainingData.bpeVocab(spark, sf0001).count()
    assert(ids.select(countDistinct($"id")).as[Long].collect()(0) == v)
    assert(ids.agg(max($"id")).as[Int].collect()(0).toLong == v - 1,
      "ids must be dense 0..V-1")
    val seqMass = corpus.agg(sum($"n_tokens")).as[Long].collect()(0)
    val encMass = TrainingData.bpeEncode(spark, sf0001)
      .agg(sum($"n_bpe_tokens")).as[Long].collect()(0)
    assert(seqMass == encMass,
      s"sequence mass $seqMass must equal encode mass $encMass")
    ids.unpersist(); corpus.unpersist()
  }

  test("packed token ids: shard streams reconstruct the per-doc sequences exactly") {
    val L = 256 // TrainingData.seqLen
    val packed = TrainingData.packedTokenIds(spark, sf0001)
      .as[(Long, Long, Long, String)].collect()
    // every sequence is full except possibly each shard's last
    val lastSeq = packed.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    packed.foreach { case (shard, seq, n, ids) =>
      assert(ids.split(",").length == n, s"payload length != token_count at ($shard,$seq)")
      if (seq != lastSeq(shard))
        assert(n == L, s"non-tail sequence ($shard,$seq) has $n != $L ids")
    }
    // concatenating a shard's sequences in seq_id order must equal
    // concatenating its docs' id sequences in doc_id order — the
    // packing is a pure re-chunking of the token stream
    val fromPacked = packed.groupBy(_._1).view.mapValues(
      _.sortBy(_._2).flatMap(_._4.split(",")).toSeq).toMap
    val fromDocs = TrainingData.bpeTokenIdSeqs(spark, sf0001)
      .as[(Long, Int, Seq[Int])].collect()
      .groupBy(_._1 % 8).view.mapValues(
        _.sortBy(_._1).flatMap(_._3.map(_.toString)).toSeq).toMap
    assert(fromPacked.keySet == fromDocs.keySet)
    fromDocs.keySet.foreach { sh =>
      assert(fromPacked(sh) == fromDocs(sh), s"shard $sh stream mismatch")
    }
  }

  test("bpe encode: corpus token mass equals the vocabulary mass, compression bounded") {
    val enc = TrainingData.bpeEncode(spark, sf0001).cache()
    // conservation: every encoded word symbol is counted once in the
    // vocabulary occurrence table and once in some document
    val encMass = enc.agg(sum($"n_bpe_tokens")).as[Long].collect()(0)
    val vocabMass = TrainingData.bpeVocab(spark, sf0001)
      .agg(sum($"n_occurrences")).as[Long].collect()(0)
    assert(encMass == vocabMass,
      s"encode mass $encMass must equal vocab mass $vocabMass")
    // merges only ever shrink: words <= bpe tokens <= chars
    assert(enc.filter($"n_bpe_tokens" < $"n_words").isEmpty)
    assert(enc.filter($"tokens_per_char" <= 0.0 || $"tokens_per_char" > 1.0).isEmpty)
    // 8 rounds on this corpus must actually compress something
    assert(enc.filter($"tokens_per_char" < 1.0).count() > 0,
      "at least one document must benefit from the merges")
    enc.unpersist()
  }

  test("rag chunks: every token covered, overlap exact, reconstruction round-trips") {
    val ch = TrainingData.ragChunks(spark, sf0001).cache()
    val docs = Core.documents(spark, sf0001)
      .select($"doc_id", size(split($"text", " ")).as("n"))
    // every doc chunks; chunk starts advance by the stride; the last
    // chunk reaches the final token (total coverage, no drop)
    val byDoc = ch.groupBy($"doc_id").agg(
      count(lit(1)).as("k"), max($"first_tok" + $"n_toks" - 1).as("last_covered"),
      min($"first_tok").as("first_start"))
    val j = byDoc.join(docs, "doc_id")
    assert(j.count() == docs.count())
    assert(j.filter($"first_start" =!= 1 || $"last_covered" =!= $"n").isEmpty,
      "chunks must cover token 1 through n")
    assert(ch.filter($"first_tok" =!= $"chunk_idx" * 48 + 1).isEmpty,
      "starts advance by exactly the stride")
    // full chunks are 64 tokens; chunk_text token count equals n_toks
    assert(ch.filter(size(split($"chunk_text", " ")) =!= $"n_toks").isEmpty)
    // consecutive chunks overlap by exactly 16 tokens when both full
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"chunk_idx")
    val overl = ch.withColumn("prev_end", lag($"first_tok" + $"n_toks" - 1, 1).over(w))
      .withColumn("prev_len", lag($"n_toks", 1).over(w))
      .filter($"prev_end".isNotNull && $"n_toks" === 64 && $"prev_len" === 64 &&
        $"prev_end" - $"first_tok" + 1 =!= 16)
    assert(overl.isEmpty, "full consecutive chunks overlap by exactly 16")
    ch.unpersist()
  }

  test("packed sequences: spans tile each sequence exactly, tails short, rest full") {
    val ps = TrainingData.packedSequences(spark, sf0001).cache()
    val L = 256L
    // every sequence except each shard's LAST is exactly L tokens
    val lastSeq = ps.groupBy($"shard").agg(max($"seq_id").as("last_seq"))
    val nonTail = ps.join(lastSeq, "shard").filter($"seq_id" =!= $"last_seq")
    assert(nonTail.filter($"token_count" =!= L).isEmpty,
      "every non-tail sequence must be packed to exactly seqLen tokens")
    assert(ps.filter($"token_count" > L || $"token_count" <= 0).isEmpty)
    // spans tile contiguously: sorted (start, len) pairs chain 0 -> token_count
    val bad = ps.select($"shard", $"seq_id", $"token_count",
        split($"doc_spans", ",").as("spans"))
      .filter(expr("""
        exists(sequence(1, size(spans)), i ->
          CAST(split(element_at(spans, i), ':')[1] AS BIGINT) !=
            aggregate(slice(spans, 1, i - 1), 0L,
              (acc, s) -> acc + CAST(split(s, ':')[2] AS BIGINT)))
        OR aggregate(spans, 0L, (acc, s) -> acc + CAST(split(s, ':')[2] AS BIGINT))
           != token_count"""))
    assert(bad.isEmpty, "doc spans must tile each sequence gaplessly")
    // consistency with the coordinate query: a doc appears in exactly
    // the sequences seq_first..seq_last claims
    val fromSpans = ps.select($"shard", $"seq_id", explode(split($"doc_spans", ",")).as("s"))
      .select($"shard", $"seq_id", split($"s", ":")(0).cast("long").as("doc_id"))
    val fromCoords = TrainingData.seqPacking(spark, sf0001)
      .select($"doc_id", $"shard", explode(expr("sequence(seq_first, seq_last)")).as("seq_id"))
      .select($"shard", $"seq_id", $"doc_id")
    assert(fromSpans.exceptAll(fromCoords).isEmpty && fromCoords.exceptAll(fromSpans).isEmpty,
      "materialized spans must agree with the coordinate query")
    ps.unpersist()
  }

  test("seq packing: per-shard token stream is gapless and ordered") {
    val p = TrainingData.seqPacking(spark, sf0001).cache()
    // reconstruct each shard's stream: sequences advance monotonically
    // with doc_id, offsets stay within [0, L), and the packed token
    // total equals the corpus total
    assert(p.filter($"seq_offset" < 0 || $"seq_offset" >= 256).isEmpty)
    assert(p.filter($"seq_last" < $"seq_first").isEmpty)
    val totTokens = p.agg(sum($"n_tokens")).as[Long].collect()(0)
    val expTokens = Core.documents(spark, sf0001)
      .agg(sum(size(split($"text", " ")))).as[Long].collect()(0)
    assert(totTokens == expTokens, "packing must conserve every token")
    // a doc starts exactly where the previous doc in its shard ended
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"shard").orderBy($"doc_id")
    val chained = p.withColumn("prev_end",
        lag($"seq_last" * 256 + ($"seq_offset" + $"n_tokens" - 1) % 256 + 1, 1, 0).over(w))
      .filter($"seq_first" * 256 + $"seq_offset" =!= $"prev_end")
    assert(chained.isEmpty, "gap or overlap in a shard's packed stream")
  }

  test("ngram lm: p_mle is a conditional probability with exact-count support") {
    val lm = TrainingData.ngramLm(spark, sf0001).cache()
    assert(lm.count() == 50)
    assert(lm.filter($"p_mle" <= 0.0 || $"p_mle" > 1.0).isEmpty,
      "MLE must lie in (0, 1]")
    assert(lm.filter($"c3" > $"c2_prefix").isEmpty,
      "a trigram cannot outnumber its own prefix bigram")
    // spot-check one row against direct recounts of the raw corpus
    val (tri, c3, c2) = lm.select("trigram", "c3", "c2_prefix")
      .as[(String, Long, Long)].collect().head
    val toksCol = split($"text", " ")
    val base = Core.documents(spark, sf0001).select(toksCol.as("toks"))
    val c3Direct = base
      .select(explode(graft.functions.token_ngrams($"toks", 3)).as("t"))
      .filter($"t" === tri).count()
    val prefix = tri.split(" ").take(2).mkString(" ")
    val c2Direct = base
      .select(explode(graft.functions.token_ngrams($"toks", 2)).as("b"))
      .filter($"b" === prefix).count()
    assert(c3 == c3Direct && c2 == c2Direct, s"counts for '$tri': $c3/$c3Direct $c2/$c2Direct")
    lm.unpersist()
  }
}
