package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.PolyHash

/** ScalaCheck-generator-driven properties (SURVEY §5.2(3)) for the
  * pure kernels plus DataFrame-level invariants over generated frames.
  * Deterministic: fixed seeds, explicit sampling. */
class PropertySpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("poly_hash stays in [0, P) and matches a reference fold for any string") {
    samples(Gen.asciiPrintableStr, 200).foreach { s =>
      val h = PolyHash.hash(UTF8String.fromString(s))
      assert(h >= 0 && h < PolyHash.P)
      val ref = s.foldLeft(0L)((acc, c) => (acc * 31 + c) % PolyHash.P)
      assert(h == ref, s"mismatch for ${s.take(40)}")
    }
  }

  test("char_ngrams matches a pure-Scala sliding window for any string, incl. non-ASCII") {
    // pieces include 2-, 3-, and 4-byte UTF-8 code points (the last is
    // a supplementary-plane emoji — two UTF-16 chars, ONE code point)
    val pieceGen = Gen.oneOf(
      Gen.asciiPrintableChar.map(_.toString),
      Gen.oneOf("é", "ß", "中", "文", new String(Character.toChars(0x1F600))))
    val gen = Gen.oneOf(Gen.asciiPrintableStr, Gen.listOf(pieceGen).map(_.mkString))
    samples(gen, 200).foreach { s =>
      val got = graft.functions.CharNgrams
        .ngrams(UTF8String.fromString(s), 2)
      val gotStrs = (0 until got.numElements()).map(got.getUTF8String(_).toString)
      // sliding on code points, not UTF-16 chars — supplementary-plane
      // code points are single "characters" to SQL substr
      val cps = s.codePoints().toArray.toSeq
      val ref = if (cps.length < 2) Seq()
        else cps.sliding(2).map(w => new String(w.toArray, 0, 2)).toSeq
      assert(gotStrs == ref, s"mismatch for ${s.take(40)}")
    }
  }

  private def mkBars(closes: Seq[Double], spread: Double) =
    closes.zipWithIndex.map { case (c, i) =>
      (java.sql.Timestamp.valueOf(f"2024-01-01 ${i * 5 / 60}%02d:${i * 5 % 60}%02d:00"),
        c, c + spread, c - spread, c, 1L)
    }.toDF("bucket", "open", "high", "low", "close", "volume")

  test("stoch in [0,1] whenever the window has range, for generated bar series") {
    samples(Gen.listOfN(30, Gen.choose(1.0, 500.0)), 8).foreach { closes =>
      val bars = mkBars(closes.map(c => math.rint(c * 100) / 100), 1.0)
      val st = graft.ops.Indicators.withIndicators(bars)
        .select("stoch").as[java.lang.Double].collect()
      assert(st.forall(v => v == null || (v >= 0.0 && v <= 1.0)))
    }
  }

  test("bollinger identity: upper_bb_dist + lower_bb_dist = 4*std >= 0") {
    samples(Gen.listOfN(25, Gen.choose(1.0, 500.0)), 8).foreach { closes =>
      val bars = mkBars(closes.map(c => math.rint(c * 100) / 100), 0.0)
      val s = graft.ops.Indicators.withIndicators(bars)
        .select($"upper_bb_dist" + $"lower_bb_dist").as[Double].collect()
      assert(s.forall(_ >= -1e-9))
    }
  }

  test("token_ngrams / simhash_pack / min_hash_sig match pure-Scala references on generated docs") {
    import graft.functions.{token_ngrams, simhash_pack, min_hash_sig}
    val mixes = Seq((131L, 7L), (151L, 19L))
    val perms = Seq((131L, 7L), (137L, 11L), (139L, 13L), (149L, 17L))
    def refHash(s: String): Long = PolyHash.hash(UTF8String.fromString(s))
    def refNgrams(toks: Seq[String]): Seq[String] =
      if (toks.size < 3) Seq.empty else toks.sliding(3).map(_.mkString(" ")).toSeq
    def refSimhash(sh: Seq[String]): Long = {
      var packed = 0L
      for (((a, b), m) <- mixes.zipWithIndex; bit <- 0 until 16) {
        val ones = sh.count(s => ((((refHash(s) * a + b) % PolyHash.P) >>> bit) & 1L) == 1L)
        if (2L * ones > sh.size) packed |= 1L << (m * 16 + bit)
      }
      packed
    }
    def refMinhashBands(sh: Seq[String]): Seq[Long] = {
      val mins = perms.map { case (a, b) => sh.map(s => (refHash(s) * a + b) % PolyHash.P).min }
      mins.grouped(2).map(g => g(0) * PolyHash.P + g(1)).toSeq
    }
    // token alphabet excludes spaces (the tokenizer's delimiter)
    val tokGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val docGen = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, tokGen))
    val docs = samples(docGen, 120)
    val got = docs.map(_.toArray).toSeq.toDF("toks")
      .select(
        token_ngrams($"toks", 3).as("ng"),
        simhash_pack(token_ngrams($"toks", 3), mixes, 16).as("sh"),
        min_hash_sig(token_ngrams($"toks", 3), perms, 2).as("mh"))
      .collect()
    docs.zip(got).foreach { case (toks, row) =>
      val ng = refNgrams(toks)
      assert(row.getSeq[String](0) == ng, s"ngrams mismatch for $toks")
      if (ng.isEmpty) {
        assert(row.isNullAt(1) && row.isNullAt(2), s"empty shingles must be null for $toks")
      } else {
        assert(row.getLong(1) == refSimhash(ng), s"simhash mismatch for $toks")
        assert(row.getSeq[Long](2) == refMinhashBands(ng), s"minhash mismatch for $toks")
      }
    }
  }

  test("cdc_chunk_hashes matches a pure-Scala reference and tiles every token") {
    import graft.functions.cdc_chunk_hashes
    def refHash(s: String): Long = PolyHash.hash(UTF8String.fromString(s))
    def refChunks(toks: Seq[String], m: Int): Seq[Long] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      var start = 0
      toks.zipWithIndex.foreach { case (t, i) =>
        if (refHash(t) % m == 0) {
          out += refHash(toks.slice(start, i + 1).mkString(" "))
          start = i + 1
        }
      }
      if (start < toks.size) out += refHash(toks.drop(start).mkString(" "))
      out.toSeq
    }
    val tokGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    // small modulus 2 makes boundary-at-last-token and consecutive
    // boundaries common; include the empty doc
    val docGen = Gen.choose(0, 15).flatMap(n => Gen.listOfN(n, tokGen))
    val docs = samples(docGen, 150)
    val got = docs.map(_.toArray).toSeq.toDF("toks")
      .select(cdc_chunk_hashes($"toks", 2).as("c2"),
        cdc_chunk_hashes($"toks", 8).as("c8"))
      .collect()
    docs.zip(got).foreach { case (toks, row) =>
      assert(row.getSeq[Long](0) == refChunks(toks, 2), s"m=2 mismatch for $toks")
      assert(row.getSeq[Long](1) == refChunks(toks, 8), s"m=8 mismatch for $toks")
      // every doc with tokens yields >= 1 chunk; empty docs yield none
      assert(row.getSeq[Long](0).nonEmpty == toks.nonEmpty)
    }
  }

  test("components: local union-find equals the distributed loop on generated graphs") {
    // r15: the size-gated driver-local path must be INDISTINGUISHABLE
    // from the distributed min-label loop on any edge list, not just
    // the four hand-shaped graphs ComponentsSpec pins. Generated
    // graphs: random edges over a sparse id space (forcing multi-node
    // components, singles-with-self-loops, and id gaps), including
    // duplicate and reversed edges. Reference: a pure-Scala BFS over
    // the adjacency map — independent of BOTH engine paths.
    val edgeGen = for {
      n <- Gen.choose(2, 60)           // id space
      m <- Gen.choose(1, 120)          // edge count
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong)
        b <- Gen.choose(0L, n.toLong)
      } yield (a, b))
    } yield es
    samples(edgeGen, 12).zipWithIndex.foreach { case (es, i) =>
      val df = es.toDF("a", "b")
      val (local, lRounds) =
        graft.ops.Components.clusterPairsCounted(df, "a", "b", "node_id")
      assert(lRounds == 0, s"graph $i must take the local path")
      val (dist, dRounds) =
        graft.ops.Components.clusterPairsCounted(df, "a", "b", "node_id", None, 0L)
      assert(dRounds > 0, s"graph $i must loop with the gate off")
      def snap(x: org.apache.spark.sql.DataFrame) = x.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
        .sorted.toSeq
      val (l, d) = (snap(local), snap(dist))
      assert(l == d, s"graph $i: local vs distributed diverged\n$es")
      // independent reference: BFS components, min-member election
      val adj = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
      es.foreach { case (a, b) =>
        adj.getOrElseUpdate(a, scala.collection.mutable.Set(a)).add(b)
        adj.getOrElseUpdate(b, scala.collection.mutable.Set(b)).add(a)
      }
      val seen = scala.collection.mutable.Set.empty[Long]
      val ref = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Boolean)]
      adj.keys.toSeq.sorted.foreach { start =>
        if (!seen.contains(start)) {
          val comp = scala.collection.mutable.Set(start)
          val queue = scala.collection.mutable.Queue(start)
          while (queue.nonEmpty) {
            adj(queue.dequeue()).foreach(nb =>
              if (comp.add(nb)) queue.enqueue(nb))
          }
          seen ++= comp
          val hub = comp.min
          comp.foreach(id => ref += ((id, hub, comp.size.toLong, id == hub)))
        }
      }
      assert(l == ref.sorted.toSeq, s"graph $i: engine vs BFS reference diverged\n$es")
    }
  }

  test("min-max normalization maps into [0,1] under the reference epsilon bump") {
    samples(Gen.nonEmptyListOf(Gen.choose(-1000.0, 1000.0)), 50).foreach { xs =>
      val mn = xs.min
      val mxRaw = xs.max
      // the reference epsilon bump (sql_pytorch_dataloader.py:108-113)
      val mx = if (mn == mxRaw) { if (mxRaw != 0.0) mxRaw + mxRaw * 0.001 else 0.001 } else mxRaw
      val norm = xs.map(x => (x - mn) / (mx - mn))
      // a negative degenerate max bumps downward: range stays nonzero either way
      assert(mx != mn)
      if (mx > mn) assert(norm.forall(v => v >= -1e-12 && v <= 1.0 + 1e-12))
    }
  }
}
