package graft

import org.apache.spark.sql.functions._
import graft.functions.{char_ngrams, dot_product, poly_hash, PolyHash}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions: Column API, SQL registration, and
  * codegen/interpreted agreement. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("poly_hash: Column API, SQL registration, interpreted agreement") {
    graft.functions.register(spark)
    val viaSql = spark.sql("SELECT poly_hash('hello world')").as[Long].head()
    val viaCol = Seq("hello world").toDF("s")
      .select(poly_hash($"s")).as[Long].head()
    val direct = PolyHash.hash(UTF8String.fromString("hello world"))
    assert(viaSql == direct && viaCol == direct)
    // empty string hashes to 0 (matches the oracle's CASE guard)
    assert(Seq("").toDF("s").select(poly_hash($"s")).as[Long].head() == 0L)
  }

  test("sanitizeColumns: P10 key cleanup at select time") {
    val df = Seq((1, 2.0)).toDF("Nonfarm. Payrolls", "Unemployment Rate")
    val clean = graft.ops.Relational.sanitizeColumns(df)
    assert(clean.columns.toSeq == Seq("Nonfarm_Payrolls", "Unemployment_Rate"))
  }

  test("dot_product equals the HOF fold bit-for-bit on real embeddings") {
    val emb = graft.ops.Core.embeddings(spark, sf0001).limit(50)
    val hof = aggregate(
      zip_with($"embedding", $"embedding", (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val diff = emb.select(
        dot_product($"embedding", $"embedding").as("native"), hof.as("hofv"))
      .filter($"native" =!= $"hofv")
    assert(diff.isEmpty, "native and HOF dot products must be bit-identical")
  }

  test("CandleAggregator (typed Aggregator) matches the untyped bars query") {
    import graft.functions.{CandleAggregator, Tick}
    val ev = graft.ops.Core.events(spark, sf0001)
    val typed = ev
      .select(graft.ops.Core.bucket5m($"ts").as("bucket"), $"event_id", $"value")
      .as[(java.sql.Timestamp, Long, Double)]
      .groupByKey(_._1)
      .mapValues { case (_, id, v) => Tick(id, v) }
      .agg(CandleAggregator.toColumn)
      .toDF("bucket", "candle")
      .select($"bucket", $"candle.open", $"candle.high", $"candle.low",
        $"candle.close", $"candle.volume")
    val untyped = graft.ops.Indicators.bars(spark, sf0001)
      .select($"bucket", $"open", $"high", $"low", $"close", $"volume")
    assert(typed.count() == untyped.count())
    assert(typed.except(untyped).isEmpty && untyped.except(typed).isEmpty,
      "typed Aggregator candles must equal the untyped min_by/max_by bars")
  }

  test("token_ngrams equals the HOF trigram build on the real corpus") {
    import graft.functions.token_ngrams
    val docs = graft.ops.Core.documents(spark, sf0001)
      .withColumn("toks", split($"text", " "))
    val hof = when(size($"toks") < 3, array().cast("array<string>")).otherwise(
      transform(sequence(lit(1), size($"toks") - 2), i =>
        concat_ws(" ", element_at($"toks", i), element_at($"toks", i + 1),
          element_at($"toks", i + 2))))
    val diff = docs.select(token_ngrams($"toks", 3).as("native"), hof.as("hofv"))
      .filter($"native" =!= $"hofv")
    assert(diff.isEmpty, "native and HOF trigram arrays must be identical")
    // edge cases: below n -> empty; exactly n -> one gram; bigrams too
    val edge = Seq(Seq("a"), Seq("a", "b"), Seq("a", "b", "c")).toDF("t")
      .select(token_ngrams($"t", 3).as("g3"), token_ngrams($"t", 2).as("g2"))
      .as[(Seq[String], Seq[String])].collect()
    assert(edge(0) == ((Seq(), Seq())))
    assert(edge(1) == ((Seq(), Seq("a b"))))
    assert(edge(2) == ((Seq("a b c"), Seq("a b", "b c"))))
  }

  test("min_hash_sig equals the exploded min-aggregation on the real corpus") {
    import graft.functions.min_hash_sig
    val perms = Seq((131L, 7L), (137L, 11L), (139L, 13L), (149L, 17L))
    val P = 1000003L
    val docs = graft.ops.Core.documents(spark, sf0001)
      .withColumn("toks", split($"text", " "))
      .withColumn("ngarr",
        when(size($"toks") < 3, array().cast("array<string>")).otherwise(
          transform(sequence(lit(1), size($"toks") - 2), i =>
            concat_ws(" ", element_at($"toks", i), element_at($"toks", i + 1),
              element_at($"toks", i + 2)))))
      .filter(size($"toks") > 2)
    val sketch = docs.select($"doc_id", min_hash_sig($"ngarr", perms).as("sig"))
      .select($"doc_id" +: perms.indices.map(j =>
        element_at($"sig", j + 1).as(s"m$j")): _*)
    val minCols = perms.zipWithIndex.map { case ((a, b), j) =>
      min((poly_hash($"ng") * lit(a) + lit(b)) % lit(P)).as(s"m$j")
    }
    val agg = docs.select($"doc_id", explode($"ngarr").as("ng"))
      .groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
    assert(sketch.exceptAll(agg).isEmpty && agg.exceptAll(sketch).isEmpty,
      "map-side MinHash sketch must equal the exploded min-aggregation")
  }

  test("sketch expressions return NULL for empty arrays, not sentinel keys") {
    import graft.functions.{min_hash_sig, simhash_pack}
    // an empty shingle set has no signature: a sentinel (MaxValue
    // minima folding into wrapped band keys, or an all-zero vote word)
    // would make every empty doc a candidate pair of every other
    val df = Seq(Seq.empty[String], Seq("a b c")).toDF("ngarr")
      .select(
        min_hash_sig($"ngarr", Seq((131L, 7L), (137L, 11L)), 2).as("mh"),
        simhash_pack($"ngarr", Seq((131L, 7L)), 32).as("sh"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1),
      "empty input must yield null sketches")
    assert(!rows(1).isNullAt(0) && !rows(1).isNullAt(1),
      "non-empty input must yield non-null sketches")
  }

  test("simhash_pack equals the exploded vote-aggregation on the real corpus") {
    import graft.functions.simhash_pack
    val mixes = Seq((131L, 7L), (151L, 19L), (173L, 37L), (193L, 53L))
    val P = 1000003L
    val docs = graft.ops.Core.documents(spark, sf0001)
      .withColumn("toks", split($"text", " "))
      .withColumn("ngarr",
        when(size($"toks") < 3, array().cast("array<string>")).otherwise(
          transform(sequence(lit(1), size($"toks") - 2), i =>
            concat_ws(" ", element_at($"toks", i), element_at($"toks", i + 1),
              element_at($"toks", i + 2)))))
      .filter(size($"toks") > 2)
    val sketch = docs.select($"doc_id", simhash_pack($"ngarr", mixes, 16).as("sig"))
    val withG = docs.select($"doc_id", explode($"ngarr").as("t"))
      .select(Seq($"doc_id") ++ mixes.zipWithIndex.map { case ((a, b), k) =>
        ((poly_hash($"t") * lit(a) + lit(b)) % lit(P)).as(s"g$k")
      }: _*)
    val bitSums = (0 until 64).map { j =>
      val (k, i) = (j / 16, j % 16)
      sum(shiftright(col(s"g$k"), i).bitwiseAND(lit(1L))).as(s"s$j")
    } :+ count(lit(1)).as("n_sh")
    val packed = (0 until 64).map { j =>
      when(col(s"s$j") * 2 > col("n_sh"), lit(1L << j)).otherwise(lit(0L))
    }.reduceLeft[org.apache.spark.sql.Column]((a, b) => a.bitwiseOR(b))
    val agg = withG.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select($"doc_id", packed.as("sig"))
    assert(sketch.exceptAll(agg).isEmpty && agg.exceptAll(sketch).isEmpty,
      "map-side SimHash sketch must equal the exploded vote-aggregation")
  }

  test("dot_product on double arrays equals the HOF fold; mixed types rejected") {
    graft.functions.register(spark)
    // double path (the dequantized SQ8 scoring shape)
    val emb = graft.ops.Core.embeddings(spark, sf0001).limit(50)
      .select($"embedding".cast("array<double>").as("d"))
    val hof = aggregate(zip_with($"d", $"d", (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val diff = emb.select(dot_product($"d", $"d").as("native"), hof.as("hofv"))
      .filter($"native" =!= $"hofv")
    assert(diff.isEmpty, "double-array native and HOF dots must be bit-identical")
    // mixed float/double and non-numeric-array inputs still fail analysis
    val mixed = graft.ops.Core.embeddings(spark, sf0001).limit(1)
      .select($"embedding".as("f"), $"embedding".cast("array<double>").as("d"))
    mixed.createOrReplaceTempView("dp_mixed")
    val ex = intercept[Exception] {
      spark.sql("SELECT dot_product(f, d) FROM dp_mixed").collect()
    }
    assert(ex.getMessage.contains("array<float>"),
      s"expected an analysis-time type error, got: ${ex.getMessage}")
  }

  test("SQL registration: n-parameterized kernels callable from SQL, literal enforced") {
    graft.functions.register(spark)
    val row = spark.sql(
      """SELECT token_ngrams(split('a b c d', ' '), 2) AS tg,
        |  char_ngrams('abcd', 2) AS cg,
        |  size(cdc_chunk_hashes(split('a b c d', ' '), 8)) AS nc""".stripMargin)
      .collect()(0)
    assert(row.getSeq[String](0) == Seq("a b", "b c", "c d"))
    assert(row.getSeq[String](1) == Seq("ab", "bc", "cd"))
    assert(row.getInt(2) >= 1, "every token list yields at least one chunk")
    // the n parameter must be a literal: a column reference is a plan-
    // time error, not a silent misread
    val ex = intercept[Exception] {
      spark.sql("SELECT char_ngrams(text, length(text)) FROM (SELECT 'ab' AS text)")
        .collect()
    }
    assert(ex.getMessage.contains("literal integer"),
      s"expected the literal-parameter error, got: ${ex.getMessage}")
  }

  test("char_ngrams equals the HOF substr build on real tokens; boundary cases") {
    val toks = graft.ops.Core.documents(spark, sf0001)
      .select(explode(split($"text", " ")).as("tok"))
    val hof = transform(
      sequence(lit(1), length($"tok") - 1),
      i => concat($"tok".substr(i, lit(1)), $"tok".substr(i + 1, lit(1))))
    val diff = toks.filter(length($"tok") >= 2)
      .select(char_ngrams($"tok", 2).as("native"), hof.as("hofv"))
      .filter($"native" =!= $"hofv")
    assert(diff.isEmpty, "native and HOF char pairs must match on every token")
    // below-n strings yield empty arrays; n = length yields one gram
    val edge = spark.range(1).select(
      char_ngrams(lit("x"), 2).as("short"),
      char_ngrams(lit("ab"), 2).as("exact"),
      char_ngrams(lit(""), 1).as("empty"))
      .as[(Seq[String], Seq[String], Seq[String])].collect().head
    assert(edge == ((Seq(), Seq("ab"), Seq())))
  }
}
