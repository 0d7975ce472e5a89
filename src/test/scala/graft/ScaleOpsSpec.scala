package graft

import org.apache.spark.sql.functions._
import graft.ops.ScaleOps

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("spreadNarrowScan: core-width on a narrow scan, identity on a wide frame") {
    val cores = spark.sparkContext.defaultParallelism
    val narrow = graft.ops.Core.documents(spark, sf0001)
    assume(narrow.rdd.getNumPartitions < cores,
      "fixture is expected to plan as a narrow (one-row-group) scan")
    val spread = graft.ops.Core.spreadNarrowScan(narrow)
    // fans to exactly the session parallelism, rows untouched
    assert(spread.rdd.getNumPartitions == cores)
    assert(spread.count() == narrow.count())
    // an already-wide frame passes through UNTOUCHED (the cluster-scale
    // regime: no extra exchange where the scan is wide enough)
    val wide = narrow.repartition(cores)
    assert(graft.ops.Core.spreadNarrowScan(wide) eq wide)
  }

  test("salted two-phase aggregation equals the direct group-by") {
    val salted = ScaleOps.saltedAgg(spark, sf0001)
    val direct = graft.ops.Core.lineitem(spark, sf0001)
      .groupBy($"l_returnflag")
      .agg(sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sum_qty2"),
        count(lit(1)).as("n2"))
    val joined = salted.join(direct, "l_returnflag")
    assert(joined.filter($"sum_qty" =!= $"sum_qty2" || $"n" =!= $"n2").isEmpty)
  }

  test("curated corpus writer: (lang, split) layout, dynamic-overwrite idempotent") {
    val out = java.nio.file.Files.createTempDirectory("graft_curated").toString + "/corpus"
    ScaleOps.writeCurated(spark, sf0001, out)
    val first = spark.read.parquet(out)
    assert(first.count() > 0)
    assert(first.columns.contains("lang") && first.columns.contains("split"))
    // directory layout prunes by partition columns
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("lang=")), s"expected lang= dirs, got ${dirs.mkString(",")}")
    // matches the corpus_pipeline gate: survivors with quality >= 0.55
    val expected = graft.ops.TextDedup.corpusPipeline(spark, sf0001)
      .agg(sum("n_docs")).as[Long].collect()(0)
    assert(first.count() == expected, "writer must land exactly the gated dedup survivors")
    // re-run overwrites its own partitions, never duplicating
    ScaleOps.writeCurated(spark, sf0001, out)
    assert(spark.read.parquet(out).count() == expected)
    // partition pruning: a lang filter must reach the file index as a
    // PartitionFilter (directories skipped at planning), and the scan
    // must touch only that partition's files — the read-side payoff of
    // the (lang, split) layout at 100 TB
    // fresh read: `first` holds the pre-overwrite file listing
    val langs = spark.read.parquet(out).select("lang").distinct().as[String].collect()
    if (langs.length > 1) {
      val one = langs.min
      val pruned = spark.read.parquet(out).filter($"lang" === one)
      val explained = pruned.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // anchor the assertion to the PartitionFilters entry itself —
      // 'lang' also appears in ReadSchema/output, so a whole-plan
      // regex would pass vacuously on an empty PartitionFilters: []
      val pfLine = explained.linesIterator
        .find(_.contains("PartitionFilters")).getOrElse("")
      assert(pfLine.contains("lang"),
        s"lang filter must appear IN PartitionFilters, got '$pfLine' in:\n$explained")
      // (df.inputFiles reflects the unpruned relation, so file counts
      // can't witness pruning — the PartitionFilters entry above is
      // the planning-time evidence; the count below is an independent
      // expectation: lang values collected driver-side, no partition
      // filter in ITS plan, so it can't share a pruning bug)
      val expected1 = spark.read.parquet(out).select("lang")
        .as[String].collect().count(_ == one).toLong
      assert(pruned.count() == expected1 && expected1 > 0)
    }
  }

  test("bucketed co-located join plans with zero exchanges") {
    ScaleOps.writeBucketed(spark, sf0001, "lineitem", "li_bucketed", "l_orderkey", 8)
    ScaleOps.writeBucketed(spark, sf0001, "orders", "ord_bucketed", "o_orderkey", 8)
    // force the shuffle-join path (tiny SF would otherwise broadcast,
    // which hides exactly the exchange this technique removes)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = ScaleOps.bucketedJoin(spark, "li_bucketed", "ord_bucketed",
      "l_orderkey", "o_orderkey")
    try {
      val plan = joined.queryExecution.sparkPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      // and it is still correct
      val n = joined.count()
      val expected = graft.ops.Core.lineitem(spark, sf0001)
        .join(graft.ops.Core.orders(spark, sf0001),
          $"l_orderkey" === $"o_orderkey").count()
      assert(n == expected)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("registered bucketed_join_agg plans its join with zero Exchange below the SMJ") {
    // the REGISTERED query's own plan (r16, VERDICT r15 #3): the
    // merge hint pins SMJ at every SF, and both bucketed scans report
    // HashPartitioning(key, buckets), so the join subtree must carry
    // no shuffle — the only Exchange in the whole query is the final
    // 5-group aggregate's
    val df = SparkEntry.queries("bucketed_join_agg")(spark, sf0001)
    val plan = df.queryExecution.sparkPlan
    val smjs = plan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(smjs.nonEmpty, s"expected a SortMergeJoin in:\n$plan")
    val shuffles = smjs.flatMap(_.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    })
    assert(shuffles.isEmpty,
      s"bucketed join subtree must be exchange-free, found ${shuffles.size} in:\n$plan")
    // and the result is the plain join's
    val expected = graft.ops.Core.lineitem(spark, sf0001)
      .join(graft.ops.Core.orders(spark, sf0001), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority").count()
      .as[(String, Long)].collect().toMap
    val got = df.select($"o_orderpriority", $"n").as[(String, Long)].collect().toMap
    assert(got == expected, s"bucketed agg diverged: $got vs $expected")
  }

  test("bucketed join re-points a catalog entry whose location went stale") {
    // r17, ADVICE r16: a ProbeTemp fingerprint change rebuilds the
    // bucketed artifacts under a NEW dir; with location-derived names
    // the old entries dangled over the deleted dir for the rest of
    // the session. Names are now source-dir-derived and `ensure`
    // re-points an entry whose registered location is superseded —
    // simulated here by re-registering the lineitem entry over a
    // bogus empty dir before the next call.
    ScaleOps.bucketedJoinAgg(spark, sf0001).count() // registers the pair
    val dirHash = java.security.MessageDigest.getInstance("MD5")
      .digest(sf0001.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    val tbl =
      s"graft_bj_li_${sf0001.replaceAll("[^A-Za-z0-9]", "").takeRight(16)}_$dirHash"
    assert(spark.catalog.tableExists(tbl), s"expected $tbl registered")
    def loc() = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(tbl))
      .location.toString
    val live = loc()
    val bogus = java.nio.file.Files.createTempDirectory("graft_bj_stale").toString
    spark.sql(s"DROP TABLE $tbl")
    spark.sql("CREATE TABLE " + tbl + " (l_orderkey BIGINT) USING parquet " +
      s"LOCATION '$bogus'")
    assert(loc() != live)
    val out = SparkEntry.queries("bucketed_join_agg")(spark, sf0001)
    assert(out.count() > 0, "query must answer after re-pointing")
    assert(loc() == live, s"entry must be re-pointed to the live artifact, got ${loc()}")
  }

  test("compaction collapses a fragmented layout, preserves rows and pruning columns") {
    val frag = java.nio.file.Files.createTempDirectory("graft_frag").toString + "/d"
    val out = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/d"
    // simulate a micro-batch-fragmented landing: 16 file groups
    graft.ops.Core.documents(spark, sf0001)
      .repartition(16)
      .write.partitionBy("lang").parquet(frag)
    def parquetFiles(dir: String) = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(dir)).filter(_.getName.endsWith(".parquet"))
    }
    val nFragFiles = parquetFiles(frag).size
    ScaleOps.compactParquet(spark, frag, out, partitionCols = Seq("lang"))
    val nCompactFiles = parquetFiles(out).size
    assert(nCompactFiles < nFragFiles,
      s"compaction must reduce files: $nFragFiles -> $nCompactFiles")
    val before = spark.read.parquet(frag)
    val after = spark.read.parquet(out)
    assert(after.count() == before.count())
    assert(after.select(before.columns.map(col): _*).exceptAll(before).isEmpty,
      "compaction must be a pure rewrite")
    // the partition layout survives: lang is still a directory column
    assert(parquetFiles(out).forall(_.getPath.contains("lang=")))
    // and each directory is CONSOLIDATED: hash-repartition by the
    // partition columns means one writer per directory here (rows <<
    // targetRowsPerFile), not one per (task, directory)
    val perDir = parquetFiles(out).groupBy(_.getParentFile.getName)
    assert(perDir.values.forall(_.size == 1),
      s"per-dir file counts: ${perDir.view.mapValues(_.size).toMap}")
  }

  test("compaction salts a dominant partition value across writers, small values consolidate") {
    val frag = java.nio.file.Files.createTempDirectory("graft_skewfrag").toString + "/d"
    val out = java.nio.file.Files.createTempDirectory("graft_skewcompact").toString + "/d"
    // skewed layout: one value dominates (the lang=en of a crawl)
    val hot = (1 to 350).map(i => (i.toLong, s"doc $i", "en"))
    val cold = (351 to 400).map(i => (i.toLong, s"doc $i", "de"))
    (hot ++ cold).toDF("doc_id", "text", "lang")
      .repartition(8).write.partitionBy("lang").parquet(frag)
    ScaleOps.compactParquet(spark, frag, out,
      partitionCols = Seq("lang"), targetRowsPerFile = 100L)
    def parquetFiles(dir: String) = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(dir)).filter(_.getName.endsWith(".parquet"))
    }
    val perDir = parquetFiles(out).groupBy(_.getParentFile.getName)
      .view.mapValues(_.size).toMap
    // hot value: width ceil(350/100)=4 salted writers -> >1 file and
    // no file above the cap; cold value: width 1 -> exactly 1 file
    assert(perDir("lang=en") > 1, s"hot value must fan out, got $perDir")
    assert(perDir("lang=en") <= 8, s"fan-out stays ~width+collisions, got $perDir")
    assert(perDir("lang=de") == 1, s"small value must consolidate, got $perDir")
    val before = spark.read.parquet(frag)
    val after = spark.read.parquet(out)
    assert(after.count() == before.count())
    assert(after.select(before.columns.map(col): _*).exceptAll(before).isEmpty,
      "salted compaction must stay a pure rewrite")
  }

  test("compaction preserves rows whose partition value is NULL") {
    val frag = java.nio.file.Files.createTempDirectory("graft_nullfrag").toString + "/d"
    val out = java.nio.file.Files.createTempDirectory("graft_nullcompact").toString + "/d"
    // a crawl slice where lang-ID abstained: null partition values land
    // in __HIVE_DEFAULT_PARTITION__ and read back as null — the width
    // join must be null-safe or these rows vanish (ADVICE r5)
    val rows = Seq((1L, "a", "en"), (2L, "b", "en"), (3L, "c", null),
      (4L, "d", null), (5L, "e", "de"))
    rows.toDF("doc_id", "text", "lang")
      .repartition(4).write.partitionBy("lang").parquet(frag)
    ScaleOps.compactParquet(spark, frag, out, partitionCols = Seq("lang"))
    val before = spark.read.parquet(frag)
    val after = spark.read.parquet(out)
    assert(after.count() == before.count(),
      "null-partition rows must survive compaction")
    assert(after.filter($"lang".isNull).count() == 2)
    assert(after.select(before.columns.map(col): _*).exceptAll(before).isEmpty,
      "null-partition compaction must stay a pure rewrite")
  }

  test("compaction handles all-columns-partitioned and empty inputs") {
    // every column a partition column: Spark itself cannot write such
    // a table (ALL_PARTITION_COLUMNS_NOT_ALLOWED), so the contract is
    // a clear fail-fast, not an opaque mid-plan analysis error
    val frag1 = java.nio.file.Files.createTempDirectory("graft_allpart").toString + "/d"
    val out1 = java.nio.file.Files.createTempDirectory("graft_allpartout").toString + "/d"
    Seq(("en", "train", 1L), ("en", "val", 2L), ("de", "train", 3L))
      .toDF("lang", "split", "doc_id").write.partitionBy("lang", "split").parquet(frag1)
    val e = intercept[IllegalArgumentException] {
      ScaleOps.compactParquet(spark, frag1, out1,
        partitionCols = Seq("lang", "split", "doc_id"))
    }
    assert(e.getMessage.contains("must not cover every column"))
    // empty input: the widths sum is NULL — must not throw. The
    // fixture is a schema-bearing zero-row parquet file (what a
    // drained landing looks like; a filter-to-empty write leaves no
    // file at all under AQE and is unreadable to begin with).
    val frag2 = java.nio.file.Files.createTempDirectory("graft_emptyfrag").toString + "/d"
    val out2 = java.nio.file.Files.createTempDirectory("graft_emptyout").toString + "/d"
    val docSchema = Seq((1L, "a", "en")).toDF("doc_id", "text", "lang").schema
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], docSchema)
      .write.parquet(frag2)
    // contract: returns without throwing (a zero-row dynamic-partition
    // write legitimately lands only _SUCCESS — nothing to read back)
    ScaleOps.compactParquet(spark, frag2, out2, partitionCols = Seq("lang"))
    assert(new java.io.File(out2).exists())
  }

  test("zorder tiles: every tile fixes the high nibble of both scaled dimensions") {
    val ev = graft.ops.Core.events(spark, sf0001)
      .select($"user_id", unix_micros($"ts").as("tus"))
    val (minU, maxU, minT, maxT) = ev
      .agg(min($"user_id"), max($"user_id"), min($"tus"), max($"tus"))
      .as[(Long, Long, Long, Long)].head()
    def u8(u: Long) = (u - minU) * 256 / (maxU - minU + 1)
    def t8(x: Long) = (x - minT) * 256 / (maxT - minT + 1)
    val tiles = ScaleOps.zorderTiles(spark, sf0001)
      .as[(Int, Long, Long, Long, Long, Long)].collect()
    assert(tiles.nonEmpty && tiles.map(_._2).sum == ev.count())
    tiles.foreach { case (tile, _, uLo, uHi, tLo, tHi) =>
      // a 256-zval tile fixes bits 15..8 = the high 4 bits of BOTH
      // dimensions — the min/max-pruning property the layout claims
      assert(u8(uLo) / 16 == u8(uHi) / 16, s"tile $tile user slab [$uLo,$uHi]")
      assert(t8(tLo) / 16 == t8(tHi) / 16, s"tile $tile time slab [$tLo,$tHi]")
    }
  }

  test("z-ordered layout shrinks per-file user span vs the time-sorted twin") {
    val zdir = java.nio.file.Files.createTempDirectory("graft_z").toString + "/z"
    val tdir = java.nio.file.Files.createTempDirectory("graft_t").toString + "/t"
    ScaleOps.writeZOrdered(spark, sf0001, zdir, 16)
    graft.ops.Core.events(spark, sf0001)
      .repartitionByRange(16, $"ts").sortWithinPartitions($"ts")
      .write.mode("overwrite").parquet(tdir)
    // drop-in claim (ADVICE r8): the z layout's schema is the events
    // schema, byte-for-byte — no curve key, no raw-microsecond ts
    assert(spark.read.parquet(zdir).schema ==
      graft.ops.Core.events(spark, sf0001).schema,
      "z-ordered layout must present the unchanged events schema")
    def meanSpans(dir: String): (Double, Double, Long) = {
      val f = spark.read.parquet(dir)
        .withColumn("tus", unix_micros($"ts"))
        .groupBy(input_file_name())
        .agg((max($"user_id") - min($"user_id")).as("uspan"),
          (max($"tus") - min($"tus")).as("tspan"), count(lit(1)).as("n"))
      val (u, t) = f.agg(avg($"uspan"), avg($"tspan")).as[(Double, Double)].head()
      (u, t, f.agg(sum($"n")).as[Long].head())
    }
    val (zu, zt, zn) = meanSpans(zdir)
    val (tu, tt, tn) = meanSpans(tdir)
    assert(zn == tn, "both layouts hold the same rows")
    // a 1/16 run of the curve fixes 2 high bits of each dimension: the
    // z layout's mean per-file user span must be well under the
    // time-sorted layout's (which is ~the full user range per file) —
    // that shrinkage IS the row-group pruning a user predicate buys
    assert(zu < 0.5 * tu, s"z user span $zu vs time-sorted $tu")
    // and the time dimension stays bounded (the curve trades a 16x
    // time slab for bounding both axes, it does not give time away)
    val fullT = spark.read.parquet(tdir)
      .agg(max(unix_micros($"ts")) - min(unix_micros($"ts"))).as[Long].head()
    assert(zt < 0.5 * fullT, s"z time span $zt vs full range $fullT")
  }

  test("count-min sketch bounds every top-token estimate (one-sided, eps*N slack)") {
    val eps = 0.001
    val sk = ScaleOps.tokenCountSketch(spark, sf0001, eps = eps)
    val toks = graft.ops.Core.documents(spark, sf0001)
      .select(explode(split($"text", " ")).as("tok"))
    val totalN = toks.count()
    val exact = toks.groupBy("tok").count()
      .orderBy($"count".desc, $"tok").limit(20)
      .as[(String, Long)].collect()
    assert(sk.totalCount() == totalN, "sketch must have absorbed every token")
    exact.foreach { case (tok, trueCnt) =>
      val est = sk.estimateCount(tok)
      assert(est >= trueCnt, s"CMS is one-sided: est $est < true $trueCnt for '$tok'")
      assert(est <= trueCnt + (eps * totalN).ceil.toLong,
        s"est $est exceeds eps*N slack over $trueCnt for '$tok'")
    }
  }
}
