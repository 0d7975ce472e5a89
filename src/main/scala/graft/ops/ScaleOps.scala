package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale techniques as first-class, verifiable operators (builder
  * brief: bucketing for co-located joins, salting for skew). These are
  * the 100 TB levers the small-SF queries only imply.
  */
object ScaleOps extends QueryModule {

  /** Skew-safe two-phase aggregation: salt the group key, partial-agg
    * per (key, salt), then merge. With ~6 distinct l_returnflag values
    * over 600M+ rows, the unsalted shuffle would hash all rows of a
    * flag to one reducer; the salt fans each hot key over 16 reducers
    * and the merge is tiny. Decimal sums make the two-phase result
    * exactly equal to the direct GROUP BY — which is the oracle. */
  def saltedAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Core.lineitem(spark, dir)
    val partial = li
      .withColumn("salt", pmod(col("l_orderkey"), lit(16)))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(sum(Core.dec2(col("l_quantity"))).as("s"), count(lit(1)).as("c"))
    partial.groupBy(col("l_returnflag"))
      .agg(sum(col("s")).cast("double").as("sum_qty"), sum(col("c")).as("n"))
  }

  val saltedAggSql: String =
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Bucketed co-located join: persist both sides bucketed+sorted on
    * the join key, then join without any shuffle (the physical plan
    * has SortMergeJoin with zero Exchange). At 100 TB this is the
    * fact-fact join strategy — pay the partitioned write once, join
    * shuffle-free forever after. Asserted in ScaleOpsSpec; the
    * oracle-gated registered form is [[bucketedJoinAgg]] (r16). */
  def writeBucketed(spark: SparkSession, dir: String, name: String,
      table: String, key: String, buckets: Int): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // with the in-memory catalog, the table entry dies with the JVM but
    // the warehouse dir survives — clear the orphaned location too
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    val loc = new java.io.File(warehouse, table)
    if (loc.exists()) rm(loc)
    Core.table(spark, dir, name).write
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)
  }

  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable),
      col(leftKey) === col(rightKey))

  private val bjBuckets = 8

  /** The lineitem + orders pair persisted bucketed+sorted on the join
    * key at an EXTERNAL location (a ProbeTemp-memoized dir, one build
    * per (source-dir content, JVM) — the index-build pattern), each
    * registered in the session catalog under a SOURCE-DIR-derived
    * name so distinct SFs/corpora in one session never collide.
    * Returns the two table names. A fresh session inside the same JVM
    * finds the files memoized but the catalog empty — the
    * re-registration below recreates the ENTRY over the existing
    * files without rewriting data (bucket ids ride the file names, so
    * an external CLUSTERED BY table over saveAsTable output reads
    * identically). Names derive from the source dir, NOT the artifact
    * location (r17, ADVICE r16): location-derived names left the old
    * catalog entries DANGLING over a deleted dir whenever ProbeTemp
    * evicted a superseded artifact after a source-fingerprint change
    * — reads of them threw for the rest of the session. With stable
    * names the rebuild drops-and-recreates the same entries, and
    * `ensure` re-points an entry whose registered location no longer
    * matches the current artifact. */
  private def bucketedJoinTables(spark: SparkSession, dir: String): (String, String) = {
    // readable tail + an MD5 prefix of the FULL dir string: the tail
    // alone can collide for two corpora whose sanitized paths share a
    // 24-char suffix (r17 review — e.g. /v1/.../sf0.1 vs /v2/.../sf0.1),
    // and a collision makes alternating calls DROP/CREATE each other's
    // catalog entry
    val dirHash = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    def name(t: String) =
      s"graft_bj_${t}_${dir.replaceAll("[^A-Za-z0-9]", "").takeRight(16)}_$dirHash"
    def location(tbl: String): String =
      spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(tbl))
        .location.toString
    def ensure(tbl: String, path: String, table: String, key: String): Unit = {
      // re-point a stale entry: same name, superseded location (the
      // fingerprint changed and ProbeTemp rebuilt under a new dir)
      val stale = spark.catalog.tableExists(tbl) &&
        Core.qualifiedPath(spark, location(tbl)) != Core.qualifiedPath(spark, path)
      if (stale) spark.sql(s"DROP TABLE IF EXISTS $tbl")
      if (stale || !spark.catalog.tableExists(tbl)) {
        // schema from the SOURCE table, not the bucketed files: an
        // empty corpus writes a zero-file bucketed table whose dir
        // Spark cannot infer a schema from, while the source read
        // (Core.table) always can
        val schema = Core.table(spark, dir, table).schema.toDDL
        spark.sql(s"CREATE TABLE $tbl ($schema) USING parquet " +
          s"CLUSTERED BY ($key) SORTED BY ($key) INTO $bjBuckets BUCKETS " +
          s"LOCATION '$path'")
        ()
      }
    }
    val loc = ProbeTemp.dir("bucketed_join", dir) { d =>
      def write(table: String, t: String, key: String): Unit = {
        spark.sql(s"DROP TABLE IF EXISTS ${name(t)}")
        // repartition to the bucket hash BEFORE the bucketed write
        // (r17): bucket assignment is pmod(murmur3(key), buckets) —
        // the exact function repartition(n, key) partitions by — so
        // each write task holds exactly one bucket's rows. The
        // bucket+sort+write then parallelizes ACROSS buckets (a
        // narrow source otherwise sorts and writes every bucket in
        // ONE task) while keeping one file per bucket, the layout the
        // sorted-scan path wants; partition count scales with the
        // operator's bucket count, not with this box.
        Core.table(spark, dir, table).repartition(bjBuckets, col(key)).write
          .bucketBy(bjBuckets, key).sortBy(key)
          .format("parquet").option("path", s"$d/$t")
          .mode("overwrite").saveAsTable(name(t))
      }
      // the two bucketed writes are INDEPENDENT (distinct source
      // tables, target dirs, and catalog names; the catalog is
      // thread-safe) — overlap them so the smaller orders write
      // back-fills the lineitem write's sort/commit tail (r18,
      // guide §2.6)
      Core.inParallel[Unit](Seq(
        "bj-lineitem" -> (() => write("lineitem", "li", "l_orderkey")),
        "bj-orders" -> (() => write("orders", "ord", "o_orderkey"))))
      ()
    }
    ensure(name("li"), s"$loc/li", "lineitem", "l_orderkey")
    ensure(name("ord"), s"$loc/ord", "orders", "o_orderkey")
    (name("li"), name("ord"))
  }

  /** REGISTERED exercise of the bucketed co-located join under the
    * driver's oracle gate (r16, VERDICT r15 #3): write both fact
    * tables bucketed+sorted on the order key (memoized standing
    * build, like the index probes), join them WITHOUT a shuffle, and
    * aggregate revenue-class totals per order priority. The merge
    * hint pins the sort-merge path at every SF (tiny SFs would
    * broadcast, hiding exactly the exchange bucketing removes); both
    * scans report HashPartitioning(key, $bjBuckets), so the join
    * plans with ZERO Exchange below it — asserted on the registered
    * plan in ScaleOpsSpec. The only shuffle in the query is the
    * final 5-group aggregate. Oracle = the same join + aggregate in
    * DuckDB over the raw parquet; decimal sums make the result
    * hash-exact. At 100 TB this is the fact-fact join strategy: pay
    * the partitioned write once, join shuffle-free every day after.
    * QBench cold-JVM sf0.1: [7.987, 0.694, 0.853]s — rep0 carries the
    * one-time bucketed write of both tables (the memoized standing
    * build); steady state is the shuffle-free join + 5-group agg. */
  def bucketedJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val (li, ord) = bucketedJoinTables(spark, dir)
    spark.table(li).hint("merge")
      .join(spark.table(ord).hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(Core.dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        // Relational.pricingSummary's exact-decimal revenue shape
        sum(col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n"))
  }

  val bucketedJoinAggSql: String =
    """SELECT o_orderpriority,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1""".stripMargin

  /** Curated-corpus writer: the batch sink layout a 100 TB training
    * pipeline lands on — the quality-gated, deduped corpus partitioned
    * by (lang, split) so downstream training jobs prune to their slice
    * at the directory level, written with DYNAMIC partition overwrite
    * so a re-run (or a backfill of one language) rewrites exactly the
    * partitions it produced, never clobbering the rest. */
  def writeCurated(spark: SparkSession, dir: String, outDir: String): Unit = {
    val q = TextDedup.textQuality(spark, dir).select(col("doc_id"), col("quality_score"))
    val keep = TextDedup.dedupExact(spark, dir).select(col("keep_id").as("doc_id"))
    val h = graft.functions.poly_hash(col("text")) % lit(100L)
    val split = when(h < 80, lit("train")).when(h < 92, lit("val")).otherwise(lit("test"))
    Core.documents(spark, dir)
      .join(keep, Seq("doc_id"), "left_semi")
      .join(q, "doc_id")
      .filter(col("quality_score") >= 0.55)
      .withColumn("split", split)
      .select(col("doc_id"), col("text"), col("n_chars"),
        col("quality_score"), col("lang"), col("split"))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("lang", "split")
      .mode("overwrite")
      .parquet(outDir)
  }

  /** Small-file compaction: the maintenance pass every
    * streaming-ingested corpus needs — idempotent per-batch writers
    * (foreachBatchParquetSink, curateDrops) land one file group per
    * micro-batch, and a month of 1-minute batches is 40k+ tiny files
    * whose per-file open/footer cost dominates later scans. Rewrite
    * into ~`targetRowsPerFile`-row files: one repartition shuffle
    * sized from exact per-partition-value counts, with a per-value
    * SALT so a dominant partition value fans across ceil(rows/target)
    * writers instead of serializing through one task (see inline
    * comment), plus `maxRecordsPerFile` as the hard cap. Partition
    * columns are preserved (the (lang, split) layout keeps its
    * directory pruning). Writes to a NEW directory — at 100 TB compaction swaps
    * directories atomically at the catalog/symlink level rather than
    * rewriting in place under readers. */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
      partitionCols: Seq[String] = Nil, targetRowsPerFile: Long = 1000000L): Unit = {
    val df = spark.read.parquet(inDir)
    if (partitionCols.isEmpty) {
      val n = df.count()
      val files = math.max(1, math.ceil(n.toDouble / targetRowsPerFile).toInt)
      df.repartition(files).write
        .option("maxRecordsPerFile", targetRowsPerFile)
        .mode("overwrite").parquet(outDir)
    } else {
      // Repartition BY the partition columns so each directory is
      // consolidated (round-robin would open one writer per (task,
      // directory): files x nValues re-fragmentation) — but partition
      // values are skewed BY CONSTRUCTION at corpus scale (lang=en is
      // most of a 100 TB crawl), and hashing on the partition columns
      // alone serializes each value through ONE task: maxRecordsPerFile
      // then splits the FILES but not the WORK (ADVICE r4). So salt
      // each value with a width sized from its own row count: width =
      // ceil(rows/targetRowsPerFile), so hot values fan across that
      // many writers (each producing ~one target-size file) while
      // small values keep width 1 and still consolidate to a single
      // file. The per-value count collect is one row per partition
      // value — broadcast-equivalent driver state (same class as the
      // IVF centroid collects), and the counts ride a scan of the
      // partition columns only.
      val pcols = partitionCols.map(col)
      // The rewrite reserves _salt/_salt_w/_w_<partitionCol> working
      // columns; an input already carrying one would hit an
      // ambiguous-column AnalysisException at the width join (or a
      // silent drop) deep in the plan — fail fast at the contract
      // instead, matching the all-partition-columns guard (ADVICE r6).
      val reserved = df.columns.filter(c =>
        c == "_salt" || c == "_salt_w" || c.startsWith("_w_"))
      require(reserved.isEmpty,
        s"compactParquet: input columns ${reserved.mkString(",")} collide with " +
          "the reserved working prefixes (_salt, _salt_w, _w_*) of the salted rewrite")
      // The width lookup must be NULL-SAFE: Hive layouts write a null
      // partition value as __HIVE_DEFAULT_PARTITION__ and read it back
      // as null (plausible for lang in crawl data), and a null-unsafe
      // equi-join would silently DROP those rows — turning the "pure
      // rewrite" contract into data loss (ADVICE r5). Prefix the
      // width-frame keys and join with <=> per column.
      val widths = df.groupBy(pcols: _*)
        .agg(ceil(count(lit(1)).cast("double") / targetRowsPerFile)
          .cast("int").as("_salt_w"))
        .select(partitionCols.map(c => col(c).as("_w_" + c)) :+ col("_salt_w"): _*)
      // empty input: the sum aggregate is NULL — coalesce to one file
      // (the old unsalted path handled n=0; the salted one must too)
      val totalFiles = math.max(1,
        widths.agg(coalesce(sum(greatest(col("_salt_w"), lit(1))), lit(1L)))
          .head().getLong(0).toInt)
      // deterministic spread: hash the DATA columns (retry-stable,
      // unlike rand()), modulo the per-value width. If partitionCols
      // covers EVERY column there is nothing to hash — and Spark
      // itself refuses to WRITE an all-partition-column table
      // (ALL_PARTITION_COLUMNS_NOT_ALLOWED), so fail fast with a clear
      // contract error instead of an opaque analysis failure mid-plan.
      val dataCols = df.columns.filterNot(partitionCols.contains).map(col).toSeq
      require(dataCols.nonEmpty,
        s"compactParquet: partitionCols (${partitionCols.mkString(",")}) must " +
          "not cover every column — Spark cannot write a table whose columns " +
          "are all partition columns")
      val joinCond = partitionCols.map(c => col(c) <=> col("_w_" + c)).reduce(_ && _)
      df.join(broadcast(widths), joinCond)
        .withColumn("_salt",
          pmod(hash(dataCols: _*), greatest(col("_salt_w"), lit(1))))
        .repartition(totalFiles, pcols :+ col("_salt"): _*)
        .drop(widths.columns: _*)
        .drop("_salt")
        .write
        .partitionBy(partitionCols: _*)
        .option("maxRecordsPerFile", targetRowsPerFile)
        .mode("overwrite").parquet(outDir)
    }
  }

  /** Heavy-hitter detection without a full shuffle-count: a count-min
    * sketch over the exploded token stream. The sketch is a fixed-size
    * MERGEABLE state (d x w counter matrix; here w = ceil(e/eps),
    * d = ceil(ln(1/(1-conf)))), so map-side partials combine
    * associatively and only kilobytes cross the wire — the hot-key
    * probe a 100 TB pipeline runs BEFORE choosing salting widths,
    * where an exact token count would itself be the skewed shuffle it
    * is trying to diagnose. Spark's builtin count_min_sketch agg
    * (functions-not-UDFs); estimates are one-sided: est >= true, and
    * est <= true + eps * N with prob >= conf (asserted in
    * ScaleOpsSpec against exact counts). No DuckDB oracle — the sketch
    * binary is engine-internal; the error-bound spec is the check,
    * like the HLL/approx-quantile twins. */
  def tokenCountSketch(spark: SparkSession, dir: String,
      eps: Double = 0.001, confidence: Double = 0.99, seed: Int = 42)
      : org.apache.spark.util.sketch.CountMinSketch = {
    val bytes = Core.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .agg(count_min_sketch(col("tok"), lit(eps), lit(confidence), lit(seed))
        .as("sk"))
      .head().getAs[Array[Byte]]("sk")
    org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
  }

  /** Bits per dimension of the Z-order (Morton) curve: 8 bits → a
    * 256×256 bucket grid, 16-bit z-values. Coarse on purpose — the
    * z-value orders ROW GROUPS, not rows; 256 buckets per dimension is
    * far finer than any realistic row-group count per file. */
  private val zBits = 8

  /** Events with both dimensions range-scaled to [0, 2^zBits) and the
    * Morton-interleaved `zval` attached (u on odd bits, t on even).
    * All-integer math: (x - min) * 256 DIV (max - min + 1) — the
    * scalar min/max bounds broadcast as one row (allowlisted), and
    * integer DIV / bit ops are bit-identical in any engine. */
  private def withZval(spark: SparkSession, dir: String): DataFrame = {
    // keeps every events column (Catalyst prunes the unused ones out
    // of the tiles aggregation's scan) so [[writeZOrdered]] can emit
    // the original schema unchanged
    val ev = Core.events(spark, dir)
      .withColumn("tus", unix_micros(col("ts")))
    val bounds = ev.agg(
      min(col("user_id")).as("min_u"), max(col("user_id")).as("max_u"),
      min(col("tus")).as("min_t"), max(col("tus")).as("max_t"))
    val z = (0 until zBits).map { i =>
      shiftleft(shiftright(col("u8"), i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(col("t8"), i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)
    ev.crossJoin(broadcast(bounds))
      .withColumn("u8", expr(s"((user_id - min_u) * ${1 << zBits}) DIV (max_u - min_u + 1)"))
      .withColumn("t8", expr(s"((tus - min_t) * ${1 << zBits}) DIV (max_t - min_t + 1)"))
      .withColumn("zval", z)
  }

  /** Z-ORDER (Morton curve) multi-dimension clustering — the data
    * LAYOUT lever for a 100 TB fact table queried along more than one
    * axis. A time-sorted layout gives tight parquet row-group min/max
    * stats on ts but every row group spans the full user_id range, so
    * a user predicate prunes nothing; sorting by the interleaved
    * z-value of (user_id, ts) bounds BOTH dimensions per contiguous
    * run — each 256-z-value tile fixes the high 4 bits of both scaled
    * dimensions, so a predicate on EITHER column prunes ~15/16 of the
    * row groups (Delta/Iceberg OPTIMIZE ZORDER is this exact
    * technique; the curve is Morton 1966).
    *
    * The registered query is the AUDIT VIEW of that claim: per
    * 16×16-bucket tile (zval DIV 256), the event count and the
    * min/max of both raw dimensions — ScaleOpsSpec asserts every
    * tile's span stays inside its 1/16-of-range slab on both axes,
    * and [[writeZOrdered]] + its spec measure the per-FILE span
    * shrinkage against a time-sorted layout. All-integer outputs;
    * hash-exact vs the DuckDB oracle replaying the same interleave.
    * QBench cold-JVM sf0.1: [1.233, 0.597]s. */
  def zorderTiles(spark: SparkSession, dir: String): DataFrame =
    withZval(spark, dir)
      .groupBy(expr(s"CAST(zval DIV ${1 << zBits} AS INT)").as("tile"))
      .agg(count(lit(1)).as("n_events"),
        min(col("user_id")).as("u_lo"), max(col("user_id")).as("u_hi"),
        min(col("tus")).as("t_lo"), max(col("tus")).as("t_hi"))

  val zorderTilesSql: String = {
    val n = 1 << zBits
    val inter = (0 until zBits).map(i =>
      s"((((u8 >> $i) & 1) << ${2 * i + 1}) | (((t8 >> $i) & 1) << ${2 * i}))")
      .mkString(" | ")
    s"""WITH ev AS (
       |  SELECT event_id, user_id, epoch_us(ts) AS tus FROM ${Core.sqlEvents}),
       |b AS (
       |  SELECT min(user_id) AS min_u, max(user_id) AS max_u,
       |         min(tus) AS min_t, max(tus) AS max_t FROM ev),
       |s AS (
       |  SELECT user_id, tus,
       |    ((user_id - min_u) * $n) // (max_u - min_u + 1) AS u8,
       |    ((tus - min_t) * $n) // (max_t - min_t + 1) AS t8
       |  FROM ev CROSS JOIN b),
       |z AS (SELECT user_id, tus, ($inter) AS zval FROM s)
       |SELECT CAST(zval // $n AS INTEGER) AS tile, count(*) AS n_events,
       |  min(user_id) AS u_lo, max(user_id) AS u_hi,
       |  min(tus) AS t_lo, max(tus) AS t_hi
       |FROM z GROUP BY 1""".stripMargin
  }

  /** Write the events table Z-ORDERED into `files` parquet files:
    * range-partition on zval (contiguous curve runs per file), sort
    * within each file so row-group stats are tight at sub-file
    * granularity too. At 100 TB this replaces the time-sorted ingest
    * layout for fact tables with a second hot predicate dimension;
    * the rewrite is one range shuffle — same cost class as the sort
    * the time layout already pays. ScaleOpsSpec measures per-file
    * user_id-span shrinkage vs the time-sorted twin on identical
    * data.
    *
    * The written schema is the EVENTS schema, unchanged (ADVICE r8:
    * an earlier cut emitted raw microseconds in place of `ts`, so the
    * layout was not the drop-in replacement it claims to be): the
    * curve key orders the write and is then projected away — readers
    * see the same columns as the ingest layout, just clustered. */
  def writeZOrdered(spark: SparkSession, dir: String, outDir: String,
      files: Int): Unit = {
    val evCols = Core.events(spark, dir).columns.map(col)
    withZval(spark, dir)
      .repartitionByRange(files, col("zval"))
      .sortWithinPartitions(col("zval"))
      .select(evCols.toSeq: _*)
      .write.mode("overwrite").parquet(outDir)
  }

  override def queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "salted_agg" -> (saltedAgg _),
    "zorder_tiles" -> (zorderTiles _),
    "bucketed_join_agg" -> (bucketedJoinAgg _))

  override def oracle: Seq[(String, String)] = Seq(
    "salted_agg" -> saltedAggSql,
    "zorder_tiles" -> zorderTilesSql,
    "bucketed_join_agg" -> bucketedJoinAggSql)
}
