package graft

/** Driver-contract invariants: unique names, oracle keys subset,
  * entry smoke, every query runs at sf0.001 with rows >= 0. */
class RegistrySpec extends SparkSpec {

  test("entry returns rows on sf0.001 (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("schema-drift canary: testdata columns resolve to their pinned Spark types") {
    // The Aug-13 testdata regeneration silently switched `ts` from parquet
    // TIMESTAMP(NANOS) to timestamp[us] NTZ and broke 14 queries with no
    // single named failure (VERDICT r7 #2). This test pins the RESOLVED
    // types after Core.table normalization, so the next regeneration that
    // changes a physical type fails here first, naming the column.
    import org.apache.spark.sql.types._
    val expected: Seq[(String, Map[String, DataType])] = Seq(
      "events" -> Map(
        "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
        "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType),
      "lineitem" -> Map(
        "l_orderkey" -> LongType, "l_quantity" -> DoubleType,
        "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
        "l_returnflag" -> StringType, "l_shipdate" -> TimestampType),
      "orders" -> Map(
        "o_orderkey" -> LongType, "o_custkey" -> LongType,
        "o_totalprice" -> DoubleType, "o_orderdate" -> TimestampType),
      "documents" -> Map(
        "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
        "source" -> StringType, "n_chars" -> LongType),
      "embeddings" -> Map(
        "vec_id" -> LongType, "embedding" -> ArrayType(FloatType), "label" -> IntegerType))
    val drift = for {
      (tbl, cols) <- expected
      schema = graft.ops.Core.table(spark, sf0001, tbl).schema
      (col, want) <- cols.toSeq.sortBy(_._1)
      got = schema.find(_.name == col).map(_.dataType)
      if !got.contains(want)
    } yield s"$tbl.$col: expected $want, resolved ${got.getOrElse("MISSING")}"
    assert(drift.isEmpty,
      s"testdata schema drift — fix Core.table normalization or update this pin:\n  ${drift.mkString("\n  ")}")
  }

  test("oracle keys are a subset of query keys") {
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }

  test("every registered query is an eta-expanded (SparkSession, String) => DataFrame def") {
    // The oracle-parameter-drift gate (r6 verdict #1): a registered query
    // with an extra tunable parameter (userSessions(gapMinutes), the old
    // ivfTopK(cells)) lets a caller silently diverge from the checked
    // engine/oracle pair, because the oracle bakes the constant. Two
    // layers enforce the rule "registered forms take exactly
    // (SparkSession, String)":
    //  1. compile-time — module registries bind `name -> (fn _)`; eta
    //     expansion only conforms to (SparkSession, String) => DataFrame
    //     when the def has exactly those two parameters (defaulted extras
    //     still widen the function type and fail to compile);
    //  2. this source gate — a lambda `(s, d) => fn(s, d, ...)` would
    //     bypass layer 1, so the queries blocks must contain only
    //     eta-expanded bindings.
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val opsDir = Paths.get("src/main/scala/graft/ops")
    assert(Files.isDirectory(opsDir), s"expected module sources at $opsDir (run tests from the repo root)")
    val entryRe = """"([a-z0-9_]+)"\s*->\s*(.+)$""".r
    val etaRe = """\(\s*[A-Za-z0-9_]+\s+_\s*\)""".r
    val bindings = Files.list(opsDir).iterator().asScala
      .filter(_.toString.endsWith(".scala")).flatMap { p =>
        val lines = Files.readAllLines(p).asScala
        val start = lines.indexWhere(_.contains("def queries:"))
        if (start < 0) Iterator.empty
        else {
          val block = lines.drop(start).takeWhile(!_.contains("def oracle"))
          block.flatMap(line => entryRe.findFirstMatchIn(line).map { m =>
            // strip the entry separator and (on the last entry) the
            // Seq-closing paren, leaving just the bound expression
            var rhs = m.group(2).trim.stripSuffix(",")
            if (rhs.endsWith("))")) rhs = rhs.dropRight(1)
            (p.getFileName.toString, m.group(1), rhs)
          })
        }
      }.toList
    assert(bindings.map(_._2).distinct.size == SparkEntry.queries.size,
      s"registry source scan found ${bindings.size} bindings but SparkEntry has " +
        s"${SparkEntry.queries.size} queries — the scan regex no longer matches the registry style")
    val bad = bindings.filterNot { case (_, _, rhs) => etaRe.pattern.matcher(rhs).matches() }
    assert(bad.isEmpty,
      "registered queries must be eta-expanded param-free defs (`name -> (fn _)`), " +
        s"not lambdas that could hide oracle-baked parameters: ${bad.mkString(", ")}")
  }

  test("views: every query addressable from SQL, composable with raw tables, still pruned") {
    Views.register(spark, sf0001)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // a view answers plain SQL and equals the direct DataFrame form
    val viaSql = spark.sql("SELECT count(*) FROM indicators").as[Long].head()
    assert(viaSql == graft.ops.Indicators.indicators(spark, sf0001).count())
    // views compose with raw tables in one statement (the reference's
    // dataloader pattern: SELECT from a view constrained by base data)
    val joined = spark.sql(
      """SELECT b.bucket, b.close, o.o_orderkey
        |FROM bars_5min b CROSS JOIN (SELECT min(o_orderkey) AS o_orderkey FROM orders) o
        |LIMIT 5""".stripMargin)
    assert(joined.count() == 5)
    // the lazy-plan claim: filtering a view pushes into the scan — the
    // events scan under the filtered view must carry a data filter
    val filtered = spark.sql("SELECT * FROM latest_point WHERE event_type = 'view'")
    val scans = filtered.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scans.exists(_.dataFilters.nonEmpty),
      "a view-level predicate must reach the parquet scan")
    // registration is idempotent
    Views.register(spark, sf0001)
    assert(spark.sql("SELECT count(*) FROM documents").as[Long].head() ==
      graft.ops.Core.documents(spark, sf0001).count())
  }

  test("views equivalence gate: every registered view equals its DataFrame result") {
    // VERDICT r8 #7: the SQL surface (Views.register) must never drift
    // from the oracle-checked plans. A view is the query's OWN lazy
    // plan, so equality holds by construction TODAY — this gate pins
    // it against future registration bugs: a name collision, a stale
    // view surviving re-registration, or a register() refactor that
    // materializes or re-derives. Compared as row multisets (same
    // plan => bit-identical values, so string render is exact).
    Views.register(spark, sf0001)
    val diffs = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val direct = fn(spark, sf0001).collect().map(_.toString).sorted.toSeq
      val viaSql = spark.sql(s"SELECT * FROM `$name`").collect().map(_.toString).sorted.toSeq
      if (direct == viaSql) None
      else Some(s"$name: direct ${direct.size} rows != view ${viaSql.size} rows (or values differ)")
    }
    assert(diffs.isEmpty, s"view/DataFrame divergence:\n${diffs.mkString("\n")}")
  }

  test("every query executes at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf0001).count()
      withClue(s"query $name:") { assert(n >= 0) }
    }
  }

  test("quantiles are monotone and drawn from the data") {
    import org.apache.spark.sql.functions.col
    val q = graft.ops.Relational.valueQuantiles(spark, sf0001)
    val bad = q.filter(col("p25") > col("p50") || col("p50") > col("p75") ||
      col("p75") > col("p95"))
    assert(bad.isEmpty, "percentile_disc must be monotone in p")
  }

  test("top orders: k rows, revenue-ranked, and every order inside the date split") {
    import org.apache.spark.sql.functions.{col, lit}
    val t = graft.ops.Relational.topOrders(spark, sf0001).cache()
    assert(t.count() == 10)
    val revs = t.orderBy(col("revenue").desc, col("l_orderkey"))
      .select("revenue").collect().map(_.getDouble(0))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b }, "revenue must be non-increasing")
    assert(t.filter(col("o_orderdate") >= lit("1998-06-01").cast("timestamp")).isEmpty,
      "only orders placed before the cutoff qualify")
    t.unpersist()
  }

  test("data quality: clean corpus passes all constraints, tampering is counted exactly") {
    import org.apache.spark.sql.functions._
    val clean = graft.ops.Relational.dataQuality(spark, sf0001)
    assert(clean.filter(!col("pass")).isEmpty, "driver corpus must be clean")
    val docs = graft.ops.Core.documents(spark, sf0001)
    // tamper: duplicate 3 doc_ids, corrupt 2 n_chars, 1 off-domain lang.
    // Pin WHICH 3 rows by collecting ids once — an unordered limit(3)
    // evaluated twice may pick different rows per action
    val dupIds = docs.orderBy("doc_id").limit(3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val dups = docs.filter(col("doc_id").isin(dupIds.toSeq: _*))
    val tampered = docs.unionByName(dups)
      .withColumn("n_chars",
        when(col("doc_id") < 2, col("n_chars") + 1).otherwise(col("n_chars")))
      .withColumn("lang", when(col("doc_id") === 7, lit("xx")).otherwise(col("lang")))
      // null policy: unverifiable rows must COUNT as violations (a null
      // lang used to slip through NOT IN's three-valued logic — ADVICE r4)
      .withColumn("lang", when(col("doc_id") === 11, lit(null)).otherwise(col("lang")))
      .withColumn("n_chars", when(col("doc_id") === 12,
        lit(null).cast("long")).otherwise(col("n_chars")))
    val report = graft.ops.Relational.dataQualityFrom(tampered)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(report("doc_id_unique") == 3, s"got $report")
    // the 3 duplicated rows double-count their tampered fields too
    val expChars = 2 + dupIds.count(_ < 2) + 1 + (if (dupIds.contains(12L)) 1 else 0)
    val expLang = 1 + (if (dupIds.contains(7L)) 1 else 0) +
      1 + (if (dupIds.contains(11L)) 1 else 0)
    assert(report("n_chars_consistent") == expChars, s"got $report")
    assert(report("lang_in_domain") == expLang, s"got $report")
    assert(report("doc_id_not_null") == 0 && report("text_nonempty") == 0)
  }

  test("zscore normalize: per-series mean 0, population stddev 1") {
    import org.apache.spark.sql.functions._
    val df = graft.ops.Normalize.zscoreNormalize(spark, sf0001)
    val stats = df.groupBy("event_type")
      .agg(avg("value_z").as("m"), stddev_pop("value_z").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(stats.nonEmpty)
    stats.foreach { case (t, m, s, n) =>
      assert(math.abs(m) < 1e-9, s"$t mean $m")
      assert(math.abs(s - 1.0) < 1e-9, s"$t std $s")
      assert(n > 0)
    }
  }

  test("approx quantile sketch tracks the exact quantiles within rank-error bounds") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val exact = graft.ops.Relational.valueQuantiles(spark, sf0001)
    val approx = graft.ops.Relational.approxValueQuantiles(spark, sf0001, accuracy = 1000)
    val joined = exact.join(approx, "event_type")
      .select(col("event_type"), col("p25"), col("p50"), col("p75"), col("p95"),
        col("quantiles_approx"))
      .as[(String, Double, Double, Double, Double, Seq[Double])].collect()
    assert(joined.nonEmpty)
    // GK sketch at accuracy=1000 bounds RANK error by n/1000; convert to a
    // value-domain check via the per-group value spread (generous, not flaky)
    val spreads = graft.ops.Core.events(spark, sf0001)
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.max("value").as("mx"),
        org.apache.spark.sql.functions.min("value").as("mn"))
      .select(col("event_type"), (col("mx") - col("mn")).as("spread"))
      .as[(String, Double)].collect().toMap
    joined.foreach { case (et, p25, p50, p75, p95, appr) =>
      val tol = spreads(et) * 0.05
      Seq(p25, p50, p75, p95).zip(appr).foreach { case (e, a) =>
        assert(math.abs(a - e) <= tol, s"$et: approx $a vs exact $e (tol $tol)")
      }
    }
  }

  test("sessions partition each user's events and never overlap") {
    import org.apache.spark.sql.functions.{col, sum}
    import spark.implicits._
    val s = graft.ops.Relational.userSessions(spark, sf0001).cache()
    val total = s.agg(sum("n_events")).as[Long].collect()(0)
    assert(total == graft.ops.Core.events(spark, sf0001).count(),
      "every event lands in exactly one session")
    assert(s.filter(col("session_start") > col("session_end")).isEmpty)
    // consecutive sessions of a user are separated by more than the gap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("session_id")
    // compare in microseconds — the gap definition in userSessions;
    // whole-second casts would truncate a genuine 1800.0001s gap to
    // exactly 1800 and spuriously fail against sub-second timestamps
    val um = org.apache.spark.sql.functions.unix_micros _
    val overlap = s.withColumn("prev_end",
        org.apache.spark.sql.functions.lag(col("session_end"), 1).over(w))
      .filter(col("prev_end").isNotNull &&
        um(col("session_start")) - um(col("prev_end")) <= 30L * 60L * 1000000L)
    assert(overlap.isEmpty, "a new session implies a gap > 30 minutes")
  }

  test("bucket-expansion overlap join equals the direct inequality join") {
    import org.apache.spark.sql.functions.{col, least, greatest, unix_micros}
    import spark.implicits._
    val banded = graft.ops.Relational.overlappingSessions(spark, sf0001)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val s = graft.ops.Relational.userSessions(spark, sf0001)
    val direct = s.as("a").join(s.as("b"),
        col("a.user_id") < col("b.user_id") &&
          col("a.session_start") <= col("b.session_end") &&
          col("b.session_start") <= col("a.session_end"))
      .select(col("a.user_id"), col("a.session_id"), col("b.user_id"), col("b.session_id"),
        least(unix_micros(col("a.session_end")), unix_micros(col("b.session_end"))) -
          greatest(unix_micros(col("a.session_start")), unix_micros(col("b.session_start"))))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(banded == direct,
      s"bucket expansion must be exact: ${direct.diff(banded).size} missed, ${banded.diff(direct).size} extra")
    assert(banded.forall(_._5 >= 0), "overlap must be non-negative")
  }

  test("calendar gate keeps exactly the in-session rows of open days") {
    import org.apache.spark.sql.functions._
    val ev = graft.ops.Core.events(spark, sf0001)
    val gated = graft.ops.Relational.calendarGate(spark, sf0001).cache()
    assert(gated.count() > 0, "some events fall inside open sessions")
    assert(gated.count() < ev.count(), "the gate must actually remove rows")
    // every surviving row: weekday, not a synthetic holiday (day 1),
    // and inside the 09:30-16:00 session
    val minutes = hour(col("ts")) * 60 + minute(col("ts"))
    val bad = gated.filter(
      (weekday(col("ts")) + lit(1)) > 5 || dayofmonth(col("ts")) === 1 ||
        minutes < 570 || minutes >= 960)
    assert(bad.isEmpty, "gated rows must all be in-session on open days")
    // and the gate is complete: direct predicate filter gives the same ids
    val direct = ev.filter(
      (weekday(col("ts")) + lit(1)) <= 5 && dayofmonth(col("ts")) =!= 1 &&
        minutes >= 570 && minutes < 960)
    assert(gated.count() == direct.count(), "semi-join equals the direct gate")
  }

  test("feature matrix equals indicators joined with targets on shared columns") {
    import org.apache.spark.sql.functions.col
    val fm = graft.ops.Indicators.featureMatrix(spark, sf0001)
    assert(fm.columns.length == 61, s"expected 61 cols, got ${fm.columns.mkString(",")}")
    val ind = graft.ops.Indicators.indicators(spark, sf0001)
    val tgt = graft.ops.Indicators.targets(spark, sf0001)
      .select("bucket", "up1", "up2", "down1", "down2")
    val joined = ind.join(tgt, "bucket")
      .na.drop(Seq("stoch", "price_change"))
    val shared = joined.columns.toSeq
    assert(fm.select(shared.map(col): _*).exceptAll(joined).isEmpty &&
      joined.exceptAll(fm.select(shared.map(col): _*)).isEmpty,
      "single-pass matrix must equal the view-join form bit-for-bit")
  }

  test("feature matrix book snapshot equals last bookFeatures row per bucket") {
    // Independent derivation: instead of the matrix's max_by aggregation,
    // pick each bucket's max event_id via groupBy and JOIN bookFeatures on
    // it — a different plan shape that must agree bit-for-bit.
    import org.apache.spark.sql.functions._
    val fm = graft.ops.Indicators.featureMatrix(spark, sf0001)
    val featNames = graft.ops.Book.featureNames
    val lastEvent = graft.ops.Core.events(spark, sf0001)
      .groupBy(graft.ops.Core.bucket5m(col("ts")).as("bucket"))
      .agg(max(col("event_id")).as("event_id"))
    val expected = lastEvent
      .join(graft.ops.Book.bookFeatures(spark, sf0001), "event_id")
      .select(col("bucket") +: featNames.map(col): _*)
    val got = fm.select(col("bucket") +: featNames.map(col): _*)
    // fm drops warmup rows, so compare on fm's buckets only
    val exp = expected.join(fm.select("bucket"), "bucket")
    assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty,
      "matrix book block must equal the per-bucket last bookFeatures row")
  }

  test("approx_count_distinct tracks the exact distinct count within rsd bounds") {
    import org.apache.spark.sql.functions.col
    val exact = graft.ops.Relational.distinctUsers(spark, sf0001)
      .select(col("event_type"), col("n_users"))
    val approx = graft.ops.Relational.approxDistinctUsers(spark, sf0001, rsd = 0.05)
    val joined = exact.join(approx, "event_type").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val e = r.getAs[Long]("n_users").toDouble
      val a = r.getAs[Long]("n_users_approx").toDouble
      assert(math.abs(a - e) / e <= 0.25, // 5x the 5% rsd: generous, not flaky
        s"${r.getAs[String]("event_type")}: approx $a vs exact $e")
    }
  }
}
