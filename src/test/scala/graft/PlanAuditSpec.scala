package graft

/** Scale-killer regression gate: no registered query may PLAN a
  * quadratic join — CartesianProduct never, BroadcastNestedLoopJoin
  * only where a documented reason bounds one side to scalar/tiny size
  * or the query IS the exact-baseline twin of a banded scale path.
  * A new query that accidentally falls off the equi-join path (a typo
  * in a join key, a non-equi predicate Catalyst can't hash) fails here
  * with its name, instead of surfacing as a bench cliff two rounds
  * later. */
class PlanAuditSpec extends SparkSpec {

  /** BNLJ allowlist — every entry carries the reason its BNLJ is NOT a
    * scale risk (verified against the scaladoc of each operator). */
  private val bnljAllowed: Map[String, String] = Map(
    "stale_filter" -> "scalar broadcast: the 1-row global max-ts bound",
    "stratified_sample" -> "scalar broadcast: the 1-row min-language count",
    "exact_stratified_sample" -> "scalar broadcast: the 1-row min-language count",
    "temperature_sample" -> "scalar broadcast: the 1-row min-language count",
    "doc_keywords" -> "scalar broadcast: the 1-row corpus count N for the idf quotient",
    "source_similarity" -> "pair build over the source LIST (sources^2 rows, corpus-size-independent)",
    "embed_cosine_topk" -> "the documented exact brute-force baseline of the ANN family",
    "embed_knn_label" -> "exact-vote baseline; the labeled seed side is the small broadcastable one",
    "embed_ann_sq8_topk" -> "ADC stage: tiny query set against codes, documented two-stage design",
    "source_drift" -> "aggregate-grid crosses: sources x buckets/langs x the 1-row total — all bounded-cardinality aggregate frames, corpus-size-independent",
    "drift_baseline_merge_probe" -> "the probeDriftBaseline grid cross: batch sources x the few-dozen-row broadcast merged baseline (explicit zero cells for TVD, the source_drift justification over the persisted path)",
    "mixture_plan" -> "scalar broadcast: the 1-row (total_tokens, sqrt_sum) normalizer against the |sources|-row plan table",
    "mixture_gate_probe" -> "scalar broadcast: the 1-row n_min from the persisted baseline's lang rows",
    "zorder_tiles" -> "scalar broadcast: the 1-row min/max bounds both dimensions scale against",
    "epoch_realize" -> "inherits mixture_plan's 1-row normalizer broadcast; the plan side is |sources| rows",
    "doc_attributes" -> "scalar broadcast: the 1-row n_min for the temperature gate (the temperature_sample pattern)")

  test("no registered query plans a cartesian product or an unjustified BNLJ") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf0001).queryExecution.sparkPlan.toString
      val cart = plan.contains("CartesianProduct")
      val bnlj = plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed.contains(name)
      if (cart) Some(s"$name: CartesianProduct")
      else if (bnlj) Some(s"$name: unallowlisted BroadcastNestedLoopJoin")
      else None
    }
    assert(offenders.isEmpty,
      s"quadratic plan shapes detected:\n${offenders.mkString("\n")}")
  }

  test("the BNLJ allowlist carries no dead entries") {
    val stillBnlj = bnljAllowed.keys.filter { name =>
      SparkEntry.queries(name)(spark, sf0001)
        .queryExecution.sparkPlan.toString.contains("BroadcastNestedLoopJoin")
    }
    assert(stillBnlj.toSet == bnljAllowed.keySet,
      s"allowlist entries no longer needed (remove them): ${bnljAllowed.keySet -- stillBnlj}")
  }

  /** Global-window allowlist — a Window with an EMPTY partitionSpec
    * moves the whole input through one task (Spark itself warns "No
    * Partition Defined"), the other single-machine cliff besides a
    * quadratic join. Every entry names why the global order is
    * intentional; each reference-parity one has a partitioned twin. */
  private val globalWindowAllowed: Map[String, String] = Map(
    "indicators" -> "reference-parity single-series frame; partitioned twin = indicators_by_type",
    "feature_matrix" -> "reference-parity single-series training table; partitioned twin = feature_matrix_by_type (r16)",
    "targets" -> "reference-parity single-series labels; partitioned twin = indicators_by_type",
    "window_slices" -> "reference-parity single-series slicing over the one global bar series",
    "asof_join" -> "reference-parity global as-of; partitioned twin = asof_join_by_user",
    "boilerplate_ngrams" -> "rank window over an already-truncated top-20",
    "bpe_token_ids" -> "id-assignment rank over the VOCABULARY aggregate — corpus-size-independent input",
    "packed_token_ids" -> "embeds bpe_token_ids' vocab-sized id-assignment rank; the packing window itself is shard-partitioned",
    "vocab_growth" -> "cumulative sums over the <=64-row log2-bucket aggregate — corpus-size-independent input")

  // detection runs on the OPTIMIZED LOGICAL plan: the AQE-wrapped
  // executedPlan does not traverse into its inner plan pre-execution,
  // which made a physical-node collect silently vacuous (observed)
  test("no registered query plans an unjustified GLOBAL (partition-less) window") {
    import org.apache.spark.sql.catalyst.plans.logical.Window
    // another suite's .cache() would fold subtrees into InMemoryRelation
    // and HIDE their Window nodes from the collect (observed: suite-order
    // flake where feature_matrix's window vanished behind a cached bars
    // fragment) — audit uncached plans only
    spark.catalog.clearCache()
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val globals = fn(spark, sf0001).queryExecution.optimizedPlan.collect {
        case w: Window if w.partitionSpec.isEmpty => w
      }
      if (globals.nonEmpty && !globalWindowAllowed.contains(name))
        Some(s"$name: ${globals.size} global window(s)")
      else None
    }
    assert(offenders.isEmpty,
      s"partition-less windows (single-task at scale) detected:\n${offenders.mkString("\n")}")
  }

  test("1000-series keyed paths keep partitioned windows and never plan a 1-partition exchange") {
    // r17, VERDICT r16 #2: the registered keyed forms run 5 series on
    // the driver corpus; this pins the plan SHAPE at the cardinality
    // the "100 TB form" claim is about — 1000 synthesized symbols.
    // Window partitioning is checked on the optimized logical plan
    // (same AQE/caching rationale as the global-window sweep above);
    // the single-partition check walks the physical plan.
    import org.apache.spark.sql.catalyst.plans.logical.Window
    spark.catalog.clearCache()
    val wide = Seq(
      "indicators_by_1k" -> graft.ops.Indicators.indicatorsByWide(spark, sf0001, 1000),
      "feature_matrix_by_1k" -> graft.ops.Indicators.featureMatrixByWide(spark, sf0001, 1000))
    wide.foreach { case (name, df) =>
      val windows = df.queryExecution.optimizedPlan.collect { case w: Window => w }
      assert(windows.nonEmpty, s"$name: expected window operators")
      val globals = windows.filter(_.partitionSpec.isEmpty)
      assert(globals.isEmpty, s"$name: ${globals.size} partition-less window(s)")
      val singles = df.queryExecution.sparkPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.outputPartitioning.numPartitions == 1 => e
      }
      assert(singles.isEmpty, s"$name: ${singles.size} single-partition exchange(s)")
    }
  }

  test("the global-window allowlist carries no dead entries") {
    import org.apache.spark.sql.catalyst.plans.logical.Window
    spark.catalog.clearCache() // same cached-subtree blindness as above
    val still = globalWindowAllowed.keys.filter { name =>
      SparkEntry.queries(name)(spark, sf0001).queryExecution.optimizedPlan.collect {
        case w: Window if w.partitionSpec.isEmpty => w
      }.nonEmpty
    }
    assert(still.toSet == globalWindowAllowed.keySet,
      s"allowlist entries no longer needed (remove them): ${globalWindowAllowed.keySet -- still}")
  }
}
