package graft

import org.apache.spark.sql.functions._
import graft.ops.Components

/** Pins the convergence bound and correctness of the shared
  * connected-components kernel (ops/Components.scala).
  *
  * The path graph is the adversarial case: pure min-label propagation
  * needs diameter rounds (9,999 on 10,000 nodes), while propagation +
  * pointer doubling (gated to rounds >= 2) is O(log n). The spec pins
  * rounds <= 2*ceil(log2 n) + 1 — the +1 pays for the gated first
  * round — and full cluster correctness against the closed form.
  * The clique test pins the OTHER regime: the registered dup graphs
  * are clique-shaped and must converge in a constant few rounds with
  * the doubling gate keeping round 1 single-join. */
class ComponentsSpec extends SparkSpec {

  test("10k-node path graph: O(log n) rounds, one exact cluster") {
    val n = 10000
    val pairs = spark.range(0, n - 1).toDF("a")
      .select(col("a"), (col("a") + 1).as("b"))
    // localEdgeGate = 0: this test pins the DISTRIBUTED loop's round
    // bound, so the size gate must not short-circuit it
    val (out, rounds) = Components.clusterPairsCounted(pairs, "a", "b", "node_id", None, 0L)
    val bound = 2 * math.ceil(math.log(n) / math.log(2)).toInt + 1
    info(s"path graph n=$n converged in $rounds rounds (bound $bound, propagation alone: ${n - 1})")
    assert(rounds <= bound, s"expected <= $bound rounds, got $rounds")
    val rows = out.collect()
    assert(rows.length == n)
    assert(rows.forall(r => r.getLong(r.fieldIndex("cluster_id")) == 0L))
    assert(rows.forall(r => r.getLong(r.fieldIndex("cluster_size")) == n.toLong))
    val survivors = rows.filter(_.getBoolean(rows.head.fieldIndex("is_survivor")))
    assert(survivors.map(_.getLong(0)).toSeq == Seq(0L))
  }

  test("disjoint cliques: constant rounds, exact min-label membership") {
    // Three cliques {0..9}, {100..109}, {200..204}: every pair an edge.
    val members = Seq(0L until 10L, 100L until 110L, 200L until 205L)
    val pairs = members.flatMap(m =>
      for (a <- m; b <- m if a < b) yield (a, b))
    val df = spark.createDataFrame(pairs).toDF("a", "b")
    val (out, rounds) = Components.clusterPairsCounted(df, "a", "b", "node_id", None, 0L)
    info(s"clique graph converged in $rounds rounds")
    assert(rounds <= 3, s"cliques must converge in <= 3 rounds, got $rounds")
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1)
    val want = members.flatMap(m =>
      m.map(id => (id, m.min, m.size.toLong, id == m.min))).sortBy(_._1)
    assert(got.toSeq == want)
  }

  test("size-gated local union-find: frame-equal to the distributed loop, gate boundary exact") {
    // r15: below DefaultLocalEdgeGate directed edges the kernel runs a
    // driver-local union-find (rounds = 0) instead of the distributed
    // loop — the per-micro-batch regime, where the loop's cost is pure
    // scheduler round-trips. This pins (a) exact frame equality on a
    // MIXED graph (a path, two cliques, a star share one edge list —
    // chain, dense, and skew shapes at once), (b) the gate boundary:
    // gate = |E| takes the local path, gate = |E| - 1 the loop, and
    // (c) the Int-id cast round-trip (the local path collects as Long
    // and must hand back the union-coerced input type).
    val path = (1000L until 1050L).map(i => (i, i + 1))
    val cliques = Seq(0L until 6L, 200L until 210L).flatMap(m =>
      for (a <- m; b <- m if a < b) yield (a, b))
    val star = (300L until 340L).map(i => (299L, i))
    val pairs = spark.createDataFrame(
      scala.util.Random.shuffle(path ++ cliques ++ star)).toDF("a", "b")
    val nEdges = pairs.count()
    val (local, lRounds) = Components.clusterPairsCounted(pairs, "a", "b", "node_id", None, nEdges)
    assert(lRounds == 0, s"gate = |E| must take the local path, got $lRounds rounds")
    val (dist, dRounds) = Components.clusterPairsCounted(pairs, "a", "b", "node_id", None, nEdges - 1)
    assert(dRounds > 0, s"gate = |E| - 1 must take the distributed loop")
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).sorted.toSeq
    assert(snap(local) == snap(dist), "local union-find must equal the distributed loop")
    // Int-typed ids: output comes back Int (the coerced input type)
    val intPairs = pairs.select(col("a").cast("int").as("a"), col("b").cast("int").as("b"))
    val (ilocal, iRounds) = Components.clusterPairsCounted(intPairs, "a", "b", "node_id")
    assert(iRounds == 0)
    assert(ilocal.schema("node_id").dataType == org.apache.spark.sql.types.IntegerType)
    assert(ilocal.schema("cluster_id").dataType == org.apache.spark.sql.types.IntegerType)
    val igot = ilocal.collect()
      .map(r => (r.getInt(0).toLong, r.getInt(1).toLong, r.getLong(2), r.getBoolean(3))).sorted.toSeq
    assert(igot == snap(dist), "Int-id local path must cluster identically")
  }

  test("empty pair set: one round, empty cluster frame (r11 NPE regression)") {
    // A dup-free corpus slice produces ZERO candidate pairs — a valid
    // input to this shared kernel (4 call sites). r11's sum-based
    // convergence witness NPE'd here: sum() over zero rows is SQL
    // NULL, and newSum.compareTo(prevSum) threw on round 1. With the
    // null coalesced to zero, both sums are 0 and the loop converges
    // immediately to the (correct) empty result.
    val empty = spark.range(0).select(col("id").as("a"), col("id").as("b"))
    val (out, rounds) = Components.clusterPairsCounted(empty, "a", "b", "node_id", None, 0L)
    assert(out.count() == 0L)
    assert(rounds == 1, s"empty input must converge on round 1, got $rounds")
    // the size-gated local path handles the empty graph too: zero
    // nodes, an empty frame with the contract schema, rounds = 0
    val (lout, lrounds) = Components.clusterPairsCounted(empty, "a", "b", "node_id")
    assert(lout.count() == 0L && lrounds == 0)
    assert(lout.columns.toSeq == Seq("node_id", "cluster_id", "cluster_size", "is_survivor"))
  }

  test("50k-leaf star: maximum key skew converges in constant rounds, exact") {
    // The skew stress: one hub node carries EVERY edge, so the
    // per-round min-aggregation has one key holding 50k+1 rows — the
    // hot-key shape a production dedup graph takes when a boilerplate
    // document near-dups against everything. groupBy's partial
    // (map-side) aggregation collapses the hot key to one row per
    // input partition before the exchange, so the reduce-side key sees
    // at most numPartitions rows regardless of fan-in — the property
    // that keeps the loop skew-safe at cluster scale. Star diameter is
    // 2, so rounds stay constant; hub id chosen mid-range so min-label
    // propagation actually has to move labels both ways.
    val n = 50000L
    val hub = 25000L
    val pairs = spark.range(0, n + 1).toDF("leaf")
      .filter(col("leaf") =!= hub)
      .select(least(col("leaf"), lit(hub)).as("a"),
        greatest(col("leaf"), lit(hub)).as("b"))
    val (out, rounds) = Components.clusterPairsCounted(pairs, "a", "b", "node_id", None, 0L)
    info(s"star graph n=${n + 1} converged in $rounds rounds")
    assert(rounds <= 3, s"star (diameter 2) must converge in <= 3 rounds, got $rounds")
    val agg = out.agg(
      count(lit(1)), min(col("cluster_id")), max(col("cluster_id")),
      max(col("cluster_size")), sum(when(col("is_survivor"), 1L).otherwise(0L))
    ).head()
    assert(agg.getLong(0) == n + 1, s"every node clustered: $agg")
    assert(agg.getLong(1) == 0L && agg.getLong(2) == 0L, s"single min-label cluster: $agg")
    assert(agg.getLong(3) == n + 1, s"cluster_size = n+1: $agg")
    assert(agg.getLong(4) == 1L, s"exactly one survivor: $agg")
  }

  test("reliable checkpoint mode: identical clusters, loop state on stable storage") {
    // r13 (VERDICT r12 #6): with reliableDir set, every loop table is
    // a parquet round-trip through stable storage, so an executor loss
    // mid-loop recomputes from parquet instead of failing the query.
    // A 1,000-node path graph forces the pointer-doubling rounds, so
    // the rotating label buffers AND the hop path both run reliably.
    val n = 1000
    val pairs = spark.range(0, n - 1).toDF("a")
      .select(col("a"), (col("a") + 1).as("b"))
    val dir = java.nio.file.Files.createTempDirectory("graft_reliable").toString
    val (out, rounds) = Components.clusterPairsCounted(pairs, "a", "b", "node_id", Some(dir))
    // ref must take the distributed loop (gate 0) for the round-count
    // comparison to mean anything; reliable mode never takes the gate
    val (ref, refRounds) = Components.clusterPairsCounted(pairs, "a", "b", "node_id", None, 0L)
    assert(rounds == refRounds,
      s"reliable mode must not change convergence: $rounds vs $refRounds")
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).sorted
    val want = ref.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).sorted
    assert(got.toSeq == want.toSeq, "reliable mode must produce identical clusters")
    // the loop state actually lives under the reliable dir
    val persisted = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(persisted.contains("edges") && persisted.exists(_.startsWith("labels_")),
      s"expected edges + label buffers under $dir, found $persisted")
    // exclusive ownership is ENFORCED (r14, ADVICE r13): re-invoking on
    // the now-populated dir must fail fast, not silently overwrite the
    // previous invocation's state
    val e = intercept[IllegalArgumentException] {
      Components.clusterPairsCounted(pairs, "a", "b", "node_id", Some(dir))
    }
    assert(e.getMessage.contains("non-empty"), s"wrong lock error: ${e.getMessage}")
  }

  test("non-numeric pair columns are rejected with a clear error") {
    // The decimal(38,0) convergence witness silently casts string ids
    // to null; the kernel fails fast instead of converging to garbage.
    val strPairs = spark.createDataFrame(Seq(("a", "b"))).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      Components.clusterPairsCounted(strPairs, "a", "b", "node_id")
    }
    assert(e.getMessage.contains("integral"))
  }

  test("fractional pair columns are rejected (false-convergence guard)") {
    // r13 (ADVICE r12): fractional ids would take the unfused witness,
    // whose decimal(38,0) cast ROUNDS — distinct labels could round to
    // equal values, so the sum could be unchanged while labels moved:
    // silently wrong clusters. The require now matches the fused
    // path's integral contract; scale-0 decimals stay accepted.
    val dblPairs = spark.createDataFrame(Seq((1.5, 2.5))).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      Components.clusterPairsCounted(dblPairs, "a", "b", "node_id")
    }
    assert(e.getMessage.contains("integral"))
    // scale-0 decimal ids remain a valid (unfused-path) input
    val decPairs = spark.createDataFrame(Seq((1L, 2L), (2L, 3L))).toDF("a", "b")
      .select(col("a").cast("decimal(20,0)").as("a"),
        col("b").cast("decimal(20,0)").as("b"))
    val out = Components.clusterPairs(decPairs, "a", "b", "node_id")
    assert(out.count() == 3L)
    assert(out.agg(countDistinct(col("cluster_id"))).head().getLong(0) == 1L)
  }
}
