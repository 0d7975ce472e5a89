package graft

import org.apache.spark.sql.execution.FileSourceScanExec

/** Scan-efficiency regression gate, the I/O sibling of PlanAuditSpec's
  * shuffle gates: at 100 TB the scan IS the dominant cost, and a query
  * that drags unused columns through the parquet reader (or fails to
  * push a selective predicate) pays for it on every run. Column
  * pruning and predicate pushdown are free when the plan stays
  * declarative — this suite pins that they actually happened, so a
  * refactor that breaks pruning (a stray select *, an opaque closure
  * forcing full rows) fails here with the query and column list
  * instead of surfacing as a bench cliff. */
class ScanAuditSpec extends SparkSpec {

  /** The wide base tables where an unpruned scan is a real cost.
    * Deliberately excludes the tiny dims (region 2 cols, nation 3),
    * `embeddings` (3 columns, and the vector column is the payload —
    * nearly every consumer genuinely needs all of them), and the
    * purpose-built temp index dirs the *_probe queries write (their
    * schema IS the probe's working set by construction). */
  private val wideTables =
    Set("documents", "events", "lineitem", "orders", "customer", "part", "supplier")

  /** Queries allowed to read EVERY column of a wide base table, with
    * the reason. Currently empty — no registered query needs one; a
    * future entry must carry its justification like the BNLJ and
    * global-window allowlists. */
  private val fullScanAllowed: Map[String, String] = Map.empty

  /** Plans are deterministic within the suite, and instantiating the
    * *_probe queries eagerly builds their temp-dir indexes/baselines —
    * memoize so each query's (expensive) instantiation happens once
    * across the three tests instead of per test. */
  private val scanCache =
    scala.collection.mutable.Map.empty[String, Seq[FileSourceScanExec]]

  private def scansOf(name: String): Seq[FileSourceScanExec] =
    scanCache.getOrElseUpdate(name,
      SparkEntry.queries(name)(spark, sf0001).queryExecution.sparkPlan.collect {
        case f: FileSourceScanExec => f
      })

  test("no registered query reads the full schema of a wide base table") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      scansOf(name).flatMap { f =>
        val table = f.relation.location.rootPaths.head.getName.stripSuffix(".parquet")
        val total = f.relation.dataSchema.fieldNames.length
        val req = f.requiredSchema.fieldNames
        if (wideTables.contains(table) && req.length >= total &&
            !fullScanAllowed.contains(name))
          Some(s"$name: reads all $total columns of $table (${req.mkString(",")})")
        else None
      }
    }
    assert(offenders.isEmpty,
      s"unpruned wide-table scans detected:\n${offenders.distinct.mkString("\n")}")
  }

  test("the full-scan allowlist carries no dead entries") {
    val still = fullScanAllowed.keys.filter { name =>
      scansOf(name).exists { f =>
        val table = f.relation.location.rootPaths.head.getName.stripSuffix(".parquet")
        wideTables.contains(table) &&
          f.requiredSchema.fieldNames.length >= f.relation.dataSchema.fieldNames.length
      }
    }
    assert(still.toSet == fullScanAllowed.keySet,
      s"allowlist entries no longer needed (remove them): ${fullScanAllowed.keySet -- still.toSet}")
  }

  test("selective predicates reach the parquet scan as data filters") {
    // representative point/range-filter queries: each names the table
    // whose scan must carry a pushed (non-partition) data filter —
    // the planner regression this catches is a filter stranded above
    // an opaque node where the reader can no longer use it
    val expectations: Seq[(String, String)] = Seq(
      "big_orders" -> "orders",        // o_totalprice range predicate
      "stale_filter" -> "events",      // ts staleness bound
      "asof_join" -> "events",         // event_type side split
      "calendar_gate" -> "events",     // event_type gate predicate
      "mixture_gate_probe" -> "documents") // doc_id % 2 probe-half split
    val missing = expectations.flatMap { case (name, table) =>
      val ok = scansOf(name).exists { f =>
        f.relation.location.rootPaths.head.getName.stripSuffix(".parquet") == table &&
          f.dataFilters.nonEmpty
      }
      if (ok) None else Some(s"$name: no data filter reached the $table scan")
    }
    assert(missing.isEmpty, s"pushdown regressions:\n${missing.mkString("\n")}")
  }
}
