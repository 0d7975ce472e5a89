package graft

/** Empty-input robustness gate: a 100 TB pipeline constantly meets
  * empty slices — a day with no events, a source with no documents, a
  * fresh shard before first ingest — and an operator that throws on
  * them turns a routine backfill into a paged incident. Every
  * registered query must either produce a (possibly empty) result on
  * an all-empty corpus or appear in the allowlist naming the
  * documented input contract it requires. */
class EmptyInputSpec extends SparkSpec {

  /** Queries whose CONTRACT requires non-empty input, with the reason
    * (each is a `require` in the operator, not an accidental crash). */
  private val emptyAllowed: Map[String, String] = Map(
    "embed_ivf_topk" -> "documented require: the IVF codebook IS corpus rows vec_id < cells — an ANN structure over zero vectors has no semantics",
    "embed_ivf_multiprobe" -> "same ivfScored codebook require",
    "embed_knn_label_ann" -> "same ivfScored codebook require",
    "ivf_index_probe" -> "builds an IVF index first — same codebook require",
    "ivf_append_probe" -> "builds then appends to an IVF index — same codebook require",
    "ivf_tombstone_probe" -> "builds an IVF index then probes it tombstoned — same codebook require",
    "diversity_sample" -> "medoid representatives are per-IVF-cell — same codebook require")

  /** A testdata dir whose every table holds exactly `n` rows of the
    * sf0.001 data (table list shared with Views so new tables are
    * covered automatically). */
  private def degenerateDir(prefix: String, n: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    Views.tables.foreach { t =>
      graft.ops.Core.table(spark, sf0001, t).limit(n)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private lazy val emptyDir: String = degenerateDir("graft_empty", 0)

  test("every registered query handles an all-empty corpus (or documents why not)") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      if (emptyAllowed.contains(name)) None
      else
        try { fn(spark, emptyDir).count(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(100)}")
        }
    }
    assert(failures.isEmpty,
      s"queries that cannot take an empty corpus:\n${failures.mkString("\n")}")
  }

  /** The other degenerate shape: exactly ONE row per table — exercises
    * zero-range windows, self-join emptiness, and every division whose
    * denominator is a count-minus-one. */
  private lazy val oneRowDir: String = degenerateDir("graft_one", 1)

  test("every registered query handles a one-row corpus (or documents why not)") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      if (emptyAllowed.contains(name)) None
      else
        try { fn(spark, oneRowDir).count(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(100)}")
        }
    }
    assert(failures.isEmpty,
      s"queries that cannot take a one-row corpus:\n${failures.mkString("\n")}")
  }

  test("the empty-input allowlist carries no dead entries") {
    // resolve the registry entry OUTSIDE the try: a stale allowlist key
    // for a removed/renamed query would otherwise throw the map lookup
    // inside the catch and masquerade as "still failing" — defeating
    // the test's one purpose
    val stale = emptyAllowed.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"allowlist names unknown queries: $stale")
    // an entry is LIVE if the query fails on EITHER degenerate corpus
    // (ADVICE r8: checking only the empty corpus would flag an entry
    // needed solely for the one-row shape as dead, forcing its removal
    // while the one-row test still requires it)
    val stillFailing = emptyAllowed.keys.filter { name =>
      val fn = SparkEntry.queries(name)
      Seq(emptyDir, oneRowDir).exists { d =>
        try { fn(spark, d).count(); false }
        catch { case _: Throwable => true }
      }
    }
    assert(stillFailing.toSet == emptyAllowed.keySet,
      s"allowlist entries no longer needed (remove them): ${emptyAllowed.keySet -- stillFailing.toSet}")
  }
}
