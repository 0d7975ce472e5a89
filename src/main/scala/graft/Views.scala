package graft

import org.apache.spark.sql.SparkSession
import graft.ops.Core

/** The SQL VIEW surface — the reference's MariaDB view layer
  * (create_database.py:76-190, W1-W8 plus the raw tables) re-expressed
  * as Spark temp views: after `Views.register(spark, dir)`, every
  * declared query is addressable by name from plain SQL —
  * `spark.sql("SELECT * FROM indicators WHERE stoch > 0.8")` — and
  * composes with the raw tables in one statement, exactly how the
  * reference's consumers (the dataloader's chunked SELECTs,
  * predict.py's point lookups) addressed the view layer.
  *
  * Views are LAZY plans, not materializations: querying one runs the
  * registered query's DataFrame plan under Catalyst with the caller's
  * filters/projections pushed into it — a view-plus-WHERE plans the
  * same scan pruning the direct DataFrame composition would (the
  * ScanAuditSpec gates apply unchanged). Registration itself is
  * cheap-but-not-free: the handful of *_probe queries build their
  * temp-dir indexes and the IVF family collects its centroid sample at
  * plan-construction time, so register once per session, not per
  * statement. */
object Views {

  /** The raw testdata tables, view-named as themselves — THE canonical
    * table list (EmptyInputSpec's degenerate-corpus builders reuse it,
    * so a new base table is automatically covered by those gates). */
  private[graft] val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register the raw tables and EVERY declared query as temp views
    * over `dir`. Idempotent (createOrReplaceTempView). */
  def register(spark: SparkSession, dir: String): Unit = {
    tables.foreach(t => Core.table(spark, dir, t).createOrReplaceTempView(t))
    SparkEntry.queries.foreach { case (name, fn) =>
      fn(spark, dir).createOrReplaceTempView(name)
    }
  }
}
