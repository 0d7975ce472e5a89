package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query per implemented operator (SURVEY.md §2) plus its
  * DuckDB oracle SQL. Column names/aliases must match between the two —
  * the driver sorts columns by name before hashing (see builder brief). */
trait QueryModule {
  def queries: Seq[(String, (SparkSession, String) => DataFrame)]
  /** Keys must be a subset of `queries` keys; omit non-SQL-expressible ops. */
  def oracle: Seq[(String, String)]
}
