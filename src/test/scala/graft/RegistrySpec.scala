package graft

/** Driver-contract invariants: unique names, oracle keys subset,
  * entry smoke, every query runs at sf0.001 with rows >= 0. */
class RegistrySpec extends SparkSpec {

  test("entry returns rows on sf0.001 (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys") {
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }

  test("every query executes at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf0001).count()
      withClue(s"query $name:") { assert(n >= 0) }
    }
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
