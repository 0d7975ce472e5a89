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
}
