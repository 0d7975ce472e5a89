package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  test("SparkSessionExtensions hook injects poly_hash and dot_product permanently") {
    val prior = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // reuses the test JVM's SparkContext; builds a NEW session so the
    // extensions hook actually runs. withExtensions (not the
    // spark.sql.extensions config) because that config is STATIC —
    // read from the SparkContext's conf — so it cannot take effect on
    // a context that already exists; a real deployment sets
    // spark.sql.extensions=graft.GraftExtensions at launch and goes
    // through the identical injection path.
    val s = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val row = s.sql(
        """SELECT poly_hash('abc') AS h,
          |  dot_product(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
          |              array(CAST(3.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d""".stripMargin)
        .collect()(0)
      // ((0*31+97)%P *31+98)%P *31+99 %P for P=1000003
      val expected = "abc".foldLeft(0L)((acc, c) => (acc * 31 + c) % 1000003L)
      assert(row.getLong(0) == expected)
      assert(row.getDouble(1) == 1.5 * 3.0 + 2.0 * 0.5)
    } finally {
      prior.foreach(SparkSession.setActiveSession)
      prior.foreach(SparkSession.setDefaultSession)
    }
  }
}
