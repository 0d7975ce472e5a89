package graft

import org.apache.spark.sql.functions._
import graft.ops.{Joins, Normalize}

class JoinsNormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("interval join tolerance is inclusive [ts, ts+3min] within equal buckets") {
    val j = Joins.intervalJoin(spark, sf0001).cache()
    val viol = j.filter(
      $"vix_ts" < $"deep_ts" ||
        $"vix_ts" > $"deep_ts" + expr("INTERVAL 3 MINUTES"))
    assert(viol.isEmpty)
    // bucket equality: floor(deep)/floor(vix) agree
    val bucketViol = j.filter(
      floor(unix_micros($"deep_ts") / 3.0e8) =!= floor(unix_micros($"vix_ts") / 3.0e8))
    assert(bucketViol.isEmpty)
    assert(j.count() > 0)
  }

  test("chunk minmax: max bumped when degenerate (epsilon rule A1)") {
    val p = Normalize.chunkMinmax(spark, sf0001)
    // never equal after the bump
    assert(p.filter($"value_min" === $"value_max").isEmpty)
    assert(p.filter($"value_min" > $"value_max").isEmpty)
  }

  test("minmax normalize bounded in [0, 1] when range is real") {
    val n = Normalize.minmaxNormalize(spark, sf0001)
    assert(n.filter($"value_norm" < 0.0 || $"value_norm" > 1.0).isEmpty)
  }

  test("asof tolerance: fresh matches equal the unbounded asof, stale become null") {
    import org.apache.spark.sql.functions.unix_micros
    val tol = Joins.asofJoinTolerance(spark, sf0001)
    val base = Joins.asofJoinByUser(spark, sf0001)
      .select($"user_id", $"deep_id", $"view_value".as("base_value"))
    val joined = tol.join(base, Seq("user_id", "deep_id")).cache()
    // every surviving match agrees with the unbounded form and is fresh
    assert(joined.filter($"view_value".isNotNull &&
      ($"view_value" =!= $"base_value" ||
        unix_micros($"deep_ts") - unix_micros($"view_ts") > 10L * 60 * 1000000)).isEmpty)
    // tolerance can only REMOVE matches, never invent one
    assert(joined.filter($"view_value".isNotNull && $"base_value".isNull).isEmpty)
    // and it does remove some on this corpus (the bound is not vacuous)
    assert(joined.filter($"view_value".isNull && $"base_value".isNotNull).count() > 0)
    joined.unpersist()
  }
}
