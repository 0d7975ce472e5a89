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
}
