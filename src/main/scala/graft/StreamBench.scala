package graft

import org.apache.spark.sql.SparkSession

/** Streaming-only bench at a chosen state-shuffle width: the
  * measurement tool behind Bench's pinned `spark.sql.shuffle.partitions`
  * for the stateful section (stateful operators pay per-partition
  * state-store overhead every micro-batch, so the right width tracks
  * state volume, not core count — see Bench.streamingBench).
  *
  * Usage: runMain graft.StreamBench [width=8]
  * Prints the same one-line streaming JSON as Bench's streaming section.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val width = args.headOption.getOrElse("8")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", width)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"""{"width":$width,"streaming":${Bench.streamingBenchBody(spark)}}""")
    spark.stop()
  }
}
