package graft

import org.apache.spark.sql.SparkSession

/** Streaming-only bench at a chosen state-shuffle width: the
  * measurement tool behind Bench's pinned `spark.sql.shuffle.partitions`
  * for the stateful section (stateful operators pay per-partition
  * state-store overhead every micro-batch, so the right width tracks
  * state volume, not core count — see Bench.streamingBench).
  *
  * Usage: runMain graft.StreamBench [width=8]
  *        runMain graft.StreamBench dag <batches> [width=4]
  *        runMain graft.StreamBench fmby [width=4] [series=64] [bars=60]
  * The first form prints the same one-line streaming JSON as Bench's
  * streaming section. The `dag` form is the r10-verdict #5 probe: it
  * drives the full 9-stateful-op reference DAG with the deep stream
  * forced into EXACTLY <batches> micro-batches (processAllAvailable
  * between chunks), isolating the per-micro-batch cost — incremental
  * planning of the 4-way symmetric-hash join + one state-store
  * commit/snapshot per partition per operator per batch — from the
  * per-event join work.
  *
  * MEASURED (r11, fresh JVM per point, width 4, nDeep = 20,000 after
  * an untimed warm pass, quiet box): batches=1 -> 8.50s (2.35k ev/s),
  * 4 -> 23.2s (0.86k), 16 -> 78.9s (0.25k) — ~4.7s of FIXED cost per
  * additional forced batch cycle ((78.9-8.5)/15) against an ~8.5s
  * floor of per-event work. The DAG's ~2.7k ev/s in Bench is therefore
  * the per-batch-overhead regime, not a per-event join bound: the
  * 9-stateful-op pipeline pays incremental planning + a state-store
  * commit per partition per operator per cycle, and each data batch is
  * followed by a watermark-flush no-data micro-batch that repeats the
  * commit half. Splitting the two (SPARK_GRAFT_NODATA=false suppresses
  * the flush cycle): 16 batches 78.9 -> 45.7s (+73% throughput),
  * 4 batches 23.2 -> 16.1s (+44%) — the flush cycle is ~40% of the
  * fixed cost, the data cycle's plan+commit the other ~2.5s/batch.
  * The levers at scale are batch SIZE (trigger interval) first and
  * the flush cadence second (suppressing no-data batches trades tail
  * output latency of closed windows). RocksDB's lower Bench throughput
  * (~1.9k) is the same fixed cost with a costlier per-batch snapshot.
  *
  * r12 REVISION (dagprofile mode below): once batch cadence is fixed
  * (one data batch), the remaining per-event floor IS join shape —
  * the 4 widening joins + full-row dedup dominate it (aux4+dedup
  * 12.8s vs aux0 0.9s, 20k events). referenceDagPivot removes that
  * floor (measured 2.6x cold; in-Bench dag_tuned ~6.6k ev/s vs ~2.1k
  * for the chain at the same feed). */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val isDag = args.headOption.contains("dag")
    val isProfile = args.headOption.contains("dagprofile")
    val isFmby = args.headOption.contains("fmby")
    val width =
      if (isProfile || isFmby) args.lift(1).getOrElse("4")
      else if (isDag) args.lift(2).getOrElse("4")
      else args.headOption.getOrElse("8")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", width)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // probe knob (SPARK_GRAFT_NODATA=false): suppress the watermark
      // flush micro-batch that follows every data batch, to split the
      // per-batch fixed cost between the data cycle and the flush cycle
      .config("spark.sql.streaming.noDataMicroBatches.enabled",
        sys.env.getOrElse("SPARK_GRAFT_NODATA", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (isProfile) {
      // Locate the DAG's per-event floor: time structural variants of
      // the reference DAG on one 20k-event data batch each (fresh
      // streams per variant, untimed warm pass first), so the cost of
      // each stateful stage is read off the deltas. nAux counts joined
      // aux streams (0..4); dedup toggles the trailing
      // dropDuplicatesWithinWatermark.
      val n = 20000
      for ((nAux, dedup) <- Seq(("4", "full"), ("4", "none"), ("4", "keys"), ("4", "pivot"),
          ("2", "full"), ("1", "full"), ("0", "full"), ("0", "none"))) {
        dagVariant(spark, n / 10, nAux.toInt, dedup) // warm
        val sec = dagVariant(spark, n, nAux.toInt, dedup)
        println(f"""{"variant":"aux${nAux}_dedup_$dedup","sec":$sec%.3f,"events_per_sec":${n / sec}%.1f}""")
      }
    } else if (isFmby) {
      // isolated cold-JVM record for the per-series streaming matrix
      // (r17, VERDICT r16 #1) — the floor-pinning form: one untimed
      // warm pass at few series (absorbs codegen/JIT for the 2-stage
      // keyed stateful plan), then the timed fixture. `series` scales
      // KEY CARDINALITY at fixed per-series depth (bars must stay >=
      // the 35-bar frame so the sliding agg reaches steady state), so
      // total events grow with series and events/s isolates the cost
      // of spreading state over more keys — the 100 TB axis, where
      // series is symbols/sources, not the fixture's 64.
      val series = args.lift(2).map(_.toInt).getOrElse(64)
      val bars = args.lift(3).map(_.toInt).getOrElse(60)
      require(series > 0, s"series must be positive, got $series")
      require(bars >= 35, s"bars must be >= 35 (the sliding frame never " +
        s"reaches steady state below the 35-bar window), got $bars")
      Bench.fmbyBench(spark, nSeries = 8, barsPerSeries = 40,
        queryName = "fmby_warm")
      val (n, sec) = Bench.fmbyBench(spark, nSeries = series, barsPerSeries = bars)
      println(f"""{"metric":"fmby","width":$width,"series":$series,"bars":$bars,"events":$n,"sec":$sec%.3f,"events_per_sec":${n / sec}%.1f}""")
    } else if (isDag) {
      val batches = args(1).toInt
      val nDeep = 20000
      dagForcedBatches(spark, nDeep / 10, math.max(batches / 10, 1)) // untimed JIT warm
      val sec = dagForcedBatches(spark, nDeep, batches)
      println(f"""{"dag_batches":$batches,"width":$width,"deep_events":$nDeep,"sec":$sec%.3f,"events_per_sec":${nDeep / sec}%.1f}""")
    } else {
      val (json, _, _) = Bench.streamingBenchBody(spark)
      println(s"""{"width":$width,"streaming":$json}""")
    }
    spark.stop()
  }

  /** One run of a structural VARIANT of the reference DAG — `nAux`
    * joined aux streams, optional trailing dedup — single data batch,
    * for the dagprofile mode above. */
  private def dagVariant(spark: SparkSession, n: Int, nAux: Int, dedup: String): Double = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingPipeline
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val deepMs = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val auxMs = (1 to nAux).map(_ => MemoryStream[(java.sql.Timestamp, Double)])
    val auxes = auxMs.zipWithIndex.map { case (m, i) =>
      s"aux$i" -> m.toDF().toDF("ts", s"aux${i}_v")
    }
    val deepDf = deepMs.toDF().toDF("event_id", "ts", "event_type", "value")
    val dag = dedup match {
      case "pivot" => StreamingPipeline.referenceDagPivot(deepDf, auxes)
      case "full" => StreamingPipeline.referenceDagJoins(deepDf, auxes)
        .dropDuplicatesWithinWatermark()
      case "keys" => StreamingPipeline.referenceDagJoins(deepDf, auxes)
        .dropDuplicatesWithinWatermark(
          "event_id" +: (0 until nAux).map(i => s"aux${i}_ts"))
      case _ => StreamingPipeline.referenceDagJoins(deepDf, auxes)
    }
    val q = dag.writeStream.format("memory")
      .queryName(s"profile_${n}_${nAux}_$dedup").outputMode("append").start()
    try {
      val t0 = System.nanoTime()
      auxMs.foreach { m =>
        m.addData((0 until n by 300).map(i =>
          (new java.sql.Timestamp(base + i * 1000L + 30000L), i.toDouble)))
      }
      deepMs.addData((0 until n).map { i =>
        (i.toLong, new java.sql.Timestamp(base + i * 1000L), "t" + (i % 4), (i % 1000).toDouble)
      })
      q.processAllAvailable()
      (System.nanoTime() - t0) / 1e9
    } finally q.stop()
  }

  /** One DAG run with the deep stream forced into exactly `batches`
    * micro-batches: all four aux feeds land first (one batch), then
    * each deep chunk is drained with processAllAvailable before the
    * next is added. Same DAG, cadences, and aux density as
    * Bench.streamingBenchBody's runDag. */
  private def dagForcedBatches(spark: SparkSession, n: Int, batches: Int): Double = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingPipeline
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val deepMs = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val auxMs = (1 to 4).map(_ => MemoryStream[(java.sql.Timestamp, Double)])
    val auxes = auxMs.zipWithIndex.map { case (m, i) =>
      s"aux$i" -> m.toDF().toDF("ts", s"aux${i}_v")
    }
    val dag = StreamingPipeline.referenceDag(
      deepMs.toDF().toDF("event_id", "ts", "event_type", "value"), auxes)
    val q = dag.writeStream.format("memory")
      .queryName(s"probe_dag_${n}_$batches").outputMode("append").start()
    try {
      val events = (0 until n).map { i =>
        (i.toLong, new java.sql.Timestamp(base + i * 1000L), "t" + (i % 4), (i % 1000).toDouble)
      }
      val aIdx = 0 until n by 300
      val t0 = System.nanoTime()
      auxMs.foreach { m =>
        m.addData(aIdx.map(i => (new java.sql.Timestamp(base + i * 1000L + 30000L), i.toDouble)))
      }
      q.processAllAvailable()
      events.grouped(math.max(n / batches, 1)).foreach { g =>
        deepMs.addData(g); q.processAllAvailable()
      }
      (System.nanoTime() - t0) / 1e9
    } finally q.stop()
  }
}
