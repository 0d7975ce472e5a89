package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB decomposition of a single registered query — the
  * measurement tool behind the r17 optimization pass. QBench answers
  * "how many seconds"; this answers "which Spark jobs, and how much of
  * the wall clock is driver time BETWEEN jobs" — the dominant question
  * for the probe queries, whose cost is dozens of small actions
  * (state writes, existence checks, collects, checkpoint
  * materializations) rather than one big scan.
  *
  * Usage: runMain graft.JobProfile <sfDir> <query> [reps=2]
  * Warms at the sf0.001 sibling like QBench, runs reps-1 untimed
  * passes (memoized ProbeTemp builds land there), then profiles the
  * LAST rep: one line per job with wall ms, the gap since the previous
  * job ended (pure driver/FS time), task count, and the job
  * description if one was set. Ends with the build/count split and the
  * job-vs-gap totals. */
object JobProfile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: JobProfile <sfDir> <query> [reps]")
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries.get(name).orElse(QBench.variants.get(name))
      .getOrElse(sys.error(s"unknown query '$name'"))
    val warm = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
    if (warm.isDirectory) fn(spark, warm.getPath).count()
    (0 until reps - 1).foreach(_ => fn(spark, sfDir).count())

    // t1 is written by the listener-bus thread and read by the main
    // thread after the drain sleep — volatile for the happens-before
    // edge (a stale read silently dropped the job from job_ms)
    final case class J(id: Int, t0: Long, @volatile var t1: Long, desc: String, tasks: Int)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(js.jobId, J(js.jobId, js.time, -1L, desc,
          js.stageInfos.map(_.numTasks).sum))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        Option(jobs.get(je.jobId)).foreach(_.t1 = je.time)
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val df = fn(spark, sfDir)
    val tBuild = System.nanoTime()
    val n = df.count()
    val t1 = System.nanoTime()
    Thread.sleep(500) // drain the async listener bus
    spark.sparkContext.removeSparkListener(listener)

    import scala.jdk.CollectionConverters._
    val js = jobs.values.asScala.toSeq.sortBy(_.t0)
    var prevEnd = -1L
    var jobMs = 0L
    var gapMs = 0L
    println(f"${"job"}%4s ${"ms"}%7s ${"gap"}%6s ${"tasks"}%5s  description")
    js.foreach { j =>
      val dur = if (j.t1 > 0) j.t1 - j.t0 else -1L
      val gap = if (prevEnd > 0) j.t0 - prevEnd else 0L
      if (dur > 0) jobMs += dur
      gapMs += math.max(gap, 0L)
      prevEnd = math.max(prevEnd, j.t1)
      println(f"${j.id}%4d ${dur}%7d ${gap}%6d ${j.tasks}%5d  ${j.desc.take(90)}")
    }
    println(f"[profile] $name rows=$n jobs=${js.size} " +
      f"job_ms=$jobMs gap_ms=$gapMs " +
      f"build_s=${(tBuild - t0) / 1e9}%.3f count_s=${(t1 - tBuild) / 1e9}%.3f " +
      f"total_s=${(t1 - t0) / 1e9}%.3f")
    spark.stop()
  }
}
