package org.apache.spark

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Cumulative task-level I/O counters for the bench artifact: input
  * bytes read, shuffle bytes written/read, and bytes spilled, summed
  * over every completed task since install. Bench snapshots the
  * counters around each query's first rep, so the artifact carries a
  * per-query I/O profile next to the timing — the number that says
  * WHY a query costs what it costs, and the one that predicts scale
  * behavior better than seconds do: at 1000 executors the wall-clock
  * re-shuffles, but bytes-shuffled-per-input-byte is the plan's own
  * constant. A query whose shuffle volume is a large multiple of its
  * input has a scale bottleneck regardless of how fast this box runs
  * it; one whose input bytes exceed its pruned-column expectation is
  * missing pushdown (ScanAuditSpec gates the latter statically; this
  * measures it).
  *
  * Lives in the `org.apache.spark` package for the same reason
  * `GraftIterativeCheckpoint` lives in `o.a.s.sql`: the one
  * synchronization primitive that makes snapshot deltas exact —
  * `SparkContext.listenerBus.waitUntilEmpty` — is `private[spark]`.
  * Listener events are delivered async, so without draining the bus a
  * snapshot taken right after an action returns can miss that
  * action's last task-end events (and mis-attribute them to the NEXT
  * query). Metrics themselves come from the public DeveloperApi
  * `TaskMetrics` on `SparkListenerTaskEnd`.
  *
  * local-mode note: `inputMetrics.bytesRead` counts bytes delivered by
  * the read path (per split), not distinct file bytes — a table read
  * twice counts twice, which is exactly the per-query attribution the
  * bench wants. */
object GraftTaskIO {
  final class Counters private[GraftTaskIO] () extends SparkListener {
    private[GraftTaskIO] val input = new AtomicLong
    private[GraftTaskIO] val shuffleWrite = new AtomicLong
    private[GraftTaskIO] val shuffleRead = new AtomicLong
    private[GraftTaskIO] val spill = new AtomicLong

    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        input.addAndGet(m.inputMetrics.bytesRead)
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        spill.addAndGet(m.diskBytesSpilled)
      }
    }
  }

  /** (input, shuffle write, shuffle read, disk spill) in bytes. */
  final case class Snapshot(input: Long, shuffleWrite: Long,
      shuffleRead: Long, spill: Long) {
    def -(o: Snapshot): Snapshot = Snapshot(input - o.input,
      shuffleWrite - o.shuffleWrite, shuffleRead - o.shuffleRead,
      spill - o.spill)
  }

  def install(spark: SparkSession): Counters = {
    val c = new Counters
    spark.sparkContext.addSparkListener(c)
    c
  }

  /** Drain the listener bus, then read the counters — exact as of
    * every task that has COMPLETED when this is called. A bus that
    * cannot drain in 10s (a stuck listener elsewhere) yields a stale
    * read rather than an exception: I/O attribution is bench
    * evidence, never worth failing the run over. */
  def snapshot(spark: SparkSession, c: Counters): Snapshot = {
    try spark.sparkContext.listenerBus.waitUntilEmpty(10000L)
    catch { case _: java.util.concurrent.TimeoutException => }
    Snapshot(c.input.get, c.shuffleWrite.get, c.shuffleRead.get, c.spill.get)
  }
}
