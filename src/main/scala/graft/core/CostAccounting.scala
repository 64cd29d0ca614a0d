package graft.core

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Weather-immune per-gate cost counters.
  *
  * The bench box's timing numbers carry ±15% run-to-run noise (CPU
  * steal, write-back stalls — see the weather partition in
  * [[graft.Bench]]), so a *small* structural regression hides inside
  * the weather band until it compounds: the r16 `count()`-per-append
  * tax (one extra Spark job per maintained append, +0.5–2s per gate)
  * was only caught because a per-gate timing diff happened to land in
  * a calm window. Job counts, stage counts and shuffle/input byte
  * totals don't care about CPU steal: for a deterministic gate on
  * fixed input they are the SAME every warm pass, so a +1 in a gate's
  * warm-pass job count is a plan change by construction — no weather
  * attribution needed.
  *
  * One listener instance is registered per JVM ([[install]]);
  * [[snapshot]] drains the listener bus first so the counters reflect
  * every event of the work that has already finished. Deltas between
  * two snapshots bound the cost of the gate that ran in between.
  * Counter maintenance is a handful of atomic adds on the bus thread —
  * nothing here touches the timed path.
  *
  * Cold-pass deltas include once-per-JVM fixture construction
  * (memoized rebuild twins, seed stores) and are therefore NOT stable
  * run-to-run; the stability contract is for warm passes only, where
  * `warm_fixtures` is pinned at 0.000. Streaming gates run a
  * deterministic trickle through `processAllAvailable`, but state
  * store maintenance can contribute jobs on its own cadence, so
  * stability is MEASURED per gate (warm1 == warm2), not assumed:
  * the drift check only fires for gates that prove stable in both
  * the current and the baseline run.
  */
object CostAccounting {

  /** Monotonic counter totals at a point in time (or, via [[diff]],
    * the cost of a bounded span of work). */
  final case class Snapshot(jobs: Long, stages: Long, tasks: Long,
                            shuffleReadB: Long, shuffleWriteB: Long,
                            inputB: Long) {
    def diff(before: Snapshot): Snapshot = Snapshot(
      jobs - before.jobs, stages - before.stages, tasks - before.tasks,
      shuffleReadB - before.shuffleReadB,
      shuffleWriteB - before.shuffleWriteB, inputB - before.inputB)

    def json: String =
      s"""{"jobs":$jobs,"stages":$stages,"tasks":$tasks,""" +
        s""""shuffle_read_b":$shuffleReadB,"shuffle_write_b":$shuffleWriteB,""" +
        s""""input_b":$inputB}"""
  }

  private final class Listener extends SparkListener {
    val jobs = new AtomicLong
    val stages = new AtomicLong
    val tasks = new AtomicLong
    val shuffleRead = new AtomicLong
    val shuffleWrite = new AtomicLong
    val input = new AtomicLong

    override def onJobStart(e: SparkListenerJobStart): Unit = {
      jobs.incrementAndGet(); ()
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet(); ()
    }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      val m = e.taskMetrics
      if (m != null) {
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        input.addAndGet(m.inputMetrics.bytesRead)
        ()
      }
    }
  }

  private var listener: Option[Listener] = None

  /** Register the counting listener on this JVM's SparkContext (at
    * most once; later calls are no-ops so specs sharing the session
    * can install unconditionally). */
  def install(spark: SparkSession): Unit = synchronized {
    if (listener.isEmpty) {
      val l = new Listener
      spark.sparkContext.addSparkListener(l)
      listener = Some(l)
    }
  }

  /** Current counter totals, after draining the listener bus so every
    * event of already-finished work is included. The drain is
    * milliseconds in local mode and runs OUTSIDE any timed region. */
  def snapshot(spark: SparkSession): Snapshot = {
    val l = synchronized(listener).getOrElse(
      throw new IllegalStateException(
        "CostAccounting.snapshot before install"))
    org.apache.spark.graftdiag.BusDiag.waitUntilEmpty(spark.sparkContext)
    Snapshot(l.jobs.get, l.stages.get, l.tasks.get,
      l.shuffleRead.get, l.shuffleWrite.get, l.input.get)
  }
}
