package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.store.SparkTestSession

/** The determinism contract [[CostAccounting]] sells to the bench:
  * for the same work on the same input, the job/stage/task deltas are
  * IDENTICAL run-to-run — that exactness is what lets Bench flag a
  * one-job change as a plan regression with no weather partition. */
class CostAccountingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def shuffleWork(): Long = {
    import org.apache.spark.sql.functions._
    spark.range(0, 10000, 1, 4)
      .groupBy((org.apache.spark.sql.functions.col("id") % 17).as("k"))
      .agg(sum("id").as("s"), count(lit(1)).as("n"))
      .filter(col("s") > 0)
      .count()
  }

  test("identical work yields identical job/stage/task deltas; bytes flow through the shuffle counters") {
    CostAccounting.install(spark)
    // prime once: first execution may pay one-time classloading paths
    // that change nothing structural but could in principle lazy-init
    // an extra action somewhere outside the measured query
    shuffleWork()

    val s0 = CostAccounting.snapshot(spark)
    shuffleWork()
    val s1 = CostAccounting.snapshot(spark)
    shuffleWork()
    val s2 = CostAccounting.snapshot(spark)

    val a = s1.diff(s0)
    val b = s2.diff(s1)
    assert(a.jobs > 0, s"no jobs observed: $a")
    assert(a.tasks > 0 && a.stages > 0, s"no stages/tasks observed: $a")
    // groupBy over 4 input partitions must move bytes through the
    // shuffle on both the write and read side
    assert(a.shuffleWriteB > 0 && a.shuffleReadB > 0, s"no shuffle bytes: $a")
    assert(a.jobs == b.jobs, s"job delta not deterministic: $a vs $b")
    assert(a.stages == b.stages, s"stage delta not deterministic: $a vs $b")
    assert(a.tasks == b.tasks, s"task delta not deterministic: $a vs $b")
  }

  test("install is idempotent: a second install does not double-count") {
    CostAccounting.install(spark)
    val s0 = CostAccounting.snapshot(spark)
    shuffleWork()
    val s1 = CostAccounting.snapshot(spark)
    val once = s1.diff(s0)
    CostAccounting.install(spark) // must be a no-op
    val s2 = CostAccounting.snapshot(spark)
    shuffleWork()
    val s3 = CostAccounting.snapshot(spark)
    val after = s3.diff(s2)
    assert(once.jobs == after.jobs,
      s"second install changed the job delta: $once vs $after")
  }

  test("snapshot json round-trips through Jackson with the receipt's field names") {
    val snap = CostAccounting.Snapshot(3, 7, 42, 1024, 2048, 4096)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val n = om.readTree(snap.json)
    assert(n.path("jobs").asLong() == 3)
    assert(n.path("stages").asLong() == 7)
    assert(n.path("tasks").asLong() == 42)
    assert(n.path("shuffle_read_b").asLong() == 1024)
    assert(n.path("shuffle_write_b").asLong() == 2048)
    assert(n.path("input_b").asLong() == 4096)
  }
}
