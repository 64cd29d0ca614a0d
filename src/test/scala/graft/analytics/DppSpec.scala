package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.SparkTestSession

/** q38 contract: the day set is only known at runtime (aggregate +
  * filter on the dim side), and the fact scan still prunes — Spark's
  * dynamic partition pruning turns the broadcast dim into a partition
  * filter on the day-partitioned fact. */
class DppSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("q38: fact scan carries a dynamic pruning partition filter") {
    val q = Layout.q38DppJoin(spark, dir)
    q.collect() // force execution so reused subqueries resolve
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning expression in the executed plan:\n$plan")
  }

  test("q38: pruned result equals the unpruned two-pass computation") {
    val layout = Layout.ensureDayPartitionedEvents(spark, dir)
    val fact = spark.read.parquet(layout)
    // partition-column type inference reads `day` back as DATE —
    // compare through its string form
    val keep = fact.groupBy("day").agg(count(lit(1)).as("n"))
      .filter(col("n") % 7 < 3)
      .select(col("day").cast("string")).collect().map(_.getString(0)).toSet
    assert(keep.nonEmpty, "dim predicate selected no days — the gate proves nothing")
    val expect = fact.filter(col("day").cast("string").isin(keep.toSeq: _*))
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Layout.q38DppJoin(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }
}
