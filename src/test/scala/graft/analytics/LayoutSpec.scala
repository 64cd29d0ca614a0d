package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.store.SparkTestSession

/** Contracts for the physical-layout gates (q34/q35/q36) — each one's
  * 100 TB claim, pinned:
  *  - q34: the bucketed fact-fact join runs with NO Exchange — the
  *    co-location is real, not incidental (a broadcast at small SF
  *    would also drop the shuffle; the pinned plan is the one that
  *    survives two large sides);
  *  - q35: the zone-map read SKIPS files — the pruned path reads
  *    strictly fewer files than the layout holds, and still matches
  *    the full-scan answer;
  *  - q36: merge(stored state, delta) == recompute(all) row-for-row,
  *    and the merged read's event-log scan carries the pushed delta
  *    predicate (history comes from state, not a rescan). */
class LayoutSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("q34: bucketed join plans with no Exchange and matches the plain join") {
    val df = Layout.q34BucketedJoin(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the JOIN must not shuffle; the final orderBy's range exchange and
    // the group-by's reuse of bucket partitioning are separate — assert
    // no exchange BELOW the sort-merge join by requiring the join's
    // children to be scan+sort only
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, s"bucketed join did not plan as sort-merge:\n$plan")
    assert(!plan.substring(joinIdx).contains("Exchange hashpartitioning"),
      s"bucketed join still hash-shuffles a side:\n$plan")
    val expected = {
      val l = Tables.lineitem(spark, dir)
      val o = Tables.orders(spark, dir)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(Det.sumDecR(col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("revenue"),
             count(lit(1)).as("n_items"))
        .orderBy("o_orderpriority")
    }
    assert(df.collect().map(_.toSeq).toSeq == expected.collect().map(_.toSeq).toSeq)
  }

  test("q35: zone map skips files; pruned answer equals full scan") {
    val layout = Layout.ensureZonedLayout(spark, dir)
    val allFiles = Layout.zoneMap(spark, layout).count()
    val surviving = Layout.survivingFiles(spark, layout, Layout.ZoneStart, Layout.ZoneEnd)
    assert(surviving.nonEmpty, "zone pruning dropped every file")
    assert(surviving.size < allFiles,
      s"zone pruning skipped nothing: ${surviving.size} of $allFiles files survive " +
      "(the range layout must give the 5-of-30-day predicate files to skip)")
    val pruned = Layout.q35ZonemapPrune(spark, dir).collect().map(_.toSeq).toSeq
    val full = Tables.events(spark, dir)
      .filter(col("ts") >= lit(Layout.ZoneStart).cast("timestamp") &&
              col("ts") <  lit(Layout.ZoneEnd).cast("timestamp"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           Det.sumDecR(col("value"), 2).as("sum_value"))
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    assert(pruned == full)
  }

  test("q37: the coarser rollup never touches the event log") {
    val plan = Layout.q37RollupReuse(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("events.parquet"),
      s"q37 re-scanned the fact table instead of the stored state:\n$plan")
  }

  test("q39: merged day sketches agree with the one-pass sketch and the exact count") {
    val rows = Layout.q39HllState(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (t, exact, merged, direct) =>
      assert(exact > 0)
      // merge-vs-direct gap and merged-vs-exact error both tight
      assert(math.abs(merged - direct).toDouble / exact <= 0.02,
        s"$t: merged $merged vs direct $direct (exact $exact)")
      assert(math.abs(merged - exact).toDouble / exact <= 0.05,
        s"$t: merged $merged vs exact $exact")
    }
  }

  test("q36: merged state+delta equals full recompute; delta scan is pushed") {
    val merged = Layout.q36IncrementalAgg(spark, dir)
    val full = Tables.events(spark, dir)
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
               col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           Det.dround(sum(col("value").cast("decimal(18,6)")).cast("double"), 2).as("sum_value"),
           Det.dround(sum(col("value").cast("decimal(18,6)")).cast("double") / count(lit(1)), 4)
             .as("avg_value"),
           min(col("value")).as("min_value"), max(col("value")).as("max_value"))
      .orderBy("day", "event_type")
    assert(merged.collect().map(_.toSeq).toSeq == full.collect().map(_.toSeq).toSeq)
    // the events scan in the merged plan reads only the delta: the
    // cutoff predicate reaches the parquet scan as a pushed filter
    val plan = merged.queryExecution.executedPlan.toString
    assert("PushedFilters: \\[[^\\]]*ts".r.findFirstIn(plan).isDefined ||
           plan.contains("GreaterThanOrEqual(ts"),
      s"delta cutoff not pushed to the events scan:\n$plan")
  }
}
