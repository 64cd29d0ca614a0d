package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.SparkTestSession

/** q40 contract: Z-ordering makes BOTH zone dimensions tight per
  * file, so the 2-predicate query skips files a single-sort layout
  * must read — and the pruned answer equals the full scan. */
class ZorderSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("q40: 2-D zones skip files; pruned answer equals the full scan") {
    val layout = Layout.ensureZorderLayout(spark, dir)
    val all = spark.read.parquet(layout).inputFiles.length
    val uHi = Layout.zUserHi(spark, dir)
    val surv = Layout.zorderSurvivors(spark, layout,
      Layout.ZoneStart, Layout.ZoneEnd, 0L, uHi)
    assert(surv.nonEmpty && surv.length < all,
      s"no skipping: ${surv.length} of $all files survive")
    val full = Tables.events(spark, dir)
      .filter(col("ts") >= lit(Layout.ZoneStart).cast("timestamp") &&
              col("ts") <  lit(Layout.ZoneEnd).cast("timestamp") &&
              col("user_id") >= 0L && col("user_id") < uHi)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val pruned = Layout.q40ZorderSkipping(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pruned == full)
  }

  test("q40: the ts-ranged layout cannot prune on the user dimension") {
    // the same 2-D query against q35's time-ordered layout: every
    // file's user range is full-width, so only the time predicate
    // prunes — the z-layout must survive with at most as many files
    val tsLayout = Layout.ensureZonedLayout(spark, dir)
    val uHi = Layout.zUserHi(spark, dir)
    val tsSurv = Layout.zorderSurvivors(spark, tsLayout,
      Layout.ZoneStart, Layout.ZoneEnd, 0L, uHi)
    val zSurv = Layout.zorderSurvivors(spark, Layout.ensureZorderLayout(spark, dir),
      Layout.ZoneStart, Layout.ZoneEnd, 0L, uHi)
    // normalize by layout file counts: compare the SURVIVING FRACTION
    val tsAll = spark.read.parquet(tsLayout).inputFiles.length.toDouble
    val zAll = spark.read.parquet(Layout.ensureZorderLayout(spark, dir))
      .inputFiles.length.toDouble
    assert(zSurv.length / zAll <= tsSurv.length / tsAll,
      s"z-order fraction ${zSurv.length}/$zAll worse than ts layout ${tsSurv.length}/$tsAll")
  }
}
