package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.store.SparkTestSession
import graft.streaming.EventStream

/** st19 contracts: the zone map maintained in-flight equals the
  * batch-built map (min/max/count are commutative — slicing can't
  * move it), and the pruned range query off the streamed map equals
  * both the batch gate and the full scan. */
class ZonemapStreamSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("streamed zone map equals the batch-built map; pruned query matches q35") {
    val layout = Layout.ensureZonedLayout(spark, dir)
    val snapshot = EventStream.runToCompletion(spark,
      StreamingQueries.zonemapStream(_, layout, None), "spec_zonemap_oneshot")
    val batchMap = Layout.zoneMap(spark, layout)
      .orderBy("file").collect().map(_.toSeq).toSeq
    assert(batchMap.nonEmpty &&
      snapshot.orderBy("file").collect().map(_.toSeq).toSeq == batchMap)
    val streamed = StreamingQueries.st19StreamZonemap(spark, dir)
      .collect().map(_.toSeq).toSeq
    val batch = Layout.q35ZonemapPrune(spark, dir).collect().map(_.toSeq).toSeq
    assert(streamed == batch)
  }

  test("one-file-per-microbatch arrival yields the identical map") {
    val layout = Layout.ensureZonedLayout(spark, dir)
    val trickled = EventStream.runToCompletion(spark,
      StreamingQueries.zonemapStream(_, layout, Some(1)), "spec_zonemap_trickle")
      .orderBy("file").collect().map(_.toSeq).toSeq
    val oneShot = EventStream.runToCompletion(spark,
      StreamingQueries.zonemapStream(_, layout, None), "spec_zonemap_oneshot2")
      .orderBy("file").collect().map(_.toSeq).toSeq
    assert(trickled.nonEmpty && trickled == oneShot)
  }
}
