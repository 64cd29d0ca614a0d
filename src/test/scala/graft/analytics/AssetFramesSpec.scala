package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.store.SparkTestSession

/** The DataFrame-native filters must reproduce the reference filter
  * semantics (incl. heatmap's shell preservation) on whole columns. */
class AssetFramesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val globStats =
    """{"v": {"n": {"l": {"m": {"mv": {"r": {"t": {"x": 5.0}, "t2": {"x": 6.0}},
      |                                "r2": {"t": {"x": 7.0}}},
      |                         "mv2": {"r2": {"t": {"x": 8.0}}}},
      |                   "m2": {}}}},
      | "v2": {"n2": {}}}""".stripMargin

  test("heatmap column filter keeps only region/time, preserves shells") {
    val df = Seq(globStats).toDF("payload")
      .select(AssetFrames.parseGlobStats(col("payload")).as("p"))
      .select(AssetFrames.heatmap(col("p"), "r", "t").as("f"))
    val out = df.select(to_json(col("f"))).head().getString(0)
    assert(out.contains(""""r":{"t":{"x":5.0}}"""))
    assert(!out.contains("t2") && !out.contains("r2"))
    // shells: mv2 empty, m2 empty, v2.n2 empty all preserved
    assert(out.contains(""""mv2":{}""") && out.contains(""""m2":{}"""))
    assert(out.contains(""""v2":{"n2":{}}"""))
  }

  test("regional stats column filter extracts the nested path") {
    val df = Seq(globStats).toDF("payload")
      .select(AssetFrames.parseGlobStats(col("payload")).as("p"))
      .select(to_json(AssetFrames.regionalStats(col("p"), "v", "n", "l")).as("f"))
    val out = df.head().getString(0)
    assert(out.contains("\"m\"") && out.contains("\"m2\"") && !out.contains("\"v2\""))
  }

  test("map stations column filter projects frequency/season") {
    val payload =
      """[{"station_name": "s1", "latitude": 1.0, "longitude": 2.0, "altitude": 3.0,
        |  "region": "reg", "station_display_name": "S1",
        |  "stats": {"Monthly": {"DJF": {"nmb": 0.1}, "JJA": {"nmb": 0.2}},
        |            "Yearly": {"DJF": {"nmb": 0.3}}}}]""".stripMargin
    val df = Seq(payload).toDF("payload")
      .select(AssetFrames.parseMapStations(col("payload")).as("p"))
      .select(to_json(AssetFrames.mapStations(col("p"), "Monthly", "DJF")).as("f"))
    val out = df.head().getString(0)
    assert(out.contains("Monthly") && out.contains("DJF"))
    assert(!out.contains("JJA") && !out.contains("Yearly"))
    assert(out.contains("station_name") && out.contains("s1"))
  }
}
