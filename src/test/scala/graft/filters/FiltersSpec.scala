package graft.filters

import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the four content filters (reference semantics:
  * `utils/filter.py`, golden check `tests/test_aerovaldb.py:670-689`)
  * and the NaN→null JSON policy (`test_aerovaldb.py:453-464`). */
class FiltersSpec extends AnyFunSuite {

  test("filter_regional_stats extracts the nested path") {
    val data = JsonUtil.parse("""{"v": {"n": {"l": {"x": 1}}}}""")
    val out = ContentFilters.filterRegionalStats(data, "v", "n", "l")
    assert(JsonUtil.serialize(out) == """{"x":1}""")
  }

  test("filter_heatmap keeps only region/time leaf but preserves empty shells") {
    val data = JsonUtil.parse(
      """{"v": {"n": {"l": {"m": {"mv": {"r": {"t": 5, "t2": 6}, "r2": {"t": 7}}},
        |                   "m2": {}}}},
        | "v2": {"n2": {}}}""".stripMargin)
    val out = ContentFilters.filterHeatmap(data, "r", "t")
    assert(JsonUtil.serialize(out) ==
      """{"v":{"n":{"l":{"m":{"mv":{"r":{"t":5}}},"m2":{}}}},"v2":{"n2":{}}}""")
  }

  test("filter_contour selects a timestep, identity on None") {
    val data = JsonUtil.parse("""{"t1": {"a": 1}, "t2": {"b": 2}}""")
    assert(JsonUtil.serialize(ContentFilters.filterContour(data, Some("t1"))) == """{"a":1}""")
    assert(ContentFilters.filterContour(data, None) eq data)
    intercept[NoSuchElementException](ContentFilters.filterContour(data, Some("zz")))
  }

  test("filter_map golden check: keeps frequency/season, drops excluded") {
    val data = JsonUtil.parse(
      """[{"station_name": "s", "latitude": 1.0, "other": "drop",
        |  "frequency": {"season": {"x": 1}, "excluded_season": {}},
        |  "excluded_frequency": {}}]""".stripMargin)
    val out = ContentFilters.filterMap(data, Some("frequency"), Some("season"))
    val s = JsonUtil.serialize(out)
    assert(s.contains("season") && !s.contains("excluded_season"))
    assert(!s.contains("excluded_frequency") && !s.contains("other"))
    assert(s.contains("station_name") && s.contains("latitude"))
  }

  test("filter_map both-or-neither validation") {
    val data = JsonUtil.parse("""[]""")
    assert(ContentFilters.filterMap(data, None, None) eq data)
    intercept[IllegalArgumentException](ContentFilters.filterMap(data, Some("f"), None))
    intercept[IllegalArgumentException](ContentFilters.filterMap(data, None, Some("s")))
  }

  test("NaN serializes as null; NaN literals parse") {
    val node = JsonUtil.parse("""{"a": NaN, "b": [1.5, Infinity], "c": 2}""")
    assert(JsonUtil.serialize(node) == """{"a":null,"b":[1.5,null],"c":2}""")
  }
}
