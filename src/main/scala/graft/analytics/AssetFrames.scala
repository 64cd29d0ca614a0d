package graft.analytics

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DataFrame-native forms of the content filters (SURVEY.md §2.3):
  * when asset payloads are parsed into typed nested columns, the
  * reference's per-document Python loops become pure Column
  * expressions (`from_json` + `map_filter`/`transform_values`/
  * `transform`) that run inside codegen across a whole DataFrame of
  * assets at once — the shape to use when filtering MILLIONS of
  * documents rather than one.
  *
  * The point-API twin (Jackson AST, schema-on-read, byte-faithful) is
  * [[graft.filters.ContentFilters]].
  */
object AssetFrames {

  /** glob_stats payload type: variable → network → layer → model →
    * modvar → region → time → (stat → value). */
  val globStatsType: DataType = {
    def m(v: DataType) = MapType(StringType, v)
    m(m(m(m(m(m(m(MapType(StringType, DoubleType))))))))
  }

  /** Parse a glob_stats JSON payload column. */
  def parseGlobStats(payload: Column): Column = from_json(payload, globStatsType)

  /** `filter_regional_stats` as a Column: path extraction
    * `payload[variable][network][layer]`. */
  def regionalStats(parsed: Column, variable: String, network: String, layer: String): Column =
    element_at(element_at(element_at(parsed, variable), network), layer)

  /** `filter_heatmap` as a Column: keep only the `[region][time]` leaf
    * under every variable/network/layer/model/modvar, preserving empty
    * shells for branches without the leaf (reference `filter.py:18-46`
    * semantics, expressed with transform_values + map_filter). */
  def heatmap(parsed: Column, region: String, time: String): Column = {
    def leafFilter(modvarVal: Column): Column =
      map_filter(
        transform_values(
          map_filter(modvarVal, (rk, _) => rk === region),
          (_, rv) => map_filter(rv, (tk, _) => tk === time)),
        (_, rv) => size(map_keys(rv)) > 0)
    transform_values(parsed, (_, vVal) =>
      transform_values(vVal, (_, nVal) =>
        transform_values(nVal, (_, lVal) =>
          transform_values(lVal, (_, mVal) =>
            transform_values(mVal, (_, mvVal) => leafFilter(mvVal))))))
  }

  /** map payload type (typed model): per-station fixed fields plus a
    * stats map frequency → season → (stat → value). */
  val mapStationType: DataType = ArrayType(StructType(Seq(
    StructField("station_name", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("altitude", DoubleType),
    StructField("region", StringType),
    StructField("station_display_name", StringType),
    StructField("stats", MapType(StringType,
      MapType(StringType, MapType(StringType, DoubleType)))))))

  def parseMapStations(payload: Column): Column = from_json(payload, mapStationType)

  /** `filter_map` as a Column: per station keep the fixed fields and
    * only `[frequency][season]` of the stats map. */
  def mapStations(parsed: Column, frequency: String, season: String): Column =
    transform(parsed, st => struct(
      st.getField("station_name").as("station_name"),
      st.getField("latitude").as("latitude"),
      st.getField("longitude").as("longitude"),
      st.getField("altitude").as("altitude"),
      st.getField("region").as("region"),
      st.getField("station_display_name").as("station_display_name"),
      transform_values(
        map_filter(st.getField("stats"), (fk, _) => fk === frequency),
        (_, fv) => map_filter(fv, (sk, _) => sk === season)).as("stats")))

  /** `filter_contour` as a Column: timestep selection on a parsed
    * timestep → geojson-string map. */
  def contourTimestep(parsed: Column, timestep: String): Column =
    element_at(parsed, timestep)
}
