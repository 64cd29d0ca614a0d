package graft.core

/** The 24 asset routes (asset types) of the aerovaldb data model.
  *
  * Each route is a URI template whose `{placeholders}` form the
  * composite string key of an asset. Mirrors the reference enum
  * (`/root/reference/src/aerovaldb/routes.py:63-87`).
  */
sealed abstract class Route(val name: String, val template: String) {
  /** Placeholder names, in template order. */
  lazy val argNames: Seq[String] = graft.codec.TemplateCodec.extractSubstitutions(template)
  override def toString: String = name
}

object Route {
  case object GlobStats         extends Route("GLOB_STATS", "/v0/glob_stats/{project}/{experiment}/{frequency}")
  case object RegionalStats     extends Route("REGIONAL_STATS", "/v0/regional_stats/{project}/{experiment}/{frequency}")
  case object Heatmap           extends Route("HEATMAP", "/v0/heatmap/{project}/{experiment}/{frequency}")
  case object Contour           extends Route("CONTOUR", "/v0/contour/{project}/{experiment}/{obsvar}/{model}")
  case object ContourTimesplit  extends Route("CONTOUR_TIMESPLIT", "/v0/contour2/{project}/{experiment}/{obsvar}/{model}/{timestep}")
  case object Timeseries        extends Route("TIMESERIES", "/v0/ts/{project}/{experiment}/{location}/{network}/{obsvar}/{layer}")
  case object TimeseriesWeekly  extends Route("TIMESERIES_WEEKLY", "/v0/ts_weekly/{project}/{experiment}/{location}/{network}/{obsvar}/{layer}")
  case object Experiments       extends Route("EXPERIMENTS", "/v0/experiments/{project}")
  case object Config            extends Route("CONFIG", "/v0/config/{project}/{experiment}")
  case object Menu              extends Route("MENU", "/v0/menu/{project}/{experiment}")
  case object Statistics        extends Route("STATISTICS", "/v0/statistics/{project}/{experiment}")
  case object Ranges            extends Route("RANGES", "/v0/ranges/{project}/{experiment}")
  case object Regions           extends Route("REGIONS", "/v0/regions/{project}/{experiment}")
  case object ModelsStyle       extends Route("MODELS_STYLE", "/v0/model_style/{project}")
  case object MapRoute          extends Route("MAP", "/v0/map/{project}/{experiment}/{network}/{obsvar}/{layer}/{model}/{modvar}")
  case object Scatter           extends Route("SCATTER", "/v0/scat/{project}/{experiment}/{network}/{obsvar}/{layer}/{model}/{modvar}")
  case object Profiles          extends Route("PROFILES", "/v0/profiles/{project}/{experiment}/{location}/{network}/{obsvar}")
  case object HeatmapTimeseries extends Route("HEATMAP_TIMESERIES", "/v0/hm_ts/{project}/{experiment}")
  case object Forecast          extends Route("FORECAST", "/v0/forecast/{project}/{experiment}/{region}/{network}/{obsvar}/{layer}")
  case object Fairmode          extends Route("FAIRMODE", "/v0/fairmode/{project}/{experiment}/{region}/{network}/{obsvar}/{layer}/{model}/{time}")
  case object GriddedMap        extends Route("GRIDDED_MAP", "/v0/gridded_map/{project}/{experiment}/{obsvar}/{model}")
  case object Report            extends Route("REPORT", "/v0/report/{project}/{experiment}/{title}")
  case object ReportImage       extends Route("REPORT_IMAGE", "/v0/report-image/{project}/{experiment}/{path}")
  case object MapOverlay        extends Route("MAP_OVERLAY", "/v0/map-overlay/{project}/{experiment}/{source}/{variable}/{date}")

  /** All routes, in the reference's declaration order (parse_uri tries
    * templates in this order — order is observable behavior). */
  val all: Seq[Route] = Seq(
    GlobStats, RegionalStats, Heatmap, Contour, ContourTimesplit,
    Timeseries, TimeseriesWeekly, Experiments, Config, Menu, Statistics,
    Ranges, Regions, ModelsStyle, MapRoute, Scatter, Profiles,
    HeatmapTimeseries, Forecast, Fairmode, GriddedMap, Report,
    ReportImage, MapOverlay)

  /** Binary (blob) routes; everything else stores JSON documents. */
  val blobRoutes: Set[Route] = Set(ReportImage, MapOverlay)

  private lazy val byName = all.map(r => r.name -> r).toMap
  def fromName(name: String): Route =
    byName.getOrElse(name, throw new IllegalArgumentException(s"Unknown route '$name'"))
}
