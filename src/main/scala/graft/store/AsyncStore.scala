package graft.store

import java.time.Instant

import scala.concurrent.{ExecutionContext, Future}

import com.fasterxml.jackson.databind.JsonNode

import graft.core.{AccessType, AssetValue, QueryEntry, Route}

/** Async facade over any [[AssetStore]] — the analogue of the
  * reference's `async_and_sync` dual API (`src/aerovaldb/utils/
  * asyncio.py:23-50`, which wraps EVERY public method): each store
  * method is callable synchronously on the store itself, or as a
  * `Future` through this wrapper. Coverage is the full surface —
  * generic URI get/put, the 24-route typed getters/putters (blob
  * routes included), listings, catalog query, and deletes. */
final class AsyncStore(val store: AssetStore)(implicit ec: ExecutionContext) {

  // ---- generic URI surface ------------------------------------------

  def getByUri(uri: String, accessType: AccessType = AccessType.JsonStr,
               default: Option[AssetValue] = None, cache: Boolean = false): Future[AssetValue] =
    Future(store.getByUri(uri, accessType, default, cache))

  def putByUri(uri: String, obj: String): Future[Unit] = Future(store.putByUri(uri, obj))

  def putBlobByUri(uri: String, obj: Array[Byte]): Future[Unit] =
    Future(store.putBlobByUri(uri, obj))

  def putNode(node: JsonNode, route: Route, routeArgs: Map[String, String],
              kwargs: Map[String, String] = Map.empty): Future[Unit] =
    Future(store.putNode(node, route, routeArgs, kwargs))

  def getExperimentMtime(project: String, experiment: String): Future[Instant] =
    Future(store.getExperimentMtime(project, experiment))

  // ---- catalog / listings / deletes ---------------------------------

  def query(assetTypes: Seq[Route] = Route.all,
            kwargs: Map[String, String] = Map.empty): Future[Seq[QueryEntry]] =
    Future(store.query(assetTypes, kwargs))

  def listAll(): Future[Seq[String]] = Future(store.listAll())

  def listTimeseries(project: String, experiment: String): Future[Seq[String]] =
    Future(store.listTimeseries(project, experiment))

  def listMap(project: String, experiment: String): Future[Seq[String]] =
    Future(store.listMap(project, experiment))

  def listGlobStats(project: String, experiment: String): Future[Seq[String]] =
    Future(store.listGlobStats(project, experiment))

  def listExperiments(project: String, hasResults: Boolean = false): Future[Seq[String]] =
    Future(store.listExperiments(project, hasResults))

  def rmByUri(uri: String): Future[Unit] = Future(store.rmByUri(uri))

  def rmExperimentData(project: String, experiment: String): Future[Unit] =
    Future(store.rmExperimentData(project, experiment))

  // ---- the 24-route typed surface -----------------------------------

  def getGlobStats(project: String, experiment: String, frequency: String,
                   accessType: AccessType = AccessType.JsonStr,
                   default: Option[AssetValue] = None, cache: Boolean = false): Future[AssetValue] =
    Future(store.getGlobStats(project, experiment, frequency, accessType, default, cache))

  def putGlobStats(obj: String, project: String, experiment: String,
                   frequency: String): Future[Unit] =
    Future(store.putGlobStats(obj, project, experiment, frequency))

  def getRegionalStats(project: String, experiment: String, frequency: String,
                       network: String, variable: String, layer: String,
                       accessType: AccessType = AccessType.JsonStr,
                       default: Option[AssetValue] = None): Future[AssetValue] =
    Future(store.getRegionalStats(project, experiment, frequency, network, variable, layer,
      accessType, default))

  def getHeatmap(project: String, experiment: String, frequency: String,
                 region: String, time: String,
                 accessType: AccessType = AccessType.JsonStr,
                 default: Option[AssetValue] = None): Future[AssetValue] =
    Future(store.getHeatmap(project, experiment, frequency, region, time, accessType, default))

  def getContour(project: String, experiment: String, obsvar: String, model: String,
                 timestep: String, accessType: AccessType = AccessType.JsonStr,
                 default: Option[AssetValue] = None, cache: Boolean = false): Future[AssetValue] =
    Future(store.getContour(project, experiment, obsvar, model, timestep,
      accessType, default, cache))

  def putContour(obj: String, project: String, experiment: String, obsvar: String,
                 model: String, timestep: Option[String] = None): Future[Unit] =
    Future(store.putContour(obj, project, experiment, obsvar, model, timestep))

  def getTimeseries(project: String, experiment: String, location: String,
                    network: String, obsvar: String, layer: String,
                    accessType: AccessType = AccessType.JsonStr,
                    default: Option[AssetValue] = None, cache: Boolean = false): Future[AssetValue] =
    Future(store.getTimeseries(project, experiment, location, network, obsvar, layer,
      accessType, default, cache))

  def putTimeseries(obj: String, project: String, experiment: String, location: String,
                    network: String, obsvar: String, layer: String): Future[Unit] =
    Future(store.putTimeseries(obj, project, experiment, location, network, obsvar, layer))

  def getTimeseriesWeekly(project: String, experiment: String, location: String,
                          network: String, obsvar: String, layer: String,
                          accessType: AccessType = AccessType.JsonStr,
                          default: Option[AssetValue] = None,
                          cache: Boolean = false): Future[AssetValue] =
    Future(store.getTimeseriesWeekly(project, experiment, location, network, obsvar, layer,
      accessType, default, cache))

  def putTimeseriesWeekly(obj: String, project: String, experiment: String, location: String,
                          network: String, obsvar: String, layer: String): Future[Unit] =
    Future(store.putTimeseriesWeekly(obj, project, experiment, location, network, obsvar, layer))

  def getExperiments(project: String, accessType: AccessType = AccessType.JsonStr,
                     default: Option[AssetValue] = None, cache: Boolean = false): Future[AssetValue] =
    Future(store.getExperiments(project, accessType, default, cache))

  def putExperiments(obj: String, project: String): Future[Unit] =
    Future(store.putExperiments(obj, project))

  def getConfig(project: String, experiment: String,
                accessType: AccessType = AccessType.JsonStr,
                default: Option[AssetValue] = None, cache: Boolean = false): Future[AssetValue] =
    Future(store.getConfig(project, experiment, accessType, default, cache))

  def putConfig(obj: String, project: String, experiment: String): Future[Unit] =
    Future(store.putConfig(obj, project, experiment))

  def getMenu(project: String, experiment: String,
              accessType: AccessType = AccessType.JsonStr,
              default: Option[AssetValue] = None, cache: Boolean = false): Future[AssetValue] =
    Future(store.getMenu(project, experiment, accessType, default, cache))

  def putMenu(obj: String, project: String, experiment: String): Future[Unit] =
    Future(store.putMenu(obj, project, experiment))

  def getStatistics(project: String, experiment: String,
                    accessType: AccessType = AccessType.JsonStr,
                    default: Option[AssetValue] = None, cache: Boolean = false): Future[AssetValue] =
    Future(store.getStatistics(project, experiment, accessType, default, cache))

  def putStatistics(obj: String, project: String, experiment: String): Future[Unit] =
    Future(store.putStatistics(obj, project, experiment))

  def getRanges(project: String, experiment: String,
                accessType: AccessType = AccessType.JsonStr,
                default: Option[AssetValue] = None, cache: Boolean = false): Future[AssetValue] =
    Future(store.getRanges(project, experiment, accessType, default, cache))

  def putRanges(obj: String, project: String, experiment: String): Future[Unit] =
    Future(store.putRanges(obj, project, experiment))

  def getRegions(project: String, experiment: String,
                 accessType: AccessType = AccessType.JsonStr,
                 default: Option[AssetValue] = None, cache: Boolean = false): Future[AssetValue] =
    Future(store.getRegions(project, experiment, accessType, default, cache))

  def putRegions(obj: String, project: String, experiment: String): Future[Unit] =
    Future(store.putRegions(obj, project, experiment))

  def getModelsStyle(project: String, experiment: Option[String] = None,
                     accessType: AccessType = AccessType.JsonStr,
                     default: Option[AssetValue] = None, cache: Boolean = false): Future[AssetValue] =
    Future(store.getModelsStyle(project, experiment, accessType, default, cache))

  def putModelsStyle(obj: String, project: String,
                     experiment: Option[String] = None): Future[Unit] =
    Future(store.putModelsStyle(obj, project, experiment))

  def getMap(project: String, experiment: String, network: String, obsvar: String,
             layer: String, model: String, modvar: String, time: String,
             frequency: Option[String] = None, season: Option[String] = None,
             accessType: AccessType = AccessType.JsonStr,
             default: Option[AssetValue] = None, cache: Boolean = false): Future[AssetValue] =
    Future(store.getMap(project, experiment, network, obsvar, layer, model, modvar, time,
      frequency, season, accessType, default, cache))

  def putMap(obj: String, project: String, experiment: String, network: String,
             obsvar: String, layer: String, model: String, modvar: String,
             time: String): Future[Unit] =
    Future(store.putMap(obj, project, experiment, network, obsvar, layer, model, modvar, time))

  def getScatter(project: String, experiment: String, network: String, obsvar: String,
                 layer: String, model: String, modvar: String, time: String,
                 accessType: AccessType = AccessType.JsonStr,
                 default: Option[AssetValue] = None, cache: Boolean = false): Future[AssetValue] =
    Future(store.getScatter(project, experiment, network, obsvar, layer, model, modvar, time,
      accessType, default, cache))

  def putScatter(obj: String, project: String, experiment: String, network: String,
                 obsvar: String, layer: String, model: String, modvar: String,
                 time: String): Future[Unit] =
    Future(store.putScatter(obj, project, experiment, network, obsvar, layer, model, modvar, time))

  def getProfiles(project: String, experiment: String, location: String,
                  network: String, obsvar: String,
                  accessType: AccessType = AccessType.JsonStr,
                  default: Option[AssetValue] = None, cache: Boolean = false): Future[AssetValue] =
    Future(store.getProfiles(project, experiment, location, network, obsvar,
      accessType, default, cache))

  def putProfiles(obj: String, project: String, experiment: String, location: String,
                  network: String, obsvar: String): Future[Unit] =
    Future(store.putProfiles(obj, project, experiment, location, network, obsvar))

  def getHeatmapTimeseries(project: String, experiment: String, region: String,
                           network: String, obsvar: String, layer: String,
                           accessType: AccessType = AccessType.JsonStr,
                           default: Option[AssetValue] = None,
                           cache: Boolean = false): Future[AssetValue] =
    Future(store.getHeatmapTimeseries(project, experiment, region, network, obsvar, layer,
      accessType, default, cache))

  def putHeatmapTimeseries(obj: String, project: String, experiment: String, region: String,
                           network: String, obsvar: String, layer: String): Future[Unit] =
    Future(store.putHeatmapTimeseries(obj, project, experiment, region, network, obsvar, layer))

  def getForecast(project: String, experiment: String, region: String,
                  network: String, obsvar: String, layer: String,
                  accessType: AccessType = AccessType.JsonStr,
                  default: Option[AssetValue] = None, cache: Boolean = false): Future[AssetValue] =
    Future(store.getForecast(project, experiment, region, network, obsvar, layer,
      accessType, default, cache))

  def putForecast(obj: String, project: String, experiment: String, region: String,
                  network: String, obsvar: String, layer: String): Future[Unit] =
    Future(store.putForecast(obj, project, experiment, region, network, obsvar, layer))

  def getFairmode(project: String, experiment: String, region: String, network: String,
                  obsvar: String, layer: String, model: String, time: String,
                  accessType: AccessType = AccessType.JsonStr,
                  default: Option[AssetValue] = None, cache: Boolean = false): Future[AssetValue] =
    Future(store.getFairmode(project, experiment, region, network, obsvar, layer, model, time,
      accessType, default, cache))

  def putFairmode(obj: String, project: String, experiment: String, region: String,
                  network: String, obsvar: String, layer: String, model: String,
                  time: String): Future[Unit] =
    Future(store.putFairmode(obj, project, experiment, region, network, obsvar, layer, model, time))

  def getGriddedMap(project: String, experiment: String, obsvar: String, model: String,
                    accessType: AccessType = AccessType.JsonStr,
                    default: Option[AssetValue] = None, cache: Boolean = false): Future[AssetValue] =
    Future(store.getGriddedMap(project, experiment, obsvar, model, accessType, default, cache))

  def putGriddedMap(obj: String, project: String, experiment: String, obsvar: String,
                    model: String): Future[Unit] =
    Future(store.putGriddedMap(obj, project, experiment, obsvar, model))

  def getReport(project: String, experiment: String, title: String,
                accessType: AccessType = AccessType.JsonStr,
                default: Option[AssetValue] = None, cache: Boolean = false): Future[AssetValue] =
    Future(store.getReport(project, experiment, title, accessType, default, cache))

  def putReport(obj: String, project: String, experiment: String, title: String): Future[Unit] =
    Future(store.putReport(obj, project, experiment, title))

  def getReportImage(project: String, experiment: String, path: String): Future[Array[Byte]] =
    Future(store.getReportImage(project, experiment, path))

  def putReportImage(obj: Array[Byte], project: String, experiment: String,
                     path: String): Future[Unit] =
    Future(store.putReportImage(obj, project, experiment, path))

  def getMapOverlay(project: String, experiment: String, source: String,
                    variable: String, date: String): Future[Array[Byte]] =
    Future(store.getMapOverlay(project, experiment, source, variable, date))

  def putMapOverlay(obj: Array[Byte], project: String, experiment: String, source: String,
                    variable: String, date: String): Future[Unit] =
    Future(store.putMapOverlay(obj, project, experiment, source, variable, date))
}

object AsyncStore {
  implicit class Ops(private val store: AssetStore) extends AnyVal {
    /** `store.async` — Future-returning view of the same store. */
    def async(implicit ec: ExecutionContext): AsyncStore = new AsyncStore(store)
  }
}
