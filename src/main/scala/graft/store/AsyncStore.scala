package graft.store

import scala.concurrent.{ExecutionContext, Future}

import graft.core.{AccessType, AssetValue, QueryEntry, Route}

/** Async facade over any [[AssetStore]] — the analogue of the
  * reference's `async_and_sync` dual API (`src/aerovaldb/utils/
  * asyncio.py:23-50`): every method is callable synchronously on the
  * store itself, or as a `Future` through this wrapper. */
final class AsyncStore(val store: AssetStore)(implicit ec: ExecutionContext) {

  def getByUri(uri: String, accessType: AccessType = AccessType.JsonStr,
               default: Option[AssetValue] = None, cache: Boolean = false): Future[AssetValue] =
    Future(store.getByUri(uri, accessType, default, cache))

  def putByUri(uri: String, obj: String): Future[Unit] = Future(store.putByUri(uri, obj))

  def query(assetTypes: Seq[Route] = Route.all,
            kwargs: Map[String, String] = Map.empty): Future[Seq[QueryEntry]] =
    Future(store.query(assetTypes, kwargs))

  def listAll(): Future[Seq[String]] = Future(store.listAll())

  def getGlobStats(project: String, experiment: String, frequency: String,
                   accessType: AccessType = AccessType.JsonStr,
                   default: Option[AssetValue] = None,
                   cache: Boolean = false): Future[AssetValue] =
    Future(store.getGlobStats(project, experiment, frequency, accessType, default, cache))

  def getHeatmap(project: String, experiment: String, frequency: String,
                 region: String, time: String,
                 accessType: AccessType = AccessType.JsonStr,
                 default: Option[AssetValue] = None): Future[AssetValue] =
    Future(store.getHeatmap(project, experiment, frequency, region, time, accessType, default))

  def rmByUri(uri: String): Future[Unit] = Future(store.rmByUri(uri))
}

object AsyncStore {
  implicit class Ops(private val store: AssetStore) extends AnyVal {
    /** `store.async` — Future-returning view of the same store. */
    def async(implicit ec: ExecutionContext): AsyncStore = new AsyncStore(store)
  }
}
