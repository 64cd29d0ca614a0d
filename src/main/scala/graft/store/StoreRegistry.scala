package graft.store

import org.apache.spark.sql.SparkSession

/** Engine dispatch — the analogue of the reference's `open(resource)`
  * plugin registry (`/root/reference/src/aerovaldb/plugins.py:14-101`):
  * a named-backend registry plus a resource-string parser.
  *
  * Resource forms:
  *  - `"json_files:<path>"` → [[JsonFileStore]]
  *  - `"table_store:<path>"` → [[TableStore]] (needs a SparkSession)
  *  - bare path → JsonFileStore (the reference's default for a
  *    directory path)
  */
object StoreRegistry {
  type Factory = (String, Option[SparkSession]) => AssetStore

  private val registry = scala.collection.concurrent.TrieMap[String, Factory](
    "json_files" -> ((path, _) => new JsonFileStore(path)),
    "table_store" -> ((path, spark) => new TableStore(
      spark.getOrElse(throw new IllegalArgumentException(
        "table_store requires a SparkSession")), path)),
  )

  /** Register a custom backend (the reference's entry-point plugin
    * mechanism, `plugins.py:14-45`). */
  def register(name: String, factory: Factory): Unit = registry.put(name, factory)

  def listEngines: Seq[String] = registry.keys.toSeq.sorted

  def open(resource: String, spark: Option[SparkSession] = None): AssetStore = {
    val (engine, path) = resource.split(":", 2) match {
      case Array(e, p) if registry.contains(e) => (e, p)
      case _ => ("json_files", resource)
    }
    registry(engine)(path, spark)
  }
}
