package graft.store

import org.apache.spark.sql.SparkSession

/** Engine dispatch — the analogue of the reference's `open(resource)`
  * plugin registry (`/root/reference/src/aerovaldb/plugins.py:14-101`):
  * a named-backend registry plus a resource-string parser.
  *
  * Resource forms (`plugins.py:48-101`):
  *  - `":memory:"` → ephemeral [[TableStore]] (the sqlite in-memory
  *    special case, `plugins.py:74-77`; needs a SparkSession)
  *  - `"json_files:<path>"` → [[JsonFileStore]]
  *  - `"table_store:<path>"` → [[TableStore]] (needs a SparkSession)
  *  - bare `*.db` / `*.sqlite` path → [[TableStore]] (the reference's
  *    sqlite-file extension dispatch, `plugins.py:89-93`)
  *  - any other bare path → JsonFileStore (the reference's default for
  *    a directory path)
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

  private def extension(path: String): String = {
    val name = path.substring(path.lastIndexOf('/') + 1)
    val dot = name.lastIndexOf('.')
    if (dot < 0) "" else name.substring(dot)
  }

  def open(resource: String, spark: Option[SparkSession] = None): AssetStore = {
    val (engine, path) =
      if (resource == ":memory:") ("table_store", ":memory:")
      else resource.split(":", 2) match {
        case Array(e, p) if registry.contains(e) => (e, p)
        // an engine-looking prefix (no path separator) that isn't
        // registered is an error, like the reference's KeyError on
        // `list_engines()[name]` (`plugins.py:79-99`) — a bare path
        // containing ':' past a separator still opens as json_files
        case Array(e, _) if !e.contains('/') && !e.contains('\\') && e.nonEmpty =>
          throw new IllegalArgumentException(
            s"Unknown engine '$e' (available: ${listEngines.mkString(", ")})")
        case _ if Set(".db", ".sqlite").contains(extension(resource)) =>
          ("table_store", resource)
        case _ => ("json_files", resource)
      }
    registry(engine)(path, spark)
  }
}
