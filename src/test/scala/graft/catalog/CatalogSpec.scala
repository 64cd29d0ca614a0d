package graft.catalog

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Route
import graft.store.{Fixture, JsonFileStore, SparkTestSession}

/** The distributed catalog ingest must agree with the store's own
  * driver-side query() on the same tree. */
class CatalogSpec extends AnyFunSuite {

  test("ingest matches store.query() URIs; catalog filters prune") {
    val dir = Files.createTempDirectory("graft-catalog")
    Fixture.build(dir)
    val spark = SparkTestSession.spark
    val store = new JsonFileStore(dir.toString)

    val catalog = Catalog.ingest(spark, dir.toString).cache()
    val catalogUris = catalog.select("uri").collect().map(_.getString(0)).toSet
    val storeUris = store.listAll().toSet
    assert(catalogUris == storeUris)

    val pruned = Catalog.query(catalog, Seq(Route.MapRoute),
      Map("project" -> "project", "experiment" -> "experiment"))
    assert(pruned.count() == 2)
    assert(Catalog.entries(pruned).forall(_.route == Route.MapRoute))

    val heatmaps = Catalog.query(catalog, Seq(Route.Heatmap))
    assert(heatmaps.count() == 1)

    // persisted metadata table round-trips and still prunes
    val metaPath = Files.createTempDirectory("graft-catalog-meta").resolve("catalog").toString
    Catalog.persist(catalog, metaPath)
    val reloaded = Catalog.load(spark, metaPath)
    assert(reloaded.select("uri").collect().map(_.getString(0)).toSet == catalogUris)
    assert(Catalog.query(reloaded, Seq(Route.MapRoute),
      Map("project" -> "project", "experiment" -> "experiment")).count() == 2)
    store.close()
  }

  test("incremental refresh picks up added and removed assets") {
    val dir = Files.createTempDirectory("graft-catalog-refresh")
    Fixture.build(dir)
    val spark = SparkTestSession.spark
    val prior = Catalog.ingest(spark, dir.toString).cache()
    prior.count()
    // add one asset, remove one
    Files.writeString(dir.resolve("project/experiment/statistics2.json"), "{}")
    Files.move(dir.resolve("project/experiment/statistics2.json"),
      dir.resolve("project/experiment2-statistics.json")) // unparseable name -> skipped
    Files.writeString(dir.resolve("project/experiment/menu2.json"), "{}") // unparseable too
    val db = new graft.store.JsonFileStore(dir.toString)
    db.putMenu("""{"fresh": 1}""", "project", "newexp")
    Files.delete(dir.resolve("project/experiment/menu.json"))
    db.close()
    val counter = spark.sparkContext.longAccumulator("graft.catalog.parsedFiles")
    // cache + single materializing count so the parse stage runs exactly
    // once — the accumulator then IS the number of files parsed
    val refreshed = Catalog.refresh(spark, prior, dir.toString, Some(counter)).cache()
    val refreshedCount = refreshed.count()
    val uris = refreshed.select("uri").collect().map(_.getString(0)).toSet
    assert(uris.exists(_.contains("/menu/project/newexp")))
    assert(!uris.exists(_.contains("/menu/project/experiment?")))
    assert(refreshedCount == prior.count()) // one added, one removed

    // refresh must parse ONLY the changed paths: exactly the listing
    // rows with no (src_path, mtime, size) match in the prior catalog
    val keys = Seq("src_path", "mtime_ms", "size_bytes")
    val expectedChanged = Catalog.listing(spark, dir.toString)
      .join(prior.select(keys.map(org.apache.spark.sql.functions.col): _*), keys, "left_anti")
      .count()
    assert(counter.value == expectedChanged)
    assert(expectedChanged < prior.count()) // strictly fewer than a full re-parse
    refreshed.unpersist()
  }
}
