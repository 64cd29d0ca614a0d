package graft.catalog

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Route
import graft.store.{Fixture, JsonFileStore, SparkTestSession}

/** The distributed catalog ingest must agree with the store's own
  * driver-side query() on the same tree. */
class CatalogSpec extends AnyFunSuite {

  test("ingest matches store.query() URIs; catalog filters prune") {
    val dir = graft.core.TempDirs.create("graft-catalog")
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
    val metaPath = graft.core.TempDirs.create("graft-catalog-meta").resolve("catalog").toString
    Catalog.persist(catalog, metaPath)
    val reloaded = Catalog.load(spark, metaPath)
    assert(reloaded.select("uri").collect().map(_.getString(0)).toSet == catalogUris)
    assert(Catalog.query(reloaded, Seq(Route.MapRoute),
      Map("project" -> "project", "experiment" -> "experiment")).count() == 2)
    store.close()
  }

  test("incremental refresh picks up added and removed assets") {
    val dir = graft.core.TempDirs.create("graft-catalog-refresh")
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

  test("listing round-trips filesystem paths with URI-hostile characters") {
    // binaryFile surfaces paths as URI strings; the decode back to a
    // filesystem path must survive every character the store's
    // ArgCodec can emit into a filename — spaces, percent-escapes
    // (both literal '%' and codec-produced '%XX'), '+', unicode,
    // parens. A double decode would corrupt '%41' into 'A'; a naive
    // java.net.URI parse throws on a raw space.
    val dir = graft.core.TempDirs.create("graft-catalog-paths")
    val names = Seq(
      "plain.json",
      "with space.json",
      "percent%41.json",   // literal %41 — must NOT decode to 'A'
      "raw%sign.json",     // bare % not followed by hex
      "plus+sign.json",
      "at@eq=sign.json",
      "parens(1).json",
      "comma,semi;.json")
    names.foreach(n => Files.writeString(dir.resolve(n), "{}"))
    val spark = SparkTestSession.spark
    val listed = Catalog.listing(spark, dir.toString)
      .select("src_path").collect().map(_.getString(0)).toSet
    val expected = names.map(n => dir.resolve(n).toString).toSet
    assert(listed == expected,
      s"path round trip corrupted:\n  extra=${listed.diff(expected)}\n  missing=${expected.diff(listed)}")
  }

  test("catalog ingest parses assets whose encoded args land odd bytes in filenames") {
    // end-to-end: args that the codec percent-encodes (space, slash,
    // percent) must survive store-write → binaryFile listing →
    // executor reverse-parse → catalog row, and the catalog's meta
    // must equal the original DECODED args
    val dir = graft.core.TempDirs.create("graft-catalog-oddargs")
    val spark = SparkTestSession.spark
    val store = new JsonFileStore(dir.toString)
    val odd = Seq("loc with space", "pct%41", "a/b slash", "plus+and=eq")
    odd.zipWithIndex.foreach { case (loc, i) =>
      store.putTimeseries(s"""{"i": $i}""", "proj", "exp", loc, "net", "var", "layer")
    }
    val catalog = Catalog.ingest(spark, dir.toString)
    val got = Catalog.entries(
        Catalog.query(catalog, Seq(Route.Timeseries), Map("project" -> "proj")))
      .flatMap(_.meta.get("location")).toSet
    assert(got == odd.toSet,
      s"odd-arg round trip corrupted: extra=${got.diff(odd.toSet)}, missing=${odd.toSet.diff(got)}")
    store.close()
  }
}
