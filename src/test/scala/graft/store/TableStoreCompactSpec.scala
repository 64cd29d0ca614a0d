package graft.store

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core.AssetValue

/** compact() rewrites the append log to newest-row-per-key without
  * changing observable contents. */
class TableStoreCompactSpec extends AnyFunSuite {

  test("compaction preserves reads and drops superseded rows") {
    val spark = SparkTestSession.spark
    val db = new TableStore(spark, graft.core.TempDirs.create("graft-compact").toString)
    db.putMenu("""{"v": 1}""", "p", "e")
    db.putMenu("""{"v": 2}""", "p", "e")
    db.putMenu("""{"v": 3}""", "p", "e2")
    db.rmByUri("/v0/menu/p/e2")
    db.flushAll()

    def readAll() = (db.getMenu("p", "e"),
      try { db.getMenu("p", "e2"); "present" } catch { case _: java.io.FileNotFoundException => "absent" })

    val before = readAll()
    assert(before._1 == AssetValue.Json("""{"v": 2}""") && before._2 == "absent")

    db.compact("menu")
    assert(readAll() == before)
    // the log now holds exactly the one live row
    val rows = spark.read.parquet(db.basedir + "/menu").count()
    assert(rows == 1)
    db.close()
  }

  /** The rewrite swap is two renames (live→_old, _compacting→live);
    * a crash between them leaves the table stranded at `_old`. Opening
    * the store must restore it before any read can observe the gap. */
  test("open recovers a rewrite crashed between the two renames") {
    val spark = SparkTestSession.spark
    val basedir = graft.core.TempDirs.create("graft-crash").toString
    val db = new TableStore(spark, basedir)
    db.putMenu("""{"v": 1}""", "p", "e")
    db.flushAll(); db.close()

    // simulate the mid-swap crash state: live dir renamed aside, the
    // rewrite output still sitting at _compacting
    val live = java.nio.file.Paths.get(s"$basedir/menu")
    val old = java.nio.file.Paths.get(s"$basedir/menu_old")
    val tmp = java.nio.file.Paths.get(s"$basedir/menu_compacting")
    Files.move(live, old)
    Files.createDirectories(tmp)
    Files.writeString(tmp.resolve("partial"), "incomplete rewrite")

    val db2 = new TableStore(spark, basedir)
    assert(db2.getMenu("p", "e") == AssetValue.Json("""{"v": 1}"""))
    assert(Files.exists(live) && !Files.exists(old) && !Files.exists(tmp))
    // the healed store compacts normally
    db2.compact("menu")
    assert(db2.getMenu("p", "e") == AssetValue.Json("""{"v": 1}"""))
    db2.close()
  }

  /** A crash AFTER the swap completed (before `_old` cleanup) leaves
    * debris next to a healthy live table: open must clear it without
    * touching the live data. */
  test("open clears completed-swap debris without touching live data") {
    val spark = SparkTestSession.spark
    val basedir = graft.core.TempDirs.create("graft-debris").toString
    val db = new TableStore(spark, basedir)
    db.putMenu("""{"v": 9}""", "p", "e")
    db.flushAll(); db.close()

    val old = java.nio.file.Paths.get(s"$basedir/menu_old")
    Files.createDirectories(old)
    Files.writeString(old.resolve("stale"), "superseded table copy")
    val tmp = java.nio.file.Paths.get(s"$basedir/menu_compacting")
    Files.createDirectories(tmp)

    val db2 = new TableStore(spark, basedir)
    assert(db2.getMenu("p", "e") == AssetValue.Json("""{"v": 9}"""))
    assert(!Files.exists(old) && !Files.exists(tmp))
    db2.close()
  }

  /** compactRetain (av09's vacuum) routes through the same swap —
    * pinned-snapshot reads survive a vacuum that runs on a store
    * healed from a planted crash state. */
  test("retention vacuum on a healed store preserves pinned reads") {
    val spark = SparkTestSession.spark
    val basedir = graft.core.TempDirs.create("graft-heal-vacuum").toString
    val db = new TableStore(spark, basedir)
    db.putMenu("""{"v": 1}""", "p", "e")
    db.putMenu("""{"v": 2}""", "p", "e")
    val marker = db.snapshotSeq()
    db.putMenu("""{"v": 3}""", "p", "e")
    db.flushAll()
    val uri = db.listAll().head.takeWhile(_ != '?')
    db.close()

    // plant completed-swap debris, reopen (heals), then vacuum
    Files.createDirectories(java.nio.file.Paths.get(s"$basedir/menu_compacting"))
    val db2 = new TableStore(spark, basedir)
    val pinnedBefore = db2.getByUriAsOf(uri, marker)
    assert(pinnedBefore.contains(AssetValue.Json("""{"v": 2}""")))
    db2.compactRetain("menu", marker)
    assert(db2.getByUriAsOf(uri, marker) == pinnedBefore)
    assert(db2.getMenu("p", "e") == AssetValue.Json("""{"v": 3}"""))
    db2.close()
  }
}
