package graft.store

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core.AssetValue

/** compact() rewrites the append log to newest-row-per-key without
  * changing observable contents. */
class TableStoreCompactSpec extends AnyFunSuite {

  test("compaction preserves reads and drops superseded rows") {
    val spark = SparkTestSession.spark
    val db = new TableStore(spark, Files.createTempDirectory("graft-compact").toString)
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
}
