package graft.store

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.core.AssetValue

/** A failed flush must not lose buffered puts: the snapshot is
  * re-prepended to the pending buffer, so once the fault clears the
  * next flush persists everything in original order.
  */
class FlushRetrySpec extends AnyFunSuite {

  test("buffered rows survive a failing parquet write and flush later") {
    val spark = SparkTestSession.spark
    val db = new TableStore(spark, graft.core.TempDirs.create("graft-flushretry").toString)
    try {
      db.putMenu("""{"v": 1}""", "p", "e")
      db.putMenu("""{"v": 2}""", "p", "e")

      // fault injection: occupy the table's directory path with a
      // regular FILE so the parquet append cannot create it
      val tableDir = Paths.get(db.basedir, "menu")
      Files.writeString(tableDir, "in the way")
      intercept[Throwable](db.flushAll())

      // fault cleared: the retried flush persists the re-buffered rows
      Files.delete(tableDir)
      db.flushAll()
      assert(db.getMenu("p", "e") == AssetValue.Json("""{"v": 2}"""))
      assert(spark.read.parquet(s"${db.basedir}/menu")
        .filter(org.apache.spark.sql.functions.col("op") === "put").count() == 2)
    } finally db.close()
  }
}
