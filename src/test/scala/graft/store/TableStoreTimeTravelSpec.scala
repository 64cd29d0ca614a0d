package graft.store

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Time-travel reads on the append log: a pinned snapshot marker makes
  * every later mutation — overwrite, new asset, delete — invisible,
  * and the current view is unaffected. */
class TableStoreTimeTravelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("reads at a pinned marker see none of the later mutations") {
    val db = new TableStore(spark,
      graft.core.TempDirs.create("graft-travel-spec").toString)
    db.putMenu("""{"gen": 1}""", "p", "e1")
    db.putMenu("""{"doomed": true}""", "p", "e2")
    val snap = db.snapshotSeq()
    assert(db.listAllAsOf(snap).size == 2)

    db.putMenu("""{"gen": 2}""", "p", "e1")
    db.putMenu("""{"late": true}""", "p", "e3")
    val e2Uri = db.listAll().find(_.contains("e2")).get
    db.rmByUri(e2Uri)
    db.flushAll()
    val e1Uri = db.listAll().find(_.contains("e1")).get

    // at the marker: old generation, e2 alive, e3 absent
    assert(db.getByUriAsOf(e1Uri, snap).contains(graft.core.AssetValue.Json("""{"gen": 1}""")))
    assert(db.getByUriAsOf(e2Uri, snap).isDefined)
    assert(db.listAllAsOf(snap).size == 2)
    assert(!db.listAllAsOf(snap).exists(_.contains("e3")))

    // now: new generation, e2 deleted, e3 present
    val now = db.snapshotSeq()
    assert(db.getByUriAsOf(e1Uri, now).contains(graft.core.AssetValue.Json("""{"gen": 2}""")))
    assert(db.getByUriAsOf(e2Uri, now).isEmpty)
    assert(db.listAll().size == 2)
    assert(db.listAll().exists(_.contains("e3")))

    // a second pinned marker between mutations is independently stable
    assert(db.getByUriAsOf(e1Uri, snap).contains(graft.core.AssetValue.Json("""{"gen": 1}""")),
      "the original marker drifted after later writes")
    db.close()
  }

  test("retention vacuum: reads at or after the marker survive, the log shrinks, point reads still prune") {
    val db = new TableStore(spark,
      graft.core.TempDirs.create("graft-vacuum-spec").toString)
    db.putMenu("""{"gen": 1}""", "p", "e1")
    db.putMenu("""{"doomed": true}""", "p", "e2")
    db.putMenu("""{"gen": 2}""", "p", "e1")
    val e2Uri = db.listAll().find(_.contains("e2")).get
    db.rmByUri(e2Uri)
    db.flushAll()
    val marker = db.snapshotSeq()
    db.putMenu("""{"gen": 3}""", "p", "e1")
    db.flushAll()
    val e1Uri = db.listAll().find(_.contains("e1")).get
    val later = db.snapshotSeq()

    def view(m: Long) = (db.getByUriAsOf(e1Uri, m), db.getByUriAsOf(e2Uri, m),
      db.listAllAsOf(m).map(_.takeWhile(_ != '?')).sorted)
    val atMarker = view(marker)
    val atLater = view(later)
    val rowsBefore = spark.read.parquet(s"${db.basedir}/menu").count()

    db.compactRetain("menu", marker)
    assert(view(marker) == atMarker, "marker reads moved across the vacuum")
    assert(view(later) == atLater, "later-marker reads moved across the vacuum")
    val rowsAfter = spark.read.parquet(s"${db.basedir}/menu").count()
    assert(rowsAfter < rowsBefore, s"log did not shrink: $rowsBefore -> $rowsAfter")
    // the vacuumed log keeps compacting: a second retention point at
    // `later` collapses the between-marker history too
    db.compactRetain("menu", later)
    assert(view(later) == atLater)
    assert(spark.read.parquet(s"${db.basedir}/menu").count() <= rowsAfter)
    // current reads are untouched throughout
    assert(db.getByUriAsOf(e1Uri, db.snapshotSeq())
      .contains(graft.core.AssetValue.Json("""{"gen": 3}""")))
    db.close()
  }

  test("blob assets time-travel too: the marker returns the old bytes") {
    val db = new TableStore(spark,
      graft.core.TempDirs.create("graft-travel-blob").toString)
    db.putReportImage(Array[Byte](1, 2, 3), "p", "e", "img.png")
    val snap = db.snapshotSeq()
    db.putReportImage(Array[Byte](9, 9), "p", "e", "img.png")
    db.flushAll()
    val uri = db.listAll().find(_.contains("img")).get
    val asOf = db.getByUriAsOf(uri, snap)
    assert(asOf.exists {
      case graft.core.AssetValue.Blob(b) => b.toSeq == Seq[Byte](1, 2, 3)
      case _ => false
    }, s"blob at marker wrong: $asOf")
    val now = db.getByUriAsOf(uri, db.snapshotSeq())
    assert(now.exists {
      case graft.core.AssetValue.Blob(b) => b.toSeq == Seq[Byte](9, 9)
      case _ => false
    })
    db.close()
  }
}
