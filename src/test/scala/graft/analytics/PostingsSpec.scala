package graft.analytics

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.SparkTestSession

/** The postings-index lifecycle (p10): tombstone → compact → append →
  * incremental df sidecar, pinned against from-scratch rebuilds. */
class PostingsSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long)] =
    df.select("doc_id", "term", "tf").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("maintained postings equal a from-scratch rebuild of snapshot B, row for row") {
    val maintained = Pipeline.p10Maintain(spark, dir)
    val rebuilt = graft.core.TempDirs.create("graft-p10-rebuild")
      .resolve("postings").toString
    TextOps.writePostingsLayout(spark,
      Dedup.cdcSnapshotBText(Tables.documents(spark, dir)), rebuilt)
    val got = rows(TextOps.postingsLive(spark, maintained))
    val want = rows(spark.read.parquet(rebuilt))
    assert(got.nonEmpty && got == want)
    // the incrementally-maintained df sidecar equals the rebuild's
    // recounted one, term for term
    def sidecar(out: String) = TextOps.readDfSidecar(spark, out).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(sidecar(maintained) == sidecar(rebuilt))
    // deleted ids are gone, added ids are present
    val ids = got.map(_._1)
    assert(ids.forall(id => id < 0 || id % 10 != 7), "deleted ids survived")
    assert(ids.exists(_ < 0), "added ids missing")
  }

  test("tombstone/compact/append interleaving: immediate invisibility, epoch boundary, no duplicates") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta beta"), (1L, "beta gamma"),
      (2L, "alpha alpha"), (3L, "delta")).toDF("doc_id", "text")
    val out = graft.core.TempDirs.create("graft-postings-life")
      .resolve("postings").toString
    TextOps.writePostingsLayout(spark, docs, out)
    val before = rows(TextOps.postingsLive(spark, out))
    assert(before.map(_._1) == Set(0L, 1L, 2L, 3L))

    // logical delete: doc 2 vanishes from live reads immediately while
    // its rows are still physically present
    TextOps.deleteFromPostings(spark, out,
      Seq(2L).toDF("doc_id"))
    val live = rows(TextOps.postingsLive(spark, out))
    assert(live == before.filterNot(_._1 == 2L))
    assert(rows(spark.read.parquet(out)).exists(_._1 == 2L),
      "delete touched a postings file before compaction")

    // compaction applies the tombstone physically and clears the sidecar
    TextOps.compactPostings(spark, out)
    assert(rows(spark.read.parquet(out)) == live)
    assert(!Files.exists(Paths.get(out, "_tombstones")))
    // the df sidecar survived the swap verbatim (stale until updated —
    // the maintenance loop owns its refresh)
    assert(Files.exists(Paths.get(out, "_df")))

    // post-boundary re-add of the same id lands exactly once
    TextOps.appendPostings(Seq((2L, "alpha epsilon")).toDF("doc_id", "text"), out)
    val after = rows(TextOps.postingsLive(spark, out))
    assert(after == live ++ Set((2L, "alpha", 1L), (2L, "epsilon", 1L)))

    // generation-scoped tombstones: a delete covering generations ≤ 1
    // followed by a re-append at generation 2 is live IMMEDIATELY —
    // no compaction between them (the streaming maintainer's move)
    TextOps.deleteFromPostings(spark, out, Seq(3L).toDF("doc_id"), uptoGen = 1L)
    assert(!rows(TextOps.postingsLive(spark, out)).exists(_._1 == 3L))
    TextOps.appendPostings(Seq((3L, "zeta zeta")).toDF("doc_id", "text"), out, gen = 2L)
    val reAdded = rows(TextOps.postingsLive(spark, out))
    assert(reAdded.filter(_._1 == 3L) == Set((3L, "zeta", 2L)))
    // and the final compaction applies it all physically
    TextOps.compactPostings(spark, out)
    assert(rows(spark.read.parquet(out)) == reAdded)
    assert(!Files.exists(Paths.get(out, "_tombstones")))
  }

  test("streamed maintenance (st23) equals the batch loop (p10), layout and sidecar") {
    val streamed = StreamingQueries.streamMaintainPostings(spark, dir)
    val batch = Pipeline.p10Maintain(spark, dir)
    val got = rows(TextOps.postingsLive(spark, streamed))
    assert(got.nonEmpty && got == rows(TextOps.postingsLive(spark, batch)))
    def sidecar(out: String) = TextOps.readDfSidecar(spark, out).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(sidecar(streamed) == sidecar(batch))
  }
}
