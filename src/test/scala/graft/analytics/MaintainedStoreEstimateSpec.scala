package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{SegmentedIndex, TempDirs}
import graft.store.SparkTestSession

/** The compaction policy's metadata-cheap covered-fraction estimate
  * (r14 verdict item 6) against the full-layout anti-join it replaced:
  * on every maintained-store shape the policy actually reads —
  * uniform rows-per-key gen-scoped segments (the kNN edge shape),
  * one-row-per-key (the vector layouts), and the postings layout's
  * sidecar-derived variant — the estimate must EQUAL the exact
  * fraction (to float ulp: the two compute 1 − live/total vs
  * covered/total). The anti-join stays here, spec-side; the
  * measurement path never scans the layout. */
class MaintainedStoreEstimateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val Tol = 1e-12

  private def exactOf(out: String, rowsPerKey: Int): (Double, Double) = {
    val exact = SegmentedIndex.coveredFraction(spark,
      spark.read.parquet(out), out, keyCol = "id", genCol = Some("gen"))
    val est = SegmentedIndex.coveredFractionEstimate(spark,
      spark.read.parquet(out), out, genScoped = true,
      rowsPerInstance = rowsPerKey.toDouble)
    (exact, est)
  }

  test("gen-scoped uniform fan-out: estimate == exact through delete / re-add / re-delete") {
    import spark.implicits._
    val out = TempDirs.create("graft-est-spec").resolve("edges").toString
    // the kNN shape: every (key, generation) stores exactly 2 rows
    SegmentedIndex.appendSegment(
      (1L to 10L).flatMap(i => Seq((i, "a"), (i, "b"))).toDF("id", "payload"),
      out, gen = 0L)
    // epoch 1: tombstone 3 keys at gen 0, re-add one of them at gen 1
    SegmentedIndex.tombstone((1L to 3L).toDF("id"), out, "id", uptoGen = Some(0L))
    SegmentedIndex.appendSegment(
      Seq((2L, "a2"), (2L, "b2")).toDF("id", "payload"), out, gen = 1L)
    val (e1, g1) = exactOf(out, 2)
    assert(math.abs(e1 - g1) < Tol, s"epoch-1 estimate $g1 != exact $e1")
    // epoch 2: re-delete the re-added key (now covering BOTH its
    // generations via two distinct instances) plus a fresh key
    SegmentedIndex.tombstone(Seq(2L, 4L).toDF("id"), out, "id", uptoGen = Some(1L))
    val (e2, g2) = exactOf(out, 2)
    assert(math.abs(e2 - g2) < Tol, s"epoch-2 estimate $g2 != exact $e2")
    assert(g2 > g1, "coverage must grow with the second epoch")
    // a REPLAYED tombstone write changes neither measure
    SegmentedIndex.tombstone(Seq(2L, 4L).toDF("id"), out, "id", uptoGen = Some(1L))
    val (e3, g3) = exactOf(out, 2)
    assert((e3, g3) == (e2, g2), "replayed delete moved the measurement")
  }

  test("plain (epoch-wide) tombstones, one row per key: estimate == exact") {
    import spark.implicits._
    val out = TempDirs.create("graft-est-plain").resolve("corpus").toString
    (1L to 8L).map(i => (i, s"v$i")).toDF("id", "payload")
      .write.parquet(out)
    SegmentedIndex.tombstone((1L to 3L).toDF("id"), out, "id", uptoGen = None)
    val exact = SegmentedIndex.coveredFraction(spark,
      spark.read.parquet(out), out, keyCol = "id", genCol = None)
    val est = SegmentedIndex.coveredFractionEstimate(spark,
      spark.read.parquet(out), out, genScoped = false)
    assert(math.abs(exact - est) < Tol, s"plain estimate $est != exact $exact")
    assert(est == 3.0 / 8)
  }

  test("no tombstones: both measures are 0 with no layout scan needed") {
    import spark.implicits._
    val out = TempDirs.create("graft-est-none").resolve("corpus").toString
    Seq((1L, "x")).toDF("id", "payload").write.parquet(out)
    assert(SegmentedIndex.coveredFractionEstimate(spark,
      spark.read.parquet(out), out, genScoped = false) == 0.0)
    assert(SegmentedIndex.tombstoneInstances(spark, out, genScoped = false) == 0L)
  }

  test("postings sidecar variant: estimate == exact anti-join under the maintainer discipline") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha alpha delta"),
      (3L, "beta beta beta epsilon"), (4L, "gamma delta"),
      (5L, "zeta eta theta iota")).toDF("doc_id", "text")
    val out = TempDirs.create("graft-est-postings").resolve("postings").toString
    TextOps.writePostingsLayout(spark, docs, out)
    // epoch 1: docs 1 and 3 leave; doc 2 is revised
    val dirty = Seq(1L, 2L, 3L).toDF("doc_id")
    val removed = TextOps.postingsOf(
        docs.join(dirty, Seq("doc_id"), "left_semi"))
      .groupBy("term").agg(count(lit(1)).as("n"))
    TextOps.deleteFromPostings(spark, out, dirty, uptoGen = 0L)
    val reTok = Seq((2L, "alpha revised kappa")).toDF("doc_id", "text")
    TextOps.appendPostings(reTok, out, gen = 1L)
    val added = TextOps.postingsOf(reTok)
      .groupBy("term").agg(count(lit(1)).as("n"))
    TextOps.updateDfSidecar(spark, out, removed, added, gen = 1L)
    val est = TextOps.postingsCoveredFraction(spark, out)
    val exact = SegmentedIndex.coveredFraction(spark,
      spark.read.parquet(out), out, keyCol = "doc_id", genCol = Some("gen"))
    assert(math.abs(est - exact) < Tol,
      s"postings sidecar estimate $est != exact $exact")
    assert(est > 0.0)
  }
}
