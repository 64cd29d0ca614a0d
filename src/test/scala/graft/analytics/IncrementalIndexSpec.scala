package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.store.SparkTestSession

/** Stored-IVF deletion lifecycle + the p08 maintenance loop:
  *  - a tombstoned id disappears from probes IMMEDIATELY, with no
  *    data file touched;
  *  - compaction applies tombstones physically and clears the
  *    sidecar;
  *  - the full incremental loop (tombstone → compact → re-embed →
  *    append) equals a from-scratch rebuild of the new snapshot under
  *    the same quantizer, row for row. */
class IncrementalIndexSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("tombstones hide ids at probe time; compaction makes it physical") {
    import java.nio.file.{Files, Paths}
    val out = graft.core.TempDirs.create("graft-del-spec").resolve("index").toString
    val vecs = Dedup.normalizedVectors(spark, dir)
    Similarity.writeIvfLayout(vecs, out, k = 8, iters = 5)
    val queries = vecs.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm"))
    val before = Similarity.ivfStoredTopK(spark, out, queries, k = 10)
    val victim = before.filter(col("rnk") === 1)
      .select("neighbor_id").first().getLong(0)

    val dataFiles = () => {
      import scala.jdk.CollectionConverters._
      Files.walk(Paths.get(out)).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") && !p.toString.contains("/_"))
        .toSeq
    }
    val filesBefore = dataFiles().map(_.toString).toSet

    import spark.implicits._
    Similarity.deleteFromIvfCorpus(spark, out, Seq(victim).toDF("vec_id"))
    // immediate: the victim is gone from every probe list
    val after = Similarity.ivfStoredTopK(spark, out, queries, k = 10)
    assert(after.filter(col("neighbor_id") === victim).isEmpty,
      s"tombstoned id $victim still surfaces in probes")
    // and no data file was rewritten
    assert(dataFiles().map(_.toString).toSet == filesBefore,
      "tombstoning touched data files")

    // compaction: row physically gone, sidecar cleared, probes stable
    val afterRows = after.collect().map(_.toSeq).toSeq
    Similarity.compactIvfCorpus(spark, out)
    assert(!Files.isDirectory(Paths.get(s"$out/_tombstones")),
      "compaction left the applied tombstones behind")
    assert(spark.read.parquet(out).filter(col("vec_id") === victim).isEmpty,
      "compaction kept the tombstoned row")
    val afterCompact = Similarity.ivfStoredTopK(spark, out, queries, k = 10)
      .collect().map(_.toSeq).toSeq
    assert(afterCompact == afterRows, "compaction changed probe results")
  }

  test("interleaved delete/append: snapshot probes, same-epoch suppression, post-compact resurrection") {
    import java.nio.file.Files
    import spark.implicits._
    val out = graft.core.TempDirs.create("graft-interleave-spec").resolve("index").toString
    val vecs = Dedup.normalizedVectors(spark, dir)
    val nLive = vecs.count()
    Similarity.writeIvfLayout(vecs, out, k = 8, iters = 5)
    val queries = vecs.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm"))
    val staleProbe = Similarity.ivfStoredTopK(spark, out, queries, k = 10)
    val victim = staleProbe.filter(col("rnk") === 1)
      .select("neighbor_id").first().getLong(0)

    // delete lands AFTER the stale probe's plan was built: the plan's
    // file index is fixed at construction, so the stale probe keeps
    // its snapshot — visibility is probe-CONSTRUCTION order (the
    // single-maintainer contract), never a mid-flight mutation
    Similarity.deleteFromIvfCorpus(spark, out, Seq(victim).toDF("vec_id"))
    assert(staleProbe.filter(col("neighbor_id") === victim).count() > 0,
      "stale probe plan lost its construction-time snapshot")
    // a probe built after the delete hides the id immediately
    assert(Similarity.ivfStoredTopK(spark, out, queries, k = 10)
      .filter(col("neighbor_id") === victim).isEmpty,
      "fresh probe still surfaces the tombstoned id")

    // same-epoch re-append of the tombstoned id: the anti-join
    // suppresses BOTH generations — no resurrection before compaction
    Similarity.appendIvfCorpus(spark, out,
      Tables.embeddings(spark, dir).filter(col("vec_id") === victim))
    assert(Similarity.ivfStoredTopK(spark, out, queries, k = 10)
      .filter(col("neighbor_id") === victim).isEmpty,
      "same-epoch re-append resurrected a tombstoned id")

    // compaction ends the epoch: both generations of the id drop
    // physically and the sidecar clears
    Similarity.compactIvfCorpus(spark, out)
    assert(spark.read.parquet(out).filter(col("vec_id") === victim).isEmpty)

    // a post-compaction append is a new epoch: the id is live again,
    // exactly once, and no other vector was lost along the way
    Similarity.appendIvfCorpus(spark, out,
      Tables.embeddings(spark, dir).filter(col("vec_id") === victim))
    val live = spark.read.parquet(out)
    assert(live.filter(col("vec_id") === victim).count() == 1,
      "post-compaction append did not restore the id exactly once")
    assert(live.count() == nLive, "vectors lost or duplicated across the cycle")
    assert(Similarity.ivfStoredTopK(spark, out, queries, k = 10)
      .filter(col("neighbor_id") === victim).count() > 0,
      "restored id never surfaces in probes again")
  }

  test("p08 incremental maintenance equals the full rebuild, row for row") {
    val inc = Pipeline.p08IncrementalIndex(spark, dir)
      .collect().map(_.toSeq).toSeq
    val rebuild = Pipeline.p08FullRebuildProbe(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(inc.nonEmpty && inc == rebuild)
  }
}
