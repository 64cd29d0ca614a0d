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
    val out = Files.createTempDirectory("graft-del-spec").resolve("index").toString
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

  test("p08 incremental maintenance equals the full rebuild, row for row") {
    val inc = Pipeline.p08IncrementalIndex(spark, dir)
      .collect().map(_.toSeq).toSeq
    val rebuild = Pipeline.p08FullRebuildProbe(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(inc.nonEmpty && inc == rebuild)
  }
}
