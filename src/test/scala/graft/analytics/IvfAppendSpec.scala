package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.SparkTestSession

/** Incremental IVF ingest ([[Similarity.appendIvfCorpus]]): appending
  * under the stored codebook must land every vector in the cell a
  * one-shot write with that codebook would have chosen, leave the
  * pruned probe intact, and never rewrite existing data. */
class IvfAppendSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("append == one-shot under the same codebook; base files untouched; probe pruned") {
    import java.nio.file.{Files, Paths}
    val tmp = Files.createTempDirectory("graft-ivf-append-spec")
    val out = s"$tmp/grown"
    val all = Dedup.normalizedVectors(spark, dir)
    Similarity.writeIvfLayout(all.filter(col("vec_id") % 2 === 0), out, k = 8, iters = 5)

    def dataFiles(): Set[String] = {
      val b = Set.newBuilder[String]
      Files.walk(Paths.get(out)).forEach { p =>
        val s = p.toString
        if (s.endsWith(".parquet") && !s.contains("_codebook")) b += s
      }
      b.result()
    }
    val baseFiles = dataFiles()

    Similarity.appendIvfCorpus(spark, out,
      Tables.embeddings(spark, dir).filter(col("vec_id") % 2 =!= 0))

    // 1. base part files survive byte-for-byte untouched (append adds,
    //    never rewrites)
    assert(baseFiles.subsetOf(dataFiles()), "append rewrote existing part files")
    val dataFilesBeforeCompact = dataFiles().size
    assert(dataFilesBeforeCompact > baseFiles.size, "append added no files")

    // 2. every appended vector sits in the cell the stored codebook
    //    assigns — i.e. the grown layout equals a one-shot assignment
    //    of the full corpus under the base codebook
    val cents = Similarity.readIvfCodebook(spark, out)
    val expected = all
      .withColumn("cell", Similarity.cellOf(cents, col("v"), col("norm")))
      .select(col("vec_id"), col("cell"))
    val stored = spark.read.parquet(out).select(col("vec_id"), col("cell"))
    assert(stored.count() == all.count(), "grown layout lost or duplicated vectors")
    assert(stored.exceptAll(expected).isEmpty && expected.exceptAll(stored).isEmpty,
      "appended cell assignments diverge from the one-shot codebook assignment")

    // 3. the pruned probe still carries cell partition filters after
    //    the append (pruning is the point of the layout)
    val queries = spark.read.parquet(out).filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm"))
    val probe = Similarity.ivfStoredTopK(spark, out, queries, k = 5, nProbe = 2)
    val plan = probe.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"probe scan lost its cell PartitionFilters after append:\n$plan")
    val probeRows = probe.collect().map(_.toSeq).toSeq
    assert(probeRows.nonEmpty)

    // 4. compaction rewrites the accumulated files to one per cell
    //    without changing content, and the probe stays pruned
    Similarity.compactIvfCorpus(spark, out)
    val compactedFiles = dataFiles()
    val cellCount = spark.read.parquet(out).select("cell").distinct().count()
    assert(compactedFiles.size <= cellCount,
      s"compaction left ${compactedFiles.size} files for $cellCount cells")
    assert(compactedFiles.size < dataFilesBeforeCompact,
      "compaction did not reduce the live file count")
    val storedAfter = spark.read.parquet(out).select(col("vec_id"), col("cell"))
    assert(storedAfter.exceptAll(expected).isEmpty && expected.exceptAll(storedAfter).isEmpty,
      "compaction changed the stored content")
    // re-derive the query frame: the pre-compaction one holds a stale
    // file index over the swapped-out part files
    val queriesAfter = spark.read.parquet(out).filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm"))
    val probeAfter = Similarity.ivfStoredTopK(spark, out, queriesAfter, k = 5, nProbe = 2)
    assert("PartitionFilters: \\[[^\\]]*cell".r
      .findFirstIn(probeAfter.queryExecution.executedPlan.toString).isDefined,
      "probe scan lost its cell PartitionFilters after compaction")
    assert(probeAfter.collect().map(_.toSeq).toSeq == probeRows,
      "compaction changed probe results")
  }

  test("s11 gate recall floor vs the exact baseline") {
    // the half-corpus codebook costs some recall vs s03's full-corpus
    // fit (0.74 vs 0.78 at sf0.01) — the floor catches a degenerate
    // append (e.g. all vectors dumped in one cell), with headroom for
    // fixture drift only
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().toSeq
        .groupBy(_.getAs[Long]("query_id"))
        .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val exact = topSets(Similarity.s01BruteForceTopK(spark, dir))
    val grown = topSets(Similarity.s11IvfAppend(spark, dir))
    assert(exact.nonEmpty)
    val per = exact.map { case (q, ex) =>
      grown.get(q).map(ap => ap.intersect(ex).size.toDouble / ex.size).getOrElse(0.0)
    }
    val r = per.sum / per.size
    info(s"recall: s11=$r")
    assert(r >= 0.5, s"appended-layout recall too low: $r")
  }
}
