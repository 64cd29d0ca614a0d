package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.SparkTestSession

/** Streaming queries against the stored IVF layout (st15): each query
  * is probed independently per microbatch under a once-collected
  * codebook, so the accumulated results must equal the one-shot batch
  * probe of the full query set, be invariant to arrival slicing, and
  * track appends — a query arriving after an append sees the appended
  * vectors. */
class StreamVecQuerySpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq

  test("streamed probe equals the one-shot batch probe; trickle equals one-shot") {
    import java.nio.file.{Files, Paths}
    val tmp = graft.core.TempDirs.create("graft-stream-vec-query-spec")
    val out = s"$tmp/corpus"
    val all = Dedup.normalizedVectors(spark, dir)
    Similarity.writeIvfLayout(all, out, k = 16, iters = 10)

    // one-shot batch probe of the full query set
    val queries = all.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm"))
    val batch = rows(Similarity.ivfStoredTopK(spark, out, queries, k = 10))

    // stream all queries in one microbatch
    val oneShot = s"$tmp/results_oneshot"
    StreamingQueries.vecQueryDrive(spark, dir, out, oneShot, None)
    assert(batch.nonEmpty && rows(spark.read.parquet(oneShot)) == batch,
      "streamed probe diverges from the one-shot batch probe")

    // trickle: queries split across 3 microbatches must accumulate the
    // identical result set
    val staging = s"$tmp/staging"
    spark.read.parquet(s"$dir/embeddings.parquet").repartition(3)
      .write.parquet(staging)
    val parts = Files.list(Paths.get(staging)).toArray.map(_.toString)
      .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS")).sorted
    assert(parts.length == 3)
    parts.zipWithIndex.foreach { case (p, i) =>
      val d = Paths.get(s"$tmp/split$i")
      Files.createDirectories(d)
      Files.move(Paths.get(p), d.resolve("embeddings.parquet"))
    }
    val trickled = s"$tmp/results_trickled"
    StreamingQueries.vecQueryDrive(spark, s"$tmp/split*", out, trickled, Some(1))
    assert(rows(spark.read.parquet(trickled)) == batch,
      "trickled probe diverges from the one-shot batch probe")
  }

  test("queries arriving after an append see the appended vectors") {
    import java.nio.file.Files
    val tmp = graft.core.TempDirs.create("graft-stream-vec-query-append")
    val out = s"$tmp/corpus"
    val all = Dedup.normalizedVectors(spark, dir)
    // base layout: even half only
    Similarity.writeIvfLayout(all.filter(col("vec_id") % 2 === 0), out, k = 16, iters = 10)
    val r1 = s"$tmp/results_before"
    StreamingQueries.vecQueryDrive(spark, dir, out, r1, None)
    val beforeOdd = spark.read.parquet(r1)
      .filter(col("neighbor_id") % 2 =!= 0).count()
    assert(beforeOdd == 0, "probe of the even-only layout returned odd neighbors")
    // append the odd half; a new query batch against the same layout
    // must now retrieve odd neighbors too
    Similarity.appendIvfCorpus(spark, out,
      Tables.embeddings(spark, dir).filter(col("vec_id") % 2 =!= 0))
    val r2 = s"$tmp/results_after"
    StreamingQueries.vecQueryDrive(spark, dir, out, r2, None)
    val after = spark.read.parquet(r2)
    assert(after.count() > 0)
    assert(after.filter(col("neighbor_id") % 2 =!= 0).count() > 0,
      "queries after the append never saw the appended vectors")
  }
}
