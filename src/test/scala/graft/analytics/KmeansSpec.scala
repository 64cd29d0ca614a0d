package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

import graft.store.SparkTestSession

/** Semantic contract of the fully-distributed k-means (s08):
  * Lloyd's objective must not increase, the clusters must partition
  * the corpus, and — because the update sums in DECIMAL — the whole
  * result must be independent of how the corpus is partitioned. */
class KmeansSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("objective trace is monotone non-increasing") {
    val (_, _, trace) =
      Similarity.kmeansFit(Dedup.normalizedVectors(spark, dir), k = 16, iters = 5,
        trace = true)
    assert(trace.length == 5)
    trace.sliding(2).foreach { case Seq(a, b) =>
      // per-row rounding at 1e-6 bounds the FP slack of the comparison
      assert(b <= a + 1e-6, s"objective increased: $trace")
    }
    // and it actually moved — a frozen trace would mean the update is a no-op
    assert(trace.last < trace.head, s"objective never improved: $trace")
    spark.catalog.clearCache()
  }

  test("clusters partition the corpus") {
    val corpus = Dedup.normalizedVectors(spark, dir)
    val n = corpus.count()
    val stats = Similarity.s08KmeansClusters(spark, dir).collect()
    assert(stats.map(_.getLong(1)).sum == n, "cluster sizes don't sum to the corpus")
    val cells = stats.map(_.getLong(0))
    assert(cells.distinct.length == cells.length && cells.length <= 16)
    spark.catalog.clearCache()
  }

  test("result is independent of input partitioning") {
    // decimal component sums make every Lloyd update exact, so the
    // fitted centroids — and with them every assignment and stat —
    // must be bit-identical whatever the parallelism. With double
    // sums this test flakes on boundary vectors.
    def run(parts: Int): Seq[Seq[Any]] = {
      val corpus = Dedup.normalizedVectors(spark, dir).repartition(parts)
      val (assigned, _, _) = Similarity.kmeansFit(corpus, k = 16, iters = 5)
      import org.apache.spark.sql.functions._
      val out = assigned
        .groupBy(col("cell").cast("long").as("cell"))
        .agg(count(lit(1)).as("n_vecs"),
             Det.avgDec9R(col("sqdist"), 4).as("avg_sqdist"),
             max(col("sqdist")).as("max_sqdist"),
             min(col("vec_id")).as("first_vec"))
        .orderBy("cell")
        .collect().map(_.toSeq).toSeq
      spark.catalog.clearCache()
      out
    }
    assert(run(3) == run(13))
  }
}
