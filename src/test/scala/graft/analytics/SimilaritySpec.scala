package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

import graft.store.SparkTestSession

/** Approximate ANN paths must return sane results: full top-10 lists
  * per query and reasonable recall against the exact brute force. */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect().toSeq
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap

  test("IVF and LSH recall vs exact brute force") {
    val exact = topSets(Similarity.s01BruteForceTopK(spark, dir))
    val ivf   = topSets(Similarity.s03IvfTopK(spark, dir))
    val lsh   = topSets(Similarity.s02LshTopK(spark, dir))
    assert(exact.nonEmpty)
    def recall(approx: Map[Long, Set[Long]]): Double = {
      val per = exact.map { case (q, ex) =>
        approx.get(q).map(ap => ap.intersect(ex).size.toDouble / ex.size).getOrElse(0.0)
      }
      per.sum / per.size
    }
    val rIvf = recall(ivf)
    val rLsh = recall(lsh)
    info(s"recall: ivf=$rIvf lsh=$rLsh")
    assert(rIvf >= 0.3, s"IVF recall too low: $rIvf")
    assert(rLsh >= 0.2, s"LSH recall too low: $rLsh")
    // approximate results are always a subset of the scored universe
    // with correct per-query list sizes
    assert(ivf.values.forall(_.size <= 10))
  }
}
