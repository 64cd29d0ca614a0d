package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.store.SparkTestSession

/** The user-facing ANN facade: each method over (corpus, queries)
  * frames reproduces its gate query, and external (out-of-corpus)
  * query vectors work.
  */
class TopKSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  private def corpus() = Tables.embeddings(spark, dir)
    .select(col("vec_id"), col("embedding"))
  private def gateQueries() = corpus().filter(col("vec_id") % 100 === 0)
    .select(col("vec_id").as("query_id"), col("embedding"))

  test("topK reproduces each gate query on the gate's query set") {
    for ((method, gate) <- Seq(
        ("brute", Similarity.s01BruteForceTopK _),
        ("lsh", Similarity.s02LshTopK _),
        ("ivf", Similarity.s03IvfTopK _),
        ("ivfpq", Similarity.s04IvfPqTopK _))) {
      val api = Similarity.topK(corpus(), gateQueries(), k = 10, method = method)
        .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq
      val expected = gate(spark, dir).collect().map(_.toSeq).toSeq
      assert(api == expected, s"$method: facade diverges from gate")
      spark.catalog.clearCache()
    }
  }

  test("an external query vector retrieves sane neighbors") {
    // use a held-out corpus vector's embedding under a fresh id: its
    // nearest neighbor must be the original vector, at cos_sim 1.0
    val donor = corpus().filter(col("vec_id") === 7).limit(1)
    val external = donor.select(lit(999999L).as("query_id"), col("embedding"))
    for (method <- Seq("brute", "ivf")) {
      val top = Similarity.topK(corpus(), external, k = 5, method = method)
        .orderBy("rnk").collect()
      assert(top.nonEmpty, s"$method returned nothing")
      assert(top.head.getAs[Long]("neighbor_id") == 7L &&
        top.head.getAs[Double]("cos_sim") == 1.0,
        s"$method: expected vec 7 at similarity 1.0, got ${top.head}")
      spark.catalog.clearCache()
    }
  }
}
