package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.SparkTestSession

/** s19 radius search: the cell prune is a SOUND bound (exactness
  * pinned against an independent brute-force recompute), and on
  * clustered data it genuinely prunes (the part the fixture's uniform
  * vectors can't show and the oracle can't see). */
class RangeSearchSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("pruned radius search equals the brute-force radius scan exactly") {
    import graft.functions.VectorFunctions._
    val got = Similarity.s19RangeSearch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val e = Dedup.normalizedVectors(spark, dir)
    val q = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm"))
    val want = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Det.dround(array_dot(col("qv"), col("v")) / (col("qnorm") * col("norm")), 4)
          .as("cos_sim"))
      .filter(col("cos_sim") >= Similarity.RangeTau)
      .orderBy("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.nonEmpty, "radius search found nothing — the gate is vacuous")
    assert(got == want)
  }

  test("on clustered data the bound prunes the far cluster, result still exact") {
    import spark.implicits._
    import graft.functions.VectorFunctions._
    def vecs(rows: Seq[(Long, Seq[Double])]) =
      rows.toDF("vec_id", "embedding")
        .select(col("vec_id"), as_double_array(col("embedding")).as("v"))
        .withColumn("norm", array_norm(col("v")))
    // two tight clusters on orthogonal axes: any query near cluster A
    // can NEVER reach tau=0.8 against cluster B's cell, and the
    // angular bound must prove it. Membership alternates by id parity
    // so the fit's deterministic seeding sees both clusters and k=2
    // actually separates them.
    val rows = (0L to 15L).map(i =>
      if (i % 2 == 0) i -> Seq(1.0, 0.01 * i, 0.0)
      else i -> Seq(0.0, 0.01 * i, 1.0))
    val corpus = vecs(rows)
    val (assigned, cents) = Similarity.ivfFitOf(corpus, k = 2, iters = 5)
    val queries = vecs(Seq(100L -> Seq(1.0, 0.01, 0.0)))
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm"))
    val tau = 0.8
    val admitted = Similarity.rangeAdmitted(assigned, cents, queries, tau)
      .select("cell").collect().map(_.getInt(0)).toSeq
    assert(admitted.length == 1, s"far cluster not pruned: cells $admitted")
    val got = Similarity.rangeSearch(assigned, cents, queries, tau)
      .orderBy("neighbor_id").collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toSeq
    val want = corpus.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("vec_id"),
        Det.dround(array_dot(col("qv"), col("v")) / (col("qnorm") * col("norm")), 4)
          .as("c"))
      .filter(col("c") >= tau).orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(want.nonEmpty && got == want)
    // and every match is a cluster-A (even-id) member — the prune
    // kept exactly the near cell
    assert(got.map(_._1).forall(_ % 2 == 0))
  }
}
