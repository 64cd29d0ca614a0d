package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.SparkTestSession

/** Distributed PCA: algebraic identities + distribution-invariance.
  * The fixture checks are exact properties of the algorithm, not
  * golden numbers — they hold for any corpus. */
class PcaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def ddot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("fitted basis is orthonormal, eigenvalues sorted desc and nonneg") {
    val m = Pca.fit(Dedup.normalizedVectors(spark, dir), 8)
    for (i <- m.basis.indices; j <- i until m.basis.length) {
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(ddot(m.basis(i), m.basis(j)) - want) < 1e-9,
        s"basis not orthonormal at ($i,$j)")
    }
    assert(m.eigenvalues.sameElements(m.eigenvalues.sorted(Ordering[Double].reverse)))
    assert(m.eigenvalues.forall(_ >= -1e-12))
    // sign fix: the largest-|coordinate| entry of each axis is positive
    m.basis.foreach { w =>
      assert(w(w.indices.maxBy(i => math.abs(w(i)))) > 0)
    }
  }

  test("jacobi eigensolve reproduces the covariance trace and Cw = λw") {
    val vecs = Dedup.normalizedVectors(spark, dir).cache()
    try {
      val full = Pca.fit(vecs, 64) // all components of the d=64 corpus
      assert(math.abs(full.eigenvalues.sum - full.totalVar) < 1e-9,
        "eigenvalue sum != covariance trace")
      // spot-check the eigen equation through the projection identity:
      // var of the projection along axis j must equal λ_j
      val p = full.project(vecs.limit(0).unionByName(vecs)) // same frame, exercises plan
      val j = 0
      val stats = p.select(col("pc").getItem(j).as("s"))
        .agg(avg(col("s")), avg(col("s") * col("s"))).head()
      val v = stats.getDouble(1) - stats.getDouble(0) * stats.getDouble(0)
      assert(math.abs(v - full.eigenvalues(j)) < 1e-9,
        s"projected variance ${v} != eigenvalue ${full.eigenvalues(j)}")
    } finally vecs.unpersist()
  }

  test("fit is partitioning-invariant (1 vs 16 partitions)") {
    val vecs = Dedup.normalizedVectors(spark, dir)
    val a = Pca.fit(vecs.repartition(1), 4)
    val b = Pca.fit(vecs.repartition(16), 4)
    a.eigenvalues.zip(b.eigenvalues).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-9, s"eigenvalues diverge: $x vs $y")
    }
    a.basis.zip(b.basis).foreach { case (wa, wb) =>
      assert(math.abs(math.abs(ddot(wa, wb)) - 1.0) < 1e-6,
        "basis axes diverge across partitionings")
    }
  }

  test("s15 gate output: proj stats tie back to the eigensolve") {
    val rows = Pca.s15PcaReduce(spark, dir).collect()
    assert(rows.length == Pca.NumComponents)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(5)) <= 2e-4,
        s"component ${r.getInt(0)}: eigenvalue ${r.getDouble(1)} vs proj_var ${r.getDouble(5)}")
      assert(math.abs(r.getDouble(4)) <= 1e-4, "projected mean not ~0")
    }
    val cum = rows.map(_.getDouble(3))
    assert(cum.sameElements(cum.sorted) && cum.last <= 1.0001)
  }
}
