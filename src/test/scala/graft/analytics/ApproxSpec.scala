package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

import graft.store.SparkTestSession

/** HLL approximate distinct must stay within its configured error
  * bound of the exact counts. */
class ApproxSpec extends AnyFunSuite {

  test("approx_count_distinct within 5% of exact") {
    val df = Relational.q21ApproxDistinct(SparkTestSession.spark, "/root/testdata/sf0.01")
    df.collect().foreach { r =>
      val (ap, ep) = (r.getAs[Long]("approx_parts"), r.getAs[Long]("exact_parts"))
      val (ao, eo) = (r.getAs[Long]("approx_orders"), r.getAs[Long]("exact_orders"))
      assert(math.abs(ap - ep).toDouble / ep < 0.05, s"parts: $ap vs $ep")
      assert(math.abs(ao - eo).toDouble / eo < 0.05, s"orders: $ao vs $eo")
    }
  }

  test("percentile_approx within 2% of exact quantiles") {
    val df = Relational.q25ApproxPercentiles(SparkTestSession.spark, "/root/testdata/sf0.01")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      for ((a, e) <- Seq(("approx_p50", "exact_p50"), ("approx_p95", "exact_p95"))) {
        val (ap, ex) = (r.getAs[Double](a), r.getAs[Double](e))
        assert(math.abs(ap - ex) / ex < 0.02, s"$a: $ap vs $ex")
      }
    }
  }
}
