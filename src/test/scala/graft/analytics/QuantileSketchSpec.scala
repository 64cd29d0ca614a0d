package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.store.SparkTestSession

/** t41: mergeable approximate quantiles — the sketch tier of exact
  * percentiles. Verify's `t41_max_rank_err` carries the quantitative
  * rank-band guarantee; this spec pins the structural contracts. */
class QuantileSketchSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("quantiles are monotone in p within every language") {
    val rows = TextOps.t41QuantileSketch(spark, dir)
      .collect().map(r => (r.getString(0), r.getDouble(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val qs = rs.sortBy(_._2).map(_._3)
      assert(qs.zip(qs.tail).forall { case (a, b) => a <= b },
        s"$lang: quantiles not monotone: ${qs.mkString(",")}")
    }
  }

  test("rank band holds at fixture scale (tie-safe, any merge order)") {
    val eps = 1.0 / TextOps.T41Accuracy
    val byLang = Tables.documents(spark, dir)
      .select(col("lang"), size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    TextOps.t41QuantileSketch(spark, dir).collect().foreach { r =>
      val (lang, p, q) = (r.getString(0), r.getDouble(2), r.getLong(3))
      val ns = byLang(lang)
      val fracLt = ns.count(_ < q).toDouble / ns.length
      val fracLe = ns.count(_ <= q).toDouble / ns.length
      // 1/N slack covers rank-definition off-by-one on small groups
      assert(fracLt <= p + eps + 1.0 / ns.length && fracLe >= p - eps - 1.0 / ns.length,
        s"$lang p=$p q=$q: frac_lt=$fracLt frac_le=$fracLe outside the rank band")
    }
  }

  test("repeat-stable: two runs over the same static input agree") {
    val a = TextOps.t41QuantileSketch(spark, dir).collect().toSeq
    val b = TextOps.t41QuantileSketch(spark, dir).collect().toSeq
    assert(a == b, "sketch result moved between identical runs")
  }
}
