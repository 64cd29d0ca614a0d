package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

import graft.store.SparkTestSession

/** Physical-plan contracts — the properties the 100 TB story depends
  * on, locked in as assertions so a refactor cannot silently regress
  * them:
  *  - filters and column pruning reach the parquet scan;
  *  - prediction-side t07 is one narrow pass (exactly two exchanges:
  *    confusion-matrix aggregation + final sort);
  *  - no query hints a broadcast on a join side that grows with the
  *    data (corpus- or candidate-bounded sides are AQE's call).
  */
class PlanSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("q01: filter pushdown and column pruning reach the lineitem scan") {
    val plan = Relational.q01PricingSummary(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"shipdate filter not pushed:\n$plan")
    assert(plan.contains("l_shipdate") && !plan.contains("l_partkey"),
      "scan reads columns the query never touches")
  }

  test("t07 predict side is a single narrow pass (2 exchanges: agg + sort)") {
    val plan = LangId.t07NgramLangId(spark, dir).queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected agg+sort exchanges only, got $exchanges:\n$plan")
    assert(!plan.contains("Generate"), "predict must not explode occurrences")
    assert(!plan.toLowerCase.contains("broadcasthashjoin"), "predict must not join")
  }

  test("growing-side joins carry no broadcast hint (d02, m02)") {
    // analyzed plans retain ResolvedHint nodes; corpus/candidate-bounded
    // sides must have none so AQE can fall back to a shuffle join
    val d02 = Dedup.d02MinHashPairs(spark, dir).queryExecution.analyzed.toString
    assert(!d02.toLowerCase.contains("hint"), s"d02 hints a growing side:\n$d02")
    val m02 = Multimodal.m02FrameStats(spark, dir).queryExecution.analyzed.toString
    assert(!m02.toLowerCase.contains("hint"), s"m02 hints a growing side:\n$m02")
  }

  test("fixed-size dims stay hint-broadcast in the star join (q02)") {
    val q02 = Relational.q02RevenueByNation(spark, dir).queryExecution.analyzed.toString
    val hints = "ResolvedHint".r.findAllIn(q02).length
    assert(hints == 2, s"expected nation+region broadcast hints only, got $hints")
  }
}
