package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.store.SparkTestSession

/** Salted operators must be exactly equivalent to their direct forms. */
class SkewUtilsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("salted aggregate equals direct groupBy") {
    val li = Tables.lineitem(spark, dir)
    val direct = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("q"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1).round, r.getLong(2))).toSet
    val salted = SkewUtils.saltedAggregate(li, Seq("l_returnflag"), buckets = 8,
      partialAggs = Seq(sum("l_quantity").as("q"), count(lit(1)).as("n")),
      finalAggs = Seq(sum("q").as("q"), sum("n").as("n")))
      .collect().map(r => (r.getString(0), r.getDouble(1).round, r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("salted join equals direct join") {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, dir).select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val direct = li.join(o, "l_orderkey").count()
    val salted = SkewUtils.saltedJoin(li, o, "l_orderkey", buckets = 4).count()
    assert(salted == direct)
  }
}
