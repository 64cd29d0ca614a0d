package graft.analytics


import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.store.SparkTestSession

/** Bucketing for co-located joins: two fact tables bucketed on the
  * join key join without a shuffle — the plan contains no Exchange on
  * the join path. At 100 TB this is THE lever for repeated fact-fact
  * joins: pay the shuffle once at write time, never again. */
class BucketingSpec extends AnyFunSuite {

  test("bucketed fact-fact join plans without Exchange") {
    val spark = SparkTestSession.spark
    // tables land in the default ./spark-warehouse (gitignored)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      val dir = "/root/testdata/sf0.001"
      Tables.lineitem(spark, dir).write
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_bucketed")
      Tables.orders(spark, dir)
        .withColumnRenamed("o_orderkey", "l_orderkey").write
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("o_bucketed")

      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      // and it is correct
      val expected = Tables.lineitem(spark, dir).join(
        Tables.orders(spark, dir).withColumnRenamed("o_orderkey", "l_orderkey"),
        "l_orderkey").count()
      assert(joined.count() == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
