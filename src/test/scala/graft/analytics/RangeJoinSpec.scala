package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.store.SparkTestSession

/** The bucketized interval join must equal the direct range-predicate
  * join pair-for-pair — the bucketing is a physical rewrite, never a
  * semantic one. */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("bucketized join equals the direct non-equi join on the gate query") {
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("value"))
    val errors = e.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id"), col("us").as("err_us"))
    val others = e.filter(col("event_type") =!= "error")
      .select(col("user_id"), col("us").as("ev_us"), col("value"))

    val bucketized = RangeJoin
      .joinWithin(errors, others, Seq("user_id"), "err_us", "ev_us", 60000000L)
      .select("err_id", "ev_us").collect().map(_.toSeq).toSet
    val direct = errors.join(others, Seq("user_id"))
      .filter(abs(col("err_us") - col("ev_us")) <= 60000000L)
      .select("err_id", "ev_us").collect().map(_.toSeq).toSet
    assert(direct.nonEmpty)
    assert(bucketized == direct)
  }

  test("window edges: pairs at exactly +/-tolerance match, one past does not") {
    import spark.implicits._
    val tol = 100L
    // left at t=1000; rights at the exact edges, one inside, one outside,
    // and across a bucket boundary (t=1099 is bucket 10, left bucket 10 too;
    // t=901 is bucket 9 — reachable only via the -1 candidate bucket)
    val left = Seq((1L, 7L, 1000L)).toDF("l_id", "k", "l_ts")
    val right = Seq((10L, 7L, 900L), (11L, 7L, 901L), (12L, 7L, 1100L),
                    (13L, 7L, 1101L), (14L, 8L, 1000L))
      .toDF("r_id", "k", "r_ts")
    val got = RangeJoin.joinWithin(left, right, Seq("k"), "l_ts", "r_ts", tol)
      .select("r_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(10L, 11L, 12L))
  }
}
