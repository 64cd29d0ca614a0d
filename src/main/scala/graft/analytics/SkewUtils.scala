package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot-key aggregations and joins.
  *
  * At 100 TB a handful of hot keys (one dominant `project`, one viral
  * `user_id`) can pin a single reducer. Two standard remedies,
  * expressed declaratively so Catalyst still optimizes around them:
  *
  *  - [[saltedAggregate]] — two-phase aggregation: shuffle once on
  *    (key, salt) spreading a hot key over `buckets` reducers, then a
  *    cheap second aggregation over the (tiny) per-salt partials.
  *    Works for any algebraic aggregate (sum/count/min/max).
  *  - [[saltedJoin]] — replicate the (small) build side `buckets`
  *    times and salt the probe side, so a skewed probe key spreads
  *    over `buckets` tasks. (AQE's skew-join handles sort-merge cases
  *    at runtime; explicit salting is for when the optimizer can't —
  *    e.g. windowed or deterministic-layout pipelines.)
  */
object SkewUtils {

  /** Two-phase salted aggregation.
    *
    * @param aggs (partialAgg, finalAgg) pairs per output column:
    *   partial runs per (key, salt); final recombines partials, e.g.
    *   `(sum("v").as("s"), sum("s").as("s"))`.
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], buckets: Int,
                      partialAggs: Seq[Column], finalAggs: Seq[Column]): DataFrame = {
    val salted = df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val partial = salted.groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial.groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted broadcast-replicated join: `small` is exploded over every
    * salt value; `big` rows get a random-but-deterministic salt. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, buckets: Int): DataFrame = {
    val saltedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(buckets)))
    saltedBig.join(saltedSmall,
      saltedBig(key) === saltedSmall(key) && saltedBig("_salt") === saltedSmall("_salt"))
      .drop(saltedSmall(key)).drop("_salt")
  }
}
