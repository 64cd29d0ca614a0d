package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketized range (interval) join.
  *
  * Spark's built-in plan for `a.key = b.key AND |a.ts - b.ts| <= W` is
  * an equi-join on `key` with the range as a post-join filter — every
  * key's rows cross-product before the filter runs, so one hot key (a
  * bot user, a telemetry flood) does quadratic work at 100 TB no
  * matter how selective the window is. [[joinWithin]] makes the time
  * dimension part of the join key instead: with bucket width == the
  * tolerance `W`, any qualifying pair's buckets differ by at most 1,
  * so the left side replicates into its 3 candidate buckets
  * (explode ×3 — bounded, chosen as the smaller input) and the join
  * becomes a plain EQUI join on (key…, bucket) whose per-composite-key
  * fan-in is bounded by the key's event rate within one window — never
  * its total history. The exact predicate then prunes the corner
  * pairs. AQE's skew split handles residual hot (key, minute) cells;
  * nothing is broadcast because both sides grow with the data.
  *
  * The reference has no join surface at all (SURVEY.md §2.10 — this is
  * part of the Spark-side analytics layer built on the same tables).
  */
object RangeJoin {

  /** Inner-join `left` × `right` on `equiKeys` plus the interval
    * predicate `|left(leftTs) - right(rightTs)| <= tolerance`, where
    * both ts columns are LONGs in the same unit (e.g. `unix_micros`).
    * Non-key columns of the two sides must not collide by name — the
    * caller aliases them apart (the usual `.as`/`select` discipline).
    * The LEFT side is replicated ×3 across candidate buckets: pass the
    * smaller input as `left`. Each qualifying pair emerges exactly
    * once (the right row has one bucket; the left row visits it at
    * most once), so no post-join dedup is needed. */
  def joinWithin(left: DataFrame, right: DataFrame, equiKeys: Seq[String],
                 leftTs: String, rightTs: String, tolerance: Long): DataFrame = {
    require(tolerance > 0, "tolerance must be positive")
    val lb = left.withColumn("__bucket",
      explode(array(Seq(-1L, 0L, 1L).map(d =>
        expr(s"$leftTs div $tolerance") + lit(d)): _*)))
    val rb = right.withColumn("__bucket", expr(s"$rightTs div $tolerance"))
    lb.join(rb, (equiKeys :+ "__bucket").toSeq)
      .filter(abs(col(leftTs) - col(rightTs)) <= tolerance)
      .drop("__bucket")
  }

  /** Gate: error-burst context — for each `error` event, the count and
    * exact-decimal value sum of the same user's non-error events within
    * ±10 min. Errors (the small side) replicate across buckets; the
    * join is equi on (user_id, 10-min-bucket). Oracle-checked against
    * the direct range-predicate join in DuckDB. */
  def q28RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("value"))
    val errors = e.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id"), col("us").as("err_us"))
    val others = e.filter(col("event_type") =!= "error")
      .select(col("user_id"), col("us").as("ev_us"), col("value"))
    joinWithin(errors, others, Seq("user_id"), "err_us", "ev_us", 600000000L)
      .groupBy("err_id")
      .agg(count(lit(1)).as("n_nearby"), Det.sumDecR(col("value"), 2).as("nearby_value"))
      .orderBy("err_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q28_range_join" -> q28RangeJoin _,
  )

  val oracleSql: Map[String, String] = Map(
    "q28_range_join" ->
      s"""SELECT a.event_id AS err_id, count(*) AS n_nearby,
          ${Det.sqlSumDecR("b.value", 2)} AS nearby_value
         FROM events a JOIN events b
           ON a.user_id = b.user_id
          AND a.event_type = 'error' AND b.event_type <> 'error'
          AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 600000000
         GROUP BY 1 ORDER BY err_id""",
  )
}
