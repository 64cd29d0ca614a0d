package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-local materialization for DIFF-BOUNDED frames.
  *
  * The maintenance loops (g07/g08/st26 kNN, p13/p14/p15 chains,
  * st23/st25 streams) materialize small id/diff sets with
  * `localCheckpoint(true)` and then `broadcast(...)` them into several
  * consuming actions. That shape pays a hidden per-action tax: a
  * broadcast over an RDD-backed frame runs ONE SPARK JOB per consuming
  * query execution just to re-collect the build side (plus the
  * original checkpoint job, plus a count job when the caller needs the
  * cardinality). The r17 cost receipts price a local job at a fixed
  * ~80–100 ms of driver overhead, so a microbatch with 4 broadcast
  * consumers of 2 such frames burns ~1 s moving the SAME few thousand
  * rows to the SAME driver repeatedly.
  *
  * [[localize]] collects the frame ONCE (one job — the same driver
  * residency every existing `broadcast(frame)` already paid, under the
  * same Spark broadcast limits) and rebuilds it as a LocalRelation:
  *  - a broadcast of a LocalRelation builds driver-side with ZERO jobs
  *    (`LocalTableScanExec.executeCollect` never submits),
  *  - the cardinality is known without a count job,
  *  - non-broadcast consumers scan the local rows without touching the
  *    block manager, so there is no unpersist bookkeeping to leak.
  *
  * Scale guard: the frames this is applied to are diff-bounded by
  * construction (a CDC batch, a recompute id set — never the corpus).
  * If a deployment's diff exceeds [[maxRows]]
  * (`spark.graft.localizeMaxRows`, default 1&nbsp;<<&nbsp;20), the helper falls
  * back to exactly the previous behavior — an eager localCheckpoint —
  * so nothing above the cap ever lives on the driver longer than the
  * one collect every broadcast already implied. */
object Bounded {

  def maxRows(spark: SparkSession): Int =
    spark.conf.getOption("spark.graft.localizeMaxRows")
      .map(_.toInt).getOrElse(1 << 20)

  /** A materialized bounded frame: LocalRelation-backed when under the
    * cap (then `count` is free, `rows` holds the data for driver-side
    * folds, and [[release]] is a no-op), an eager localCheckpoint
    * otherwise (`rows` empty — consumers must go through `df`). */
  final case class Localized(df: DataFrame, count: Long, local: Boolean,
                             rows: Array[org.apache.spark.sql.Row]) {
    def release(): Unit = if (!local) { df.unpersist(); () }
  }

  /** Per-value row counts of a string column — a driver-side fold when
    * the frame is local, one aggregation job on the over-cap fallback
    * (where `rows` is empty and MUST NOT be folded over). */
  def countsBy(l: Localized, column: String): Map[String, Long] =
    if (l.local) {
      val i = l.df.schema.fieldIndex(column)
      l.rows.groupBy(_.getString(i)).map { case (k, v) => k -> v.length.toLong }
    } else {
      import org.apache.spark.sql.functions.{count, lit}
      l.df.groupBy(column).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }

  /** Materialize `df` driver-locally (one collect job). See object doc
    * for why this is strictly cheaper than checkpoint+broadcast for
    * diff-bounded frames and no heavier on the driver. */
  def localize(df: DataFrame): Localized = {
    val spark = df.sparkSession
    val rows = df.collect()
    if (rows.length > maxRows(spark)) {
      // over-cap: hand the rows back to the cluster-side path (the
      // collect was transient — same peak the broadcasts already had)
      Localized(df.localCheckpoint(true), rows.length.toLong, local = false,
        rows = Array.empty)
    } else {
      val local = spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), df.schema)
      Localized(local, rows.length.toLong, local = true, rows)
    }
  }
}
