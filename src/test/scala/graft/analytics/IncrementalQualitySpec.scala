package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.store.SparkTestSession

/** p07 contracts:
  *  - the distilled per-doc battery agrees with t15's column-by-column
  *    rules (per-source pass counts match — the two expressions cannot
  *    drift apart silently);
  *  - the re-score input is DIFF-sized: exactly the changed+added ids,
  *    never the corpus (the incremental claim);
  *  - merged carry-over + re-score equals scoring snapshot B from
  *    scratch. */
class IncrementalQualitySpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("qualityPass battery matches t15's n_pass per source") {
    val distilled = Tables.documents(spark, dir)
      .groupBy("source")
      .agg(sum(when(TextOps.qualityPass, 1L).otherwise(0L)).as("n_pass"))
      .orderBy("source").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val t15 = TextOps.t15QualityFilter(spark, dir)
      .select("source", "n_pass")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(distilled.nonEmpty && distilled == t15)
  }

  test("re-score input is exactly the changed+added ids") {
    val docs = Tables.documents(spark, dir)
    val diff = Dedup.d14SnapshotCdc(spark, dir)
      .select(col("doc_id"), col("change_type"))
    val rescored = Pipeline.rescoreDiff(docs, diff)
    val expected = diff.filter(col("change_type").isin("changed", "added")).count()
    assert(expected > 0 && rescored.count() == expected)
    val rescoredIds = rescored.select("doc_id").collect().map(_.getLong(0)).toSet
    val wantIds = diff.filter(col("change_type").isin("changed", "added"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rescoredIds == wantIds)
  }

  test("merged accounting equals scoring the new snapshot from scratch") {
    val merged = Pipeline.p07IncrementalQuality(spark, dir)
      .collect().map(_.toSeq).toSeq
    val fromScratch = Dedup.cdcSnapshotBText(Tables.documents(spark, dir))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           sum(when(TextOps.qualityPass, 1L).otherwise(0L)).as("n_pass"))
      .orderBy("source").collect().map(_.toSeq).toSeq
    assert(merged.nonEmpty && merged == fromScratch)
  }
}
