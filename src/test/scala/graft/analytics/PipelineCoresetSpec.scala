package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.SparkTestSession

/** p06 coreset: quota arithmetic, per-cluster top-rank selection, and
  * full cluster coverage — checked against an independent recompute
  * from the constituent operators. */
class PipelineCoresetSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("every cluster is covered and quotas are exactly max(1, n/10)") {
    val sel = Pipeline.p06Coreset(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    assert(sel.nonEmpty)
    val cells = Similarity.s08KmeansClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byCell = sel.groupBy(_._1)
    assert(byCell.keySet == cells.keySet.filter(cells(_) > 0),
      "a nonempty cluster has no representative")
    byCell.foreach { case (cell, rows) =>
      val quota = math.max(1L, cells(cell) / 10L)
      assert(rows.length == quota, s"cell $cell: ${rows.length} != quota $quota")
      assert(rows.map(_._2).sorted.sameElements(1L to quota))
      rows.foreach { case (_, _, _, _, nv) => assert(nv == cells(cell)) }
    }
  }

  test("selected members are each cluster's top-ranked by centrality") {
    val vecs = Dedup.normalizedVectors(spark, dir).cache()
    try {
      val ranks = Graph.pagerank(
          Similarity.knnGraphExact(vecs, 5)
            .select(col("vec_id").as("src"), col("neighbor_id").as("dst")))
        .collect().map(r => r.getLong(0) -> Det.droundD(r.getDouble(1), 8)).toMap
      val assigned = Similarity.kmeansFit(vecs)._1
        .select("vec_id", "cell").collect()
        .map(r => (r.getLong(0), r.getInt(1).toLong))
      val want = assigned.groupBy(_._2).toSeq.flatMap { case (cell, members) =>
        val quota = math.max(1L, members.length / 10L)
        members.map(_._1).sortBy(id => (-ranks(id), id)).take(quota.toInt)
          .toSeq.map(cell -> _)
      }.toSet
      val got = Pipeline.p06Coreset(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
      assert(got == want)
    } finally vecs.unpersist()
  }
}
