package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.SparkTestSession

/** MMR reranking: degeneration, containment, diversity-gain, and
  * distribution-invariance properties — all exact consequences of the
  * greedy definition, no golden numbers. */
class MmrSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  private def corpusAndQueries = {
    val e = Dedup.normalizedVectors(spark, dir)
    val q = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm"))
    (e, q)
  }

  test("lambda = 1 degenerates to pure relevance top-k") {
    val (e, q) = corpusAndQueries
    val mmr = Similarity.mmrRerank(spark, e, q, n = 30, k = 10, lam = 1.0)
      .select("query_id", "rnk", "neighbor_id", "relevance")
      .collect().map(_.toSeq).toSet
    val topk = Similarity.s01BruteForceTopK(spark, dir)
      .select("query_id", "rnk", "neighbor_id", "cos_sim")
      .collect().map(_.toSeq).toSet
    assert(mmr.nonEmpty && mmr == topk)
  }

  test("first pick is the relevance argmax; selection is within the candidate set") {
    val rows = Similarity.s16MmrRerank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val s01 = Similarity.s01BruteForceTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val top1 = s01.filter(_._2 == 1L).map(t => (t._1, t._3)).toMap
    val byQ = rows.groupBy(_._1)
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rs) =>
      assert(rs.length == 10)
      assert(rs.find(_._2 == 1L).get._3 == top1(q), s"query $q first pick != relevance top-1")
      // ranks are 1..k with no repeats, items distinct
      assert(rs.map(_._2).sorted.sameElements(1L to 10L))
      assert(rs.map(_._3).distinct.length == rs.length)
    }
  }

  test("distributed rerank equals a single-node greedy over the same candidates") {
    val (e, q) = corpusAndQueries
    val unit = e.select(col("vec_id"),
      transform(col("v"), x => x / col("norm")).as("uv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    // the same shortlist the operator consumes
    val cands = Similarity.topK(
        Tables.embeddings(spark, dir),
        Tables.embeddings(spark, dir).filter(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("query_id"), col("embedding")),
        k = 30, method = "brute")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    val lam = 0.7
    val want = cands.toSeq.flatMap { case (qid, rs) =>
      val cs = rs.map(t => (t._2, t._3)).sortBy(t => (-t._2, t._1))
      val taken = scala.collection.mutable.Set.empty[Int]
      val maxSim = Array.fill(cs.length)(0.0)
      (1 to 10).map { rnk =>
        val best = cs.indices.filterNot(taken)
          .maxBy(i => (if (rnk == 1) cs(i)._2 else lam * cs(i)._2 - (1 - lam) * maxSim(i),
            -cs.indices.indexOf(i)))
        taken += best
        cs.indices.filterNot(taken).foreach { j =>
          val s = dot(unit(cs(best)._1), unit(cs(j)._1))
          if (s > maxSim(j)) maxSim(j) = s
        }
        (qid, rnk.toLong, cs(best)._1)
      }
    }.toSet
    val got = Similarity.s16MmrRerank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.nonEmpty && got == want)
  }

  test("reranking gains aggregate diversity over pure relevance ranking") {
    val (e, _) = corpusAndQueries
    val unit = e.select(col("vec_id"),
      transform(col("v"), x => x / col("norm")).as("uv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def meanPairSim(ids: Seq[Long]): Double = {
      val ps = for (i <- ids.indices; j <- i + 1 until ids.length)
        yield unit(ids(i)).zip(unit(ids(j))).map { case (a, b) => a * b }.sum
      ps.sum / ps.length
    }
    val mmr = Similarity.s16MmrRerank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
    val rel = Similarity.s01BruteForceTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
    val deltas = mmr.keys.toSeq.sorted.map { q =>
      meanPairSim(rel(q).map(_._2).toSeq) - meanPairSim(mmr(q).map(_._2).toSeq)
    }
    // MMR optimizes the greedy marginal objective, not mean pairwise
    // similarity, so a single query CAN come out less diverse by this
    // proxy metric — but across the query set the reranker must reduce
    // redundancy on net, else it is doing nothing
    assert(deltas.sum > 1e-6, s"no aggregate diversity gain: ${deltas.sum}")
  }

  test("rerank is invariant to corpus partitioning") {
    val (e, q) = corpusAndQueries
    val a = Similarity.mmrRerank(spark, e.repartition(3), q, 30, 10, 0.7)
      .collect().map(_.toSeq).toSet
    val b = Similarity.mmrRerank(spark, e.repartition(17), q, 30, 10, 0.7)
      .collect().map(_.toSeq).toSet
    assert(a.nonEmpty && a == b)
  }
}
