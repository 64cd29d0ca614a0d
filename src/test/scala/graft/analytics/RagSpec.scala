package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.store.SparkTestSession

/** RAG retrieval pipeline (p04): passage-store shape, dedup/top-k
  * contract, and the IVF tier's recall against the exact tier. */
class RagSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("passage store: one row per chunk, rotation preserves the norm") {
    import graft.functions.VectorFunctions._
    val p = Rag.passageStore(spark, dir)
    // chunk counts follow the t08 stride math (docs here are 20-100 toks)
    val perDoc = p.groupBy("doc_id").count()
    assert(perDoc.filter(col("count") < 1).isEmpty)
    // rotated vector has the same norm as the stored one
    val bad = p.select((abs(array_norm(col("pv")) - col("norm")) > 1e-9).as("b"))
      .filter(col("b")).count()
    assert(bad == 0L)
    // pids are unique
    assert(p.select("pid").distinct().count() == p.count())
  }

  test("p04 gate: per-query top-5, one passage per doc, self excluded") {
    val got = Rag.p04RagRetrieval(spark, dir)
    val rows = got.collect()
    assert(rows.nonEmpty)
    // ranks are 1..5 per query, docs unique within a query
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to rs.length).toSeq)
      assert(rs.length <= 5)
      val docs = rs.map(_.getLong(2))
      assert(docs.distinct.length == docs.length, s"duplicate doc for query $q")
      assert(!docs.contains(q), s"query $q retrieved its own document")
    }
  }

  test("ivf tier: doc-level recall vs the exact tier") {
    val exact = Rag.ragRetrieve(spark, dir, "brute")
      .select(col("query_id"), col("doc_id"))
    val approx = Rag.ragRetrieve(spark, dir, "ivf")
      .select(col("query_id"), col("doc_id"))
    val hits = exact.join(approx, Seq("query_id", "doc_id"), "left_semi").count()
    val total = exact.count()
    val recall = hits.toDouble / total
    assert(recall >= 0.5, s"ivf tier doc recall $recall ($hits/$total)")
  }
}
