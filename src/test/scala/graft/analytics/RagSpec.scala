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

  test("p09 hybrid RRF: rank sanity, fusion dominance, broadcast lexical join") {
    val got = Rag.p09HybridRrf(spark, dir)
    val rows = got.collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      // ranks 1..n, no self-retrieval, and rrf strictly ordered with
      // the doc_id tie-break
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to rs.length).toSeq)
      assert(!rs.map(_.getLong(2)).contains(q))
      val byRank = rs.sortBy(_.getLong(1)).map(r => (r.getDouble(3), r.getLong(2)))
      assert(byRank.sliding(2).forall {
        case Array((s1, d1), (s2, d2)) => s1 > s2 || (s1 == s2 && d1 < d2)
        case _ => true
      }, s"rrf order violated for query $q")
      // a doc on BOTH lists at rank r beats a doc on one list at rank r:
      // 1/(60+r) + 1/(60+r') > 1/(60+r) — structural RRF dominance
      rs.foreach { r =>
        val (dr, lr) = (r.getLong(4), r.getLong(5))
        assert(dr > 0 || lr > 0, "fused row on neither list")
        val expect = (if (dr > 0) 1.0 / (60 + dr) else 0.0) +
          (if (lr > 0) 1.0 / (60 + lr) else 0.0)
        assert(math.abs(r.getDouble(3) - expect) < 1e-6,
          s"rrf mismatch: ${r.getDouble(3)} vs $expect")
      }
    }
    // the query-term side of the postings join must broadcast — the
    // corpus postings scan is the only corpus-sized input
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "lexical postings join did not broadcast")
    // and that scan is PARTITION-PRUNED to the query terms' buckets
    // (the stored artifact is term-bucket partitioned): at 100 TB this
    // is the difference between "read the posting lists you need" and
    // "read the index"
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
      "postings scan lost its bucket PartitionFilters")
  }

  test("p09 lexical sum: long-micros spelling ≡ decimal(18,4) spelling") {
    // the r18 narrowing replaced sum(cast(idf as decimal(18,4))) with
    // a primitive long sum of the dround numerator; pin bit-equality
    // of both spellings group-by-group over the REAL fixture fan-out
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.count()
    val qterms0 = docs.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("query_id"),
        explode(split(trim(col("text")), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("query_id"), lower(col("tok")).as("term")).distinct()
    val idfBoth = TextOps.postingsDf(spark, dir)
      .withColumn("idf", Det.dround(log(lit(nDocs.toDouble) / col("df")), 4))
      .withColumn("idf_m",
        floor(log(lit(nDocs.toDouble) / col("df")) * lit(1e4) + lit(0.5))
          .cast("long"))
    // per-term: the decimal cast of the rounded double recovers the
    // same integer ten-thousandths the long spelling computes directly
    val badTerm = idfBoth
      .filter(col("idf").cast("decimal(18,4)") =!=
        (col("idf_m").cast("decimal(18,4)") / lit(10000)))
      .count()
    assert(badTerm == 0L, s"$badTerm terms where decimal cast != micros")
    val toks = TextOps.postings(spark, dir).select(col("doc_id"), col("term"))
    val fanout = broadcast(qterms0.join(idfBoth, "term")).join(toks, "term")
      .filter(col("doc_id") =!= col("query_id"))
    val both = fanout.groupBy(col("query_id"), col("doc_id"))
      .agg(
        Det.dround(sum(col("idf").cast("decimal(18,4)")).cast("double"), 4)
          .as("dec_score"),
        Det.dround(sum(col("idf_m")).cast("double") / lit(10000.0), 4)
          .as("long_score"))
    assert(both.count() > 0)
    // exact double equality — the two spellings must agree bit for bit
    val bad = both.filter(col("dec_score") =!= col("long_score")).count()
    assert(bad == 0L, s"$bad (query, doc) groups diverge")
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
