package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Retrieval pipeline (the serving-side counterpart of the curation
  * operators): chunk documents into passages, embed each passage,
  * retrieve top passages per query with per-document deduplication —
  * the exact workflow a RAG system runs over a curated corpus.
  *
  * The passage EMBEDDER is the stub slot (no model ships in this
  * container, same convention as the multimodal decode stubs): a
  * passage's vector is its document's fixture embedding rotated by
  * chunk_id positions — deterministic, norm-preserving, distinct per
  * chunk, and expressible in both engines, so the whole pipeline is
  * oracle-checkable end to end. A real embedder changes ONE column
  * expression; every downstream shape (scoring join, per-doc dedup
  * window, bounded top-k) is embedder-agnostic.
  *
  * Scale shape: the brute scorer below is the labeled exact baseline
  * tier (queries are bounded, so the score join is broadcast-query ×
  * corpus-scan — one pass, no shuffle of the corpus). The production
  * tier swaps the scorer for the IVF probe over the cell-partitioned
  * stored layout ([[Similarity.ivfStoredTopK]] / [[ragRetrieve]] with
  * `method="ivf"`): RagSpec pins that tier's doc-level recall against
  * the exact path. The dedup window partitions by (query, doc) — key
  * cardinality ≤ candidate count, never corpus-sized. */
object Rag {

  private val Stride = 24 // t08's chunk stride (32-token chunks, 8 overlap)
  private val TopK = 5
  private val PidBase = 1000000L // passage-id namespace, disjoint from query ids

  /** Passages with stub embeddings: one row per (doc, chunk) with the
    * rotated document vector and its (rotation-invariant) norm. */
  private[analytics] def passageStore(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions._
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), size(split(trim(col("text")), "\\s+")).as("n_tok"))
      .select(col("doc_id"),
        explode(sequence(lit(0),
          greatest(floor((col("n_tok") - 1) / Stride), lit(0)).cast("int"))).as("chunk_id"))
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("doc_id"), as_double_array(col("embedding")).as("v"))
      .withColumn("norm", array_norm(col("v")))
    docs.join(emb, "doc_id")
      .withColumn("shift", pmod(col("chunk_id"), size(col("v"))))
      // rotation by `shift`: pv[i] = v[(i + shift) mod d] — 0-based []
      .withColumn("pv",
        expr("transform(sequence(1, size(v)), k -> v[(k - 1 + shift) % size(v)])"))
      .select(col("doc_id"), col("chunk_id"),
        (col("doc_id") * 1000L + col("chunk_id") + PidBase).as("pid"),
        col("pv"), col("norm"))
  }

  /** Deterministic query set: every 50th fixture embedding, as-is. */
  private def querySet(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions._
    Tables.embeddings(spark, dir)
      .filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), as_double_array(col("embedding")).as("qv"))
      .withColumn("qnorm", array_norm(col("qv")))
  }

  /** Per-document dedup + final ranking over scored passages: keep
    * each document's best passage (ties to the lowest chunk), then the
    * top [[TopK]] documents per query (ties to lowest doc, then
    * chunk). Both windows are candidate-bounded, never corpus-sized. */
  private def dedupRank(scored: DataFrame): DataFrame = {
    val perDoc = Window.partitionBy("query_id", "doc_id")
      .orderBy(col("cos_sim").desc, col("chunk_id").asc)
    val perQuery = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("doc_id").asc, col("chunk_id").asc)
    scored
      .withColumn("rn", row_number().over(perDoc)).filter(col("rn") === 1)
      .withColumn("rnk", row_number().over(perQuery).cast("bigint"))
      .filter(col("rnk") <= TopK)
      .select(col("query_id"), col("rnk"), col("doc_id"), col("chunk_id").cast("bigint"),
        col("cos_sim"))
      .orderBy("query_id", "rnk")
  }

  /** Retrieval with a chosen scoring tier: `"brute"` scores every
    * passage exactly (the oracle-checked baseline); `"ivf"` probes the
    * in-memory IVF index for candidates first ([[Similarity.topK]]) —
    * the 100 TB tier, recall-pinned in RagSpec. */
  def ragRetrieve(spark: SparkSession, dir: String, method: String = "brute"): DataFrame = {
    import graft.functions.VectorFunctions._
    val passages = passageStore(spark, dir)
    val queries = querySet(spark, dir)
    val scored = method match {
      case "brute" =>
        broadcast(queries).join(passages, col("query_id") =!= col("doc_id"))
          .select(col("query_id"), col("doc_id"), col("chunk_id"),
            Det.dround(array_dot(col("qv"), col("pv")) / (col("qnorm") * col("norm")), 4)
              .as("cos_sim"))
      case "ivf" =>
        val corpus = passages.select(col("pid").as("vec_id"), col("pv").as("embedding"))
        val cands = Similarity.topK(corpus,
          queries.select(col("query_id"), col("qv").as("embedding")),
          k = TopK * 5, method = "ivf")
        cands
          .select(col("query_id"),
            ((col("neighbor_id") - PidBase) / 1000L).cast("long").as("doc_id"),
            pmod(col("neighbor_id") - PidBase, lit(1000L)).as("chunk_id"),
            col("cos_sim"))
          .filter(col("query_id") =!= col("doc_id"))
      case other => throw new IllegalArgumentException(
        s"unknown retrieval method '$other' (brute | ivf)")
    }
    dedupRank(scored)
  }

  /** RAG retrieval gate — the exact tier, oracle-checked end to end
    * (chunking, rotation embedder, cosine, per-doc dedup, top-5). */
  def p04RagRetrieval(spark: SparkSession, dir: String): DataFrame =
    ragRetrieve(spark, dir, "brute")

  /** RRF constant (the standard 60 from the original reciprocal-rank
    * fusion formulation) and per-retriever depth. */
  private val RrfK = 60L
  private val HybridTopK = 5

  /** p09 gate: HYBRID retrieval — dense + lexical rankings fused by
    * reciprocal-rank fusion (rrf = Σ 1/(60 + rank)), the standard
    * two-tower serving stack: the dense side catches paraphrase, the
    * lexical side catches exact terms, and RRF needs no score
    * calibration between them because it only consumes RANKS.
    *
    *  - Dense list: exact cosine top-5 per query over the embeddings
    *    (s01's machinery, query rule `vec_id % 50`).
    *  - Lexical list: query-term idf overlap over an inverted-postings
    *    join — distinct (doc, term) postings, idf = ln(N/df) rounded
    *    to the 4-decimal grid (t13's proven cross-engine pattern),
    *    summed per (query, candidate) as EXACT decimals so the score
    *    is merge-order-independent; top-5 via the bounded top-k
    *    aggregate, never a corpus window.
    *  - Fusion: full-outer join of the two 5-deep lists on
    *    (query, doc); rrf terms are pure IEEE on integer ranks.
    *
    * Scale shape: the query-term frame (queries × their vocab lookup)
    * is workload-bounded and BROADCAST against the corpus postings
    * scan — one pass over the posting lists, the IR join shape; the
    * dense side is the broadcast-query corpus scan s01 already uses;
    * the fusion joins two |queries|·k frames. Fully oracle-checked —
    * both retrievers and the fusion are SQL-expressible. */
  def p09HybridRrf(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.count()
    // dense: cosine top-5, same normalization as s01
    val e = Dedup.normalizedVectors(spark, dir)
    val dense = Similarity.bruteTopK(e,
        e.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm")),
        k = HybridTopK)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rnk").as("dense_rnk"))
    // lexical: the STORED inverted index ([[TextOps.ensurePostings]],
    // shared with t13) — term-bucket PARTITIONED, so the corpus-side
    // scan prunes to the query terms' buckets (the IVF-cell move for
    // text; RagSpec pins PartitionFilters on the executed plan). The
    // query side tokenizes the query DOCUMENTS directly (workload-
    // bounded — in production the query text arrives with the query),
    // its distinct terms' buckets become partition-filter literals,
    // and idf comes off the |vocab|-row `_df` sidecar, never
    // recounted.
    val qterms0 = docs.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("query_id"),
        explode(split(trim(col("text")), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("query_id"), lower(col("tok")).as("term")).distinct()
    val qBuckets = qterms0
      .select(TextOps.postingsBucket(col("term")).as("b")).distinct()
      .collect().map(r => Long.box(r.getLong(0))).toSeq
    val toks = TextOps.postings(spark, dir)
      .filter(col("bucket").isin(qBuckets: _*))
      .select(col("doc_id"), col("term"))
    // idf as exact integer ten-thousandths (the dround numerator,
    // integer-valued by construction), so the per-(query, doc) sum is
    // a primitive LONG aggregation instead of decimal(18,4): the
    // partial-sum state the fan-out exchange carries shrinks from a
    // 16-byte decimal + isEmpty to one long (§2.3 narrower types), and
    // the per-row add in the term fan-out — the gate's hot loop — is
    // codegen'd long arithmetic. Bit-identical to the decimal
    // spelling: idf = m/1e4 with integer m, cast(idf as decimal(18,4))
    // recovers exactly m (the double is within half-ulp of the
    // 4-decimal grid point, 5e-5 away from any rounding boundary), the
    // long sum S = Σm is exact (|S| ≤ |terms|·ln(nDocs)·1e4 ≪ 2^53),
    // and S.toDouble / 10000.0 is the correctly-rounded double of
    // S/1e4 — the same value decimal(28,4)→double produces. RagSpec
    // pins the equality group-by-group against the decimal spelling.
    val idf = TextOps.postingsDf(spark, dir)
      .withColumn("idf_m",
        floor(log(lit(nDocs.toDouble) / col("df")) * lit(1e4) + lit(0.5))
          .cast("long"))
    val qterms = qterms0.join(idf, "term")
    val lexScored = broadcast(qterms).join(toks, "term")
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(Det.dround(sum(col("idf_m")).cast("double") / lit(10000.0), 4)
        .as("lex_score"))
    val lex = Similarity.rankTopK(
        lexScored.select(col("query_id"), col("doc_id").as("neighbor_id"),
          col("lex_score")),
        HybridTopK, "lex_score")
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rnk").as("lex_rnk"))
    // fusion: rank-only, dense term first (fixed IEEE operand order)
    val fused = dense.join(lex, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(RrfK) + col("dense_rnk")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("lex_rnk")), lit(0.0)))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf").desc, col("doc_id").asc)
    fused
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter(col("rnk") <= HybridTopK)
      .select(col("query_id"), col("rnk"), col("doc_id"),
        Det.dround(col("rrf"), 6).as("rrf"),
        coalesce(col("dense_rnk"), lit(0L)).as("dense_rnk"),
        coalesce(col("lex_rnk"), lit(0L)).as("lex_rnk"))
      .orderBy("query_id", "rnk")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p04_rag_retrieval" -> p04RagRetrieval _,
    "p09_hybrid_rrf"    -> p09HybridRrf _)

  val oracleSql: Map[String, String] = Map(
    "p09_hybrid_rrf" ->
      """WITH q AS (SELECT vec_id query_id, embedding q_emb FROM embeddings WHERE vec_id % 50 = 0),
          dsc AS (SELECT q.query_id, e.vec_id doc_id,
            floor((list_aggregate(list_transform(range(1, len(q.q_emb)+1),
                k -> CAST(q.q_emb[k] AS DOUBLE) * CAST(e.embedding[k] AS DOUBLE)), 'sum')
              / (sqrt(list_aggregate(list_transform(q.q_emb, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum'))
               * sqrt(list_aggregate(list_transform(e.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum')))) * 10000.0 + 0.5) / 10000.0 AS cos_sim
           FROM embeddings e JOIN q ON e.vec_id <> q.query_id),
          dense AS (SELECT query_id, doc_id,
            CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, doc_id ASC) AS BIGINT) dense_rnk
           FROM dsc QUALIFY dense_rnk <= 5),
          toks AS (SELECT DISTINCT doc_id, lower(unnest(string_split_regex(trim(text), '\s+'))) term
                   FROM documents WHERE trim(text) <> ''),
          toks2 AS (SELECT * FROM toks WHERE term <> ''),
          idf AS (SELECT term, floor(ln((SELECT count(*) FROM documents) * 1.0 / count(*)) * 10000.0 + 0.5) / 10000.0 AS idf
                  FROM toks2 GROUP BY term),
          qt AS (SELECT t.doc_id query_id, t.term, i.idf
                 FROM toks2 t JOIN idf i USING (term) WHERE t.doc_id % 50 = 0),
          lsc AS (SELECT qt.query_id, t.doc_id,
            floor(CAST(sum(CAST(qt.idf AS DECIMAL(18,4))) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS lex_score
           FROM qt JOIN toks2 t USING (term) WHERE t.doc_id <> qt.query_id
           GROUP BY qt.query_id, t.doc_id),
          lex AS (SELECT query_id, doc_id,
            CAST(row_number() OVER (PARTITION BY query_id ORDER BY lex_score DESC, doc_id ASC) AS BIGINT) lex_rnk
           FROM lsc QUALIFY lex_rnk <= 5),
          fused AS (SELECT COALESCE(d.query_id, l.query_id) query_id,
            COALESCE(d.doc_id, l.doc_id) doc_id, d.dense_rnk, l.lex_rnk,
            COALESCE(1.0 / (60 + d.dense_rnk), 0.0) + COALESCE(1.0 / (60 + l.lex_rnk), 0.0) AS rrf
           FROM dense d FULL OUTER JOIN lex l
             ON d.query_id = l.query_id AND d.doc_id = l.doc_id),
          r AS (SELECT query_id, doc_id, dense_rnk, lex_rnk, rrf,
            CAST(row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id ASC) AS BIGINT) rnk
           FROM fused QUALIFY rnk <= 5)
         SELECT query_id, rnk, doc_id,
          floor(rrf * 1000000.0 + 0.5) / 1000000.0 AS rrf,
          COALESCE(dense_rnk, 0) AS dense_rnk, COALESCE(lex_rnk, 0) AS lex_rnk
         FROM r ORDER BY query_id, rnk""",
    "p04_rag_retrieval" ->
      """WITH ch AS (SELECT doc_id,
             unnest(range(0, greatest((len(string_split_regex(trim(text), '\s+')) - 1) // 24, 0) + 1)) chunk_id
            FROM documents),
          emb AS (SELECT vec_id doc_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v,
             sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum')) nrm
            FROM embeddings),
          p AS (SELECT ch.doc_id, ch.chunk_id,
             list_transform(range(1, len(v)+1), k -> v[((k - 1 + (chunk_id % len(v))) % len(v)) + 1]) pv,
             nrm
            FROM ch JOIN emb ON ch.doc_id = emb.doc_id),
          q AS (SELECT vec_id query_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) qv,
             sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum')) qnrm
            FROM embeddings WHERE vec_id % 50 = 0),
          sc AS (SELECT q.query_id, p.doc_id, p.chunk_id,
             floor((list_aggregate(list_transform(range(1, len(qv)+1),
                 k -> qv[k] * pv[k]), 'sum') / (qnrm * nrm)) * 10000.0 + 0.5) / 10000.0 cos_sim
            FROM q JOIN p ON p.doc_id <> q.query_id),
          best AS (SELECT *, row_number() OVER (PARTITION BY query_id, doc_id
                     ORDER BY cos_sim DESC, chunk_id ASC) rn FROM sc),
          ranked AS (SELECT query_id, doc_id, chunk_id, cos_sim,
                      row_number() OVER (PARTITION BY query_id
                        ORDER BY cos_sim DESC, doc_id ASC, chunk_id ASC) rnk
                     FROM best WHERE rn = 1)
         SELECT query_id, CAST(rnk AS BIGINT) rnk, doc_id,
          CAST(chunk_id AS BIGINT) chunk_id, cos_sim
         FROM ranked WHERE rnk <= 5 ORDER BY query_id, rnk""")
}
