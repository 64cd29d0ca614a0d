package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (64-dim float
  * vectors).
  *
  *  - [[s01BruteForceTopK]] — exact cosine top-k: broadcast the (small)
  *    query set against the full corpus, rank per query. The corpus
  *    side streams through a single scan — at 100 TB this is one pass,
  *    shuffle-free except the final per-query top-k (TakeOrdered per
  *    partition + merge, via window over query_id which partitions by
  *    the tiny query-id key).
  *  - [[s02LshTopK]] — random-hyperplane LSH: 16-bit sign bucket per
  *    vector from fixed seeded hyperplanes, candidates = same bucket
  *    in ≥ 1 of 4 band tables, exact cosine re-rank within candidates.
  *    The scale path: candidate generation is a hash-bucket join, cost
  *    ~ O(n · bands) instead of O(n · |queries|) per query.
  */
object Similarity {

  /** Deterministic pseudo-random unit hyperplanes: 4 bands × 16 planes
    * × 64 dims, seeded — identical across runs and executors. */
  private[analytics] def hyperplanes(bands: Int, planes: Int, dim: Int): Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(bands, planes, dim)(rnd.nextGaussian())
  }

  /** Exact brute-force cosine top-10 per query vector (every 100th
    * vec_id). Oracle-checked. One scan of the corpus against a
    * broadcast query set; per-pair work is a single codegen'd dot. */
  def s01BruteForceTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = Dedup.normalizedVectors(spark, dir)
    bruteTopK(e, e.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm")),
      k = 10)
      .orderBy("query_id", "rnk")
  }

  /** Exact brute-force core over normalized frames — corpus
    * (vec_id, v, norm), queries (query_id, qv, qnorm). Ids share one
    * namespace: a corpus row with vec_id == query_id is the query
    * itself and is excluded. */
  private[analytics] def bruteTopK(e: DataFrame, q: DataFrame, k: Int): DataFrame = {
    import graft.functions.VectorFunctions._
    val scored = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
              Det.dround(array_dot(col("qv"), col("v")) / (col("qnorm") * col("norm")), 4).as("cos_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk").cast("bigint").as("rnk"),
              col("neighbor_id"), col("cos_sim"))
  }

  /** LSH-bucketed approximate top-k: same output shape as s01 but only
    * candidates sharing an LSH band bucket with the query are scored.
    * Rows-only check (approximate by construction). */
  def s02LshTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    lshTopK(e, e.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")),
      k = 10)
      .orderBy("query_id", "rnk")
  }

  /** (id, emb, band, sig) LSH bucket rows for a vector frame — 16
    * bands × 6-bit sign buckets over seeded random hyperplanes: for
    * moderate-similarity neighbors (θ≈60°) per-band collision is
    * (1-θ/π)^6 ≈ 0.08, so 16 bands give ~70% recall; raise Planes
    * (finer buckets, fewer candidates) when the corpus has
    * genuinely-near duplicates, raise Bands for recall. The 6-bit sign
    * signature is a left-fold acc*2 + bit, bit = sign(dot(v, plane)) —
    * the per-plane dot is the tight-loop array_dot expression (an
    * interpreted zip_with+aggregate fold here allocated a 64-element
    * product array per plane per band per vector and dominated s02's
    * runtime). Shared by the query-top-k (s02) and pairwise-dedup
    * (d07) paths. */
  private[analytics] def lshBuckets(df: DataFrame, idCol: String, embCol: String): DataFrame = {
    val Bands = 16; val Planes = 6; val Dim = 64
    val hp = hyperplanes(Bands, Planes, Dim)
    val spark2 = df.sparkSession
    import spark2.implicits._
    val hpDf = broadcast(
      hp.zipWithIndex.map { case (planes, b) => (b, planes.map(_.toSeq).toSeq) }
        .toSeq.toDF("band", "planes"))
    import graft.functions.VectorFunctions._
    def signature = aggregate(col("planes"), lit(0L), (acc, plane) =>
      acc * 2 + when(array_dot(col("v64"), plane) > 0, lit(1L)).otherwise(lit(0L)))
    df.select(col(idCol), col(embCol),
        as_double_array(col(embCol)).as("v64"))
      .crossJoin(hpDf)
      .select(col(idCol), col(embCol), col("band"), signature.as("sig"))
  }

  /** Random-hyperplane LSH core — corpus (vec_id, embedding), queries
    * (query_id, q_emb); same id-namespace rule as [[bruteTopK]]. */
  private[analytics] def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val bucketed = lshBuckets(corpus, "vec_id", "embedding")
    val qb = lshBuckets(queries, "query_id", "q_emb")
    val cands = bucketed.as("c").join(broadcast(qb).as("q"),
        col("c.band") === col("q.band") && col("c.sig") === col("q.sig") &&
        col("c.vec_id") =!= col("q.query_id"))
      .select(col("q.query_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
              col("q.q_emb").as("q_emb"), col("c.embedding").as("embedding"))
      .dropDuplicates("query_id", "neighbor_id")
    val scored = cands.select(col("query_id"), col("neighbor_id"),
      round(Dedup.cosine(col("q_emb"), col("embedding")), 4).as("cos_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk").cast("bigint").as("rnk"),
              col("neighbor_id"), col("cos_sim"))
  }

  /** IVF (inverted-file) approximate top-k: a deterministic k-means
    * coarse quantizer (Lloyd iterations as DataFrame aggregations)
    * partitions the corpus into `K` cells; each query probes its
    * `nProbe` nearest centroids and exact-reranks only those cells.
    * The 100 TB shape: the corpus is scanned once to assign cells
    * (then stored partitioned by cell), and a query touches
    * nProbe/K of the data. */
  // (neg cosine, cell) struct per centroid, as PURE per-row
  // expressions over the K=16 driver-side centroid literals — the
  // lexicographic array_min/array_sort over this array is the argmax
  // (score desc, cell asc). No crossJoin, no aggregation, no shuffle:
  // nearest-centroid assignment is a narrow map over the corpus —
  // the only shape that survives a Lloyd iteration at 100 TB.
  private[analytics] def cellScores(cents: Array[(Int, Array[Double])],
                                    v: Column, norm: Column): Column = {
    import graft.functions.VectorFunctions._
    array(cents.toIndexedSeq.map { case (cell, c) =>
      struct((-array_dot(v, typedLit(c)) / norm).as("ns"), lit(cell).as("cell"))
    }: _*)
  }
  private[analytics] def cellOf(cents: Array[(Int, Array[Double])],
                                v: Column, norm: Column): Column =
    array_min(cellScores(cents, v, norm)).getField("cell")

  /** Fit the IVF coarse quantizer (deterministic Lloyd iterations) and
    * assign every vector to its nearest cell. Returns the assigned
    * corpus (vec_id, v, norm, cell) and the fitted centroids — the
    * `cell` column is the partition key a 100 TB deployment writes the
    * corpus under (see the layout spec in PlanSpec). */
  private[analytics] def ivfFit(spark: SparkSession, dir: String,
                                k: Int = 16, iters: Int = 2)
      : (DataFrame, Array[(Int, Array[Double])]) =
    ivfFitOf(Dedup.normalizedVectors(spark, dir), k, iters)

  /** Vectors the quantizer trains on: a deterministic id-strided
    * sample capped at `maxFit` — codebook quality needs thousands of
    * representative vectors, not the corpus, so at 100 TB the Lloyd
    * iterations aggregate a bounded frame and only the final
    * assignment scans everything (the FAISS train/add split). */
  private val MaxFitVectors = 20000L
  private def fitSample(e: DataFrame): DataFrame = {
    val stride = math.max(1L, e.count() / MaxFitVectors)
    if (stride > 1) e.filter(col("vec_id") % stride === 0) else e
  }

  /** [[ivfFit]] over any normalized corpus frame (vec_id, v, norm). */
  private[analytics] def ivfFitOf(corpus: DataFrame, k: Int = 16, iters: Int = 2)
      : (DataFrame, Array[(Int, Array[Double])]) = {
    // cached through the whole query: the Lloyd loop, the final
    // assignment, and the query projection all read it, and the
    // Bench/Verify runners clearCache() after each query
    val e = corpus.cache()
    val fit = fitSample(e).cache()

    // deterministic init: the K lowest fit-sample vec_ids
    var centroids: Array[(Int, Array[Double])] = fit.orderBy("vec_id").limit(k)
      .collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](r.fieldIndex("v")).toArray) }

    for (_ <- 0 until iters) {
      // update: per-cell mean (deterministic) — one map + one hash agg
      // over the BOUNDED fit sample, never the corpus
      centroids = fit.groupBy(cellOf(centroids, col("v"), col("norm")).as("cell"))
        .agg(array((0 until 64).map(i => avg(element_at(col("v"), i + 1))): _*).as("centroid"))
        .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    }
    (e.withColumn("cell", cellOf(centroids, col("v"), col("norm"))), centroids)
  }

  def s03IvfTopK(spark: SparkSession, dir: String): DataFrame = {
    val (assigned, centroids) = ivfFit(spark, dir)
    ivfTopK(assigned, centroids,
      assigned.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm")),
      k = 10)
      .orderBy("query_id", "rnk")
  }

  /** IVF probe+rerank core over an [[ivfFit]]-assigned corpus —
    * queries (query_id, qv, qnorm); same id-namespace rule as
    * [[bruteTopK]]. */
  private[analytics] def ivfTopK(assigned: DataFrame,
                                 centroids: Array[(Int, Array[Double])],
                                 queries: DataFrame, k: Int,
                                 nProbe: Int = 4): DataFrame = {
    import graft.functions.VectorFunctions._
    // queries probe their nProbe nearest cells: sort the same K-struct
    // array per row and slice — again no crossJoin, no aggregation
    val probes = queries.select(col("query_id"), col("qv"), col("qnorm"),
      explode(slice(array_sort(cellScores(centroids, col("qv"), col("qnorm"))),
        1, nProbe).getField("cell")).as("cell"))

    // exact rerank within probed cells only; each vector lives in
    // exactly one cell so (query_id, neighbor_id) is already unique —
    // no dedup shuffle needed. Probes are tiny (|queries|·nProbe):
    // broadcast them against the assigned corpus.
    val scored = broadcast(probes).join(assigned, "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(array_dot(col("qv"), col("v")) / (col("qnorm") * col("norm")), 4).as("cos_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk").cast("bigint").as("rnk"),
              col("neighbor_id"), col("cos_sim"))
  }

  // ---- IVF-PQ: product-quantized approximate scoring ----
  private val PqM = 8       // subspaces
  private val PqSubDim = 8  // dims per subspace (8×8 = 64)
  private val PqKs = 16     // centroids per subspace → 4-bit codes

  /** 1-based slice of the `m`-th subvector. */
  private def subv(v: Column, m: Int): Column = slice(v, m * PqSubDim + 1, PqSubDim)

  /** Nearest sub-centroid id for a subvector, as a pure per-row
    * expression over the Ks codebook literals: argmin of squared L2 =
    * argmin of (|c|² − 2·x·c) since |x|² is constant per row — so the
    * per-cell score is one codegen'd [[graft.functions.VectorFunctions.array_dot]]
    * plus a scalar, and the argmin is a lexicographic array_min over
    * (score, cell) structs. No crossJoin, no shuffle — the same
    * assignment shape as the IVF coarse quantizer. */
  private def pqCell(codebook: Array[Array[Double]], sv: Column): Column = {
    import graft.functions.VectorFunctions._
    array_min(array(codebook.zipWithIndex.toIndexedSeq.map { case (c, cell) =>
      val cNorm2 = c.map(x => x * x).sum
      struct((lit(cNorm2) - lit(2.0) * array_dot(sv, typedLit(c.toSeq))).as("d"),
             lit(cell).as("cell"))
    }: _*)).getField("cell")
  }

  /** Fit per-subspace codebooks (deterministic Lloyd, ALL subspaces in
    * one shuffle per iteration via an M-way explode of 8-dim
    * subvectors) and PQ-encode the corpus to `M` 4-bit codes — 8 bytes
    * a vector instead of 256, the compression that lets a 100 TB
    * corpus's index live in executor memory. Returns the encoded
    * corpus (vec_id, norm, codes) and the codebooks. */
  private[analytics] def pqFitEncode(corpus: DataFrame, iters: Int = 1)
      : (DataFrame, Array[Array[Array[Double]]]) = {
    val e = corpus.cache()
    val fit = fitSample(e).cache()
    // deterministic spread init: Ks id-strided vectors — id-adjacent
    // vectors can be near-identical, and seeding Lloyd from a tight
    // clump wastes cells. A narrow modulo filter, never a global sort:
    // if the id space is sparse enough to under-fill, top up from the
    // lowest ids.
    val n = fit.count()
    val stride = math.max(1L, n / PqKs)
    var seed = fit.filter(col("vec_id") % stride === 0).orderBy("vec_id").limit(PqKs)
      .collect().map(_.getSeq[Double](1).toArray)
    if (seed.length < PqKs)
      seed = (seed ++ fit.orderBy("vec_id").limit(PqKs).collect()
        .map(_.getSeq[Double](1).toArray)).take(PqKs)
    var books: Array[Array[Array[Double]]] =
      Array.tabulate(PqM)(m => seed.map(_.slice(m * PqSubDim, (m + 1) * PqSubDim)))
    // per-iteration: explode to (m, sv) rows — 8 narrow 8-dim rows per
    // FIT-SAMPLE vector, then ONE hash agg keyed (m, cell) updates
    // every subspace's codebook together; the full corpus is only
    // touched once, by the encode below
    val sub = fit.select(explode(array((0 until PqM).map(m =>
        struct(lit(m).as("m"), subv(col("v"), m).as("sv"))): _*)).as("s"))
      .select(col("s.m").as("m"), col("s.sv").as("sv"))
    for (_ <- 0 until iters) {
      val cellByM = (1 until PqM).foldLeft(pqCell(books(0), col("sv"))) {
        (acc, m) => when(col("m") === m, pqCell(books(m), col("sv"))).otherwise(acc)
      }
      val fitted = sub.groupBy(col("m"), cellByM.as("cell"))
        .agg(array((0 until PqSubDim).map(i => avg(element_at(col("sv"), i + 1))): _*).as("c"))
        .collect()
      books = Array.tabulate(PqM) { m =>
        val got = fitted.filter(_.getInt(0) == m)
          .map(r => r.getInt(1) -> r.getSeq[Double](2).toArray).toMap
        // a cell can go empty during Lloyd: keep its previous centroid
        Array.tabulate(PqKs)(cell => got.getOrElse(cell, books(m)(cell)))
      }
    }
    val codes = array((0 until PqM).map(m => pqCell(books(m), subv(col("v"), m))): _*)
    // cached: output-sized (8 ints + a norm per vector) AND a hard
    // materialization boundary — without it CollapseProject inlines the
    // 8×16-dot code assignment through the non-equi ADC join and
    // re-encodes every vector once per QUERY PAIR (measured 11 s vs
    // ~2 s at sf0.1). At real scale, write the codes out once instead.
    (e.select(col("vec_id"), col("norm"), codes.as("codes")).cache(), books)
  }

  /** IVF-PQ approximate top-k: PQ-encoded corpus scored by asymmetric
    * distance computation — each query precomputes an M×Ks lookup table
    * of subvector·sub-centroid dots (a pure expression over the
    * codebook literals, broadcast with the query row), and a corpus
    * vector's approximate cosine is M table lookups instead of a
    * 64-dim dot. The ADC pass shortlists `refine·k` candidates per
    * query from the codes alone (8 bytes a vector); only the
    * shortlist's full vectors are fetched for an exact re-rank — the
    * FAISS refine pattern, and the reason the scan side can be 32×
    * smaller than the raw corpus at 100 TB. Rows-only gate
    * (approximate by construction). */
  def s04IvfPqTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = Dedup.normalizedVectors(spark, dir)
    val (encoded, books) = pqFitEncode(e)
    val queries = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm"))
    pqTopK(encoded, e, books, queries, k = 10).orderBy("query_id", "rnk")
  }

  private[analytics] def pqTopK(encoded: DataFrame, corpus: DataFrame,
                                books: Array[Array[Array[Double]]],
                                queries: DataFrame, k: Int,
                                refine: Int = 5): DataFrame = {
    import graft.functions.VectorFunctions._
    // per-query ADC lookup table: luts[m][cell] = q_sub(m) · codebook(m)(cell)
    val luts = array((0 until PqM).map { m =>
      array((0 until PqKs).map { cell =>
        array_dot(subv(col("qv"), m), typedLit(books(m)(cell).toSeq))
      }: _*)
    }: _*)
    val q = queries.select(col("query_id"), col("qnorm"), luts.as("luts"))
    // ADC sum as a fixed chain of element_at lookups — builtin,
    // codegen'd expressions only: an interpreted zip_with+aggregate
    // lambda pair here ran 5× slower than the 64-dim brute-force dot
    // it was supposed to undercut
    val adcSum = (0 until PqM).map { m =>
      element_at(element_at(col("luts"), m + 1), element_at(col("codes"), m + 1) + 1)
    }.reduce(_ + _)
    val adc = encoded.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (adcSum / (col("qnorm") * col("norm"))).as("adc_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc_sim").desc, col("neighbor_id").asc)
    val shortlist = adc.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k * refine)
      .select(col("query_id"), col("neighbor_id"))
    // exact re-rank: fetch full vectors for shortlist rows only —
    // |queries|·refine·k of them, so everything after the ADC scan is
    // query-bounded, never corpus-bounded
    val exact = shortlist
      .join(corpus.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
      .join(broadcast(queries.select(col("query_id"), col("qv"), col("qnorm"))), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        round(array_dot(col("qv"), col("v")) / (col("qnorm") * col("norm")), 4).as("cos_sim"))
    val wf = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    exact.withColumn("rnk", row_number().over(wf))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk").cast("bigint").as("rnk"),
              col("neighbor_id"), col("cos_sim"))
  }

  /** User-facing ANN search over arbitrary frames: corpus
    * (vec_id, embedding) × queries (query_id, embedding) → top-`k`
    * cosine neighbors per query as (query_id, rnk, neighbor_id,
    * cos_sim). `method`: `"brute"` (exact single-scan baseline),
    * `"lsh"` (random-hyperplane buckets), `"ivf"` (k-means cells,
    * probe + exact rerank — the 100 TB path), `"ivfpq"` (product-
    * quantized 8-byte codes + ADC shortlist + exact refine — the
    * path when even the IVF cells don't fit memory). Ids share one
    * namespace: a corpus row whose vec_id equals a query_id is
    * treated as that query itself and excluded from its results. */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
           method: String = "ivf"): DataFrame = {
    import graft.functions.VectorFunctions._
    def normalized(df: DataFrame, id: String, vOut: String, nOut: String) = df
      .select(col(id), as_double_array(col("embedding")).as(vOut))
      .withColumn(nOut, array_norm(col(vOut)))
    method match {
      case "brute" =>
        bruteTopK(normalized(corpus, "vec_id", "v", "norm"),
          normalized(queries, "query_id", "qv", "qnorm"), k)
      case "lsh" =>
        lshTopK(corpus.select(col("vec_id"), col("embedding")),
          queries.select(col("query_id"), col("embedding").as("q_emb")), k)
      case "ivf" =>
        val (assigned, centroids) = ivfFitOf(normalized(corpus, "vec_id", "v", "norm"))
        ivfTopK(assigned, centroids,
          normalized(queries, "query_id", "qv", "qnorm"), k)
      case "ivfpq" =>
        val e = normalized(corpus, "vec_id", "v", "norm")
        val (encoded, books) = pqFitEncode(e)
        pqTopK(encoded, e, books,
          normalized(queries, "query_id", "qv", "qnorm"), k)
      case other => throw new IllegalArgumentException(
        s"unknown ANN method '$other' (brute | lsh | ivf | ivfpq)")
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s01_ann_bruteforce" -> s01BruteForceTopK _,
    "s02_ann_lsh"        -> s02LshTopK _,
    "s03_ann_ivf"        -> s03IvfTopK _,
    "s04_ann_ivfpq"      -> s04IvfPqTopK _,
  )

  val oracleSql: Map[String, String] = Map(
    "s01_ann_bruteforce" ->
      """WITH q AS (SELECT vec_id query_id, embedding q_emb FROM embeddings WHERE vec_id % 100 = 0),
          scored AS (SELECT q.query_id, e.vec_id neighbor_id,
            floor((list_aggregate(list_transform(range(1, len(q.q_emb)+1),
                k -> CAST(q.q_emb[k] AS DOUBLE) * CAST(e.embedding[k] AS DOUBLE)), 'sum')
              / (sqrt(list_aggregate(list_transform(q.q_emb, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum'))
               * sqrt(list_aggregate(list_transform(e.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum')))) * 10000.0 + 0.5) / 10000.0 AS cos_sim
           FROM embeddings e JOIN q ON e.vec_id <> q.query_id),
          ranked AS (SELECT query_id, neighbor_id, cos_sim,
            row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) rnk
           FROM scored)
         SELECT query_id, CAST(rnk AS BIGINT) AS rnk, neighbor_id, cos_sim
         FROM ranked WHERE rnk <= 10 ORDER BY query_id, rnk""",
  )
}
