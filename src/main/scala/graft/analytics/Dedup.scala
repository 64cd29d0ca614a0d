package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for training-data pipelines, in three
  * scaling tiers over the `documents` table:
  *
  *  - [[d01NgramJaccardPairs]] — exact word-3-gram Jaccard on candidate
  *    pairs found via an inverted shingle index (explode + self-join).
  *    Exact, but quadratic in shingle collision groups: the CORRECTNESS
  *    baseline, oracle-checked against DuckDB.
  *  - [[d02MinHashPairs]] — MinHash signatures (64 perms) + LSH banding
  *    (16 bands × 4 rows): the 100 TB path. Cost is linear in corpus
  *    size + output pairs; the only shuffles are the signature groupBy
  *    and the band-bucket join, both keyed on small hashes, never on
  *    text. Candidates are verified with exact Jaccard.
  *  - [[d03SimHashPairs]] — 64-bit SimHash fingerprints; near-dup =
  *    Hamming distance ≤ 3, found via 4×16-bit chunk banding
  *    (pigeonhole: any pair at distance ≤ 3 shares ≥ 1 of 4 chunks).
  *  - [[d04EmbeddingNearDup]] — embedding-cosine near-dup pairs, exact
  *    brute force (the LSH-bucketed scale path is in Similarity.scala).
  *
  * All hashing uses Spark's `xxhash64` (seed 42) — deterministic across
  * runs and cluster sizes.
  */
object Dedup {

  private def tokens: Column = split(trim(col("text")), "\\s+")

  /** Distinct word-3-gram shingles per document via the single-pass
    * [[graft.functions.WordShingles]] expression (sub-3-token docs get
    * an empty array, so no token-count pre-filter — and therefore no
    * expensive filter expression for predicate pushdown to duplicate). */
  /** Distinct word-3-gram shingles per (doc_id, text) row — the
    * DataFrame-parameterized core [[graft.analytics.Pipeline.curate]]
    * composes over arbitrary (pre-filtered) corpora. */
  private[analytics] def shinglesOf(docs: DataFrame): DataFrame = {
    import graft.functions.WordShingles.word_shingles
    docs.select(col("doc_id"), word_shingles(col("text")).as("s"))
  }

  private def docShingles(spark: SparkSession, dir: String): DataFrame =
    shinglesOf(Tables.documents(spark, dir))

  /** Document-frequency cap for the d01 inverted index: a shingle
    * appearing in more than this many documents is a stop-shingle —
    * its candidate contribution is quadratic in df, and hot shingles
    * ("of the the…", boilerplate headers) are exactly what blows up an
    * exact pair expansion at scale. Chosen far above any fixture df
    * (max 25 at sf0.1) so gate output is unchanged; at 100 TB it
    * bounds the worst-case per-shingle pair group to MaxShingleDf²/2
    * and the per-row postings array to MaxShingleDf entries.
    *
    * Semantics under the cap: a capped shingle is dropped from the
    * `shared` numerator while n_i/n_j keep full set sizes, so for any
    * pair sharing a hot shingle the reported jaccard is a LOWER BOUND
    * on the exact value (pairs can only be under-reported, never
    * over-reported — conservative for a ≥-threshold near-dup filter).
    * When exact values matter at scale, re-verify surviving pairs with
    * an exact set intersection as d02 does. */
  private[graft] val MaxShingleDf = 2000

  /** Exact n-gram Jaccard near-dup pairs (threshold 0.2) via a
    * postings-list inverted index: ONE pass over the corpus builds
    * df-capped posting arrays (shuffle #1, keyed on shingle), pairs
    * come from a double explode of each sorted postings array (no
    * self-join, no quadratic array materialization — the inner slice
    * is lazy per row), and shingle-set sizes ride along inside the
    * postings structs so there is no join-back (shuffle #2 is the
    * final (i,j) count). Oracle-checked. */
  def d01NgramJaccardPairs(spark: SparkSession, dir: String): DataFrame =
    ngramJaccardPairsOf(docShingles(spark, dir))
      .filter(col("jaccard") >= 0.2)
      .orderBy("i", "j")

  /** Exact-Jaccard pair core over an arbitrary shingled corpus
    * (doc_id, s) — unfiltered/unordered; callers apply their own
    * jaccard threshold. */
  private[analytics] def ngramJaccardPairsOf(sh: DataFrame): DataFrame = {
    // n_sh rides inside the exploded struct so the generator child is a
    // (cheap) transform over the materialized shingle array, not a bare
    // attribute — InferFiltersFromGenerate only fires on attribute
    // children, so no `size(shingles(...)) > 0` filter gets inferred
    // and pushed into a second evaluation of the shingle computation.
    val inv = sh
      .select(col("doc_id"),
        explode(transform(col("s"), x =>
          struct(x.as("shingle"), size(col("s")).cast("long").as("n_sh")))).as("e"))
      // shingle identity, not content, is all the pair math needs — key
      // the postings on xxhash64 so the aggregate shuffles 8-byte longs
      // instead of shingle strings (the d09 rule; a collision merges two
      // shingles at birthday-in-2^64 odds, and the string-keyed oracles
      // of d01/d06/d11/p01 attest none materializes)
      .select(col("doc_id"), xxhash64(col("e.shingle")).as("shingle"),
        col("e.n_sh").as("n_sh"))
    val postings = inv.groupBy("shingle")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n_sh")))).as("docs"))
      .filter(size(col("docs")).between(2, MaxShingleDf))
    // all i<j pairs per postings list: posexplode picks the left
    // element, slice takes its strictly-later partners (sorted by
    // doc_id, so a.doc_id < b.doc_id by construction)
    val pairs = postings
      .select(col("docs"), posexplode(col("docs")).as(Seq("idx", "a")))
      .select(col("a"),
        explode(slice(col("docs"), col("idx") + lit(2), size(col("docs")))).as("b"))
    pairs.groupBy(
        col("a.doc_id").as("i"), col("a.n_sh").as("n_i"),
        col("b.doc_id").as("j"), col("b.n_sh").as("n_j"))
      .agg(count(lit(1)).as("shared"))
      .select(col("i"), col("j"),
        Det.dround(col("shared").cast("double") / (col("n_i") + col("n_j") - col("shared")), 4).as("jaccard"))
  }

  private val NumHashes = 64
  private val NumBands = 16
  private val RowsPerBand = NumHashes / NumBands // 4

  /** MinHash + LSH banding candidate generation, verified with exact
    * Jaccard. Returns (i, j, est_jaccard, jaccard) pairs with exact
    * Jaccard ≥ 0.2 — same final predicate as d01 so the two tiers are
    * comparable; at scale only this one is runnable. */
  def d02MinHashPairs(spark: SparkSession, dir: String): DataFrame =
    minHashPairsOf(docShingles(spark, dir))
      .filter(col("jaccard") >= 0.2)
      .orderBy("i", "j")

  /** LSH band array for a 64-slot MinHash signature: one
    * (band, bandhash) struct per band, the band hash an xxhash64 over
    * that band's RowsPerBand signature slots — built inline as an
    * expression (explode child, so no generate-filter inference).
    * Shared by the batch pair generation and the streaming near-dup
    * monitor (st07). */
  private[analytics] def bandStructs(sig: Column): Column =
    array((0 until NumBands).map { b =>
      val slots = (0 until RowsPerBand).map(r => element_at(sig, b * RowsPerBand + r + 1))
      struct(lit(b).as("band"), xxhash64(slots: _*).as("bh"))
    }: _*)

  /** MinHash+LSH near-dup pairs over an arbitrary shingled corpus
    * (doc_id, s) — unfiltered/unordered core; callers apply their own
    * jaccard threshold. */
  private[analytics] def minHashPairsOf(sh: DataFrame): DataFrame = {
    import graft.functions.MinHash64.minhash64
    // signature: the single-pass MinHash64 expression — a narrow
    // per-row map over the per-doc shingle arrays (no explode, no
    // groupBy shuffle, no aggregation state; each shingle string is
    // hashed ONCE then chained through the 64 slot indices).
    // Cached: output-sized (64 longs/doc), and it feeds both sides of
    // the band self-join plus the est_jaccard projection — without the
    // cache the whole shingle+signature pass re-runs 2-3x. Bench/Verify
    // clearCache() per query; at real scale, write the signatures out
    // once instead.
    val sigs = sh.select(col("doc_id"), minhash64(col("s")).as("sig"))
      .filter(col("sig").isNotNull) // sub-3-token docs (see MinHash64)
      .cache()
    val buckets = sigs
      .select(col("doc_id"), col("sig"), explode(bandStructs(col("sig"))).as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    // candidate pairs: same (band, bandhash) bucket; dedup across bands.
    // Cached: output-sized (candidate pairs only, not corpus-sized);
    // used three times below (two doc-id projections + the final join).
    // The Verify/Bench runners clearCache() after every query.
    val cands = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
              col("a.sig").as("sig_i"), col("b.sig").as("sig_j"))
      .dropDuplicates("i", "j")
      // signature-estimated jaccard = fraction of agreeing slots
      .select(col("i"), col("j"),
        (size(filter(zip_with(col("sig_i"), col("sig_j"), (x, y) => x === y), b => b))
          .cast("double") / NumHashes).as("est_jaccard"))
      .cache()
    // verify candidates with exact jaccard: ONE more corpus scan,
    // semi-joined down to candidate docs (also cached — bounded by
    // 2×candidates). No broadcast hint on candSh: it is candidate-
    // bounded, not corpus-bounded, so on a near-dup-heavy corpus its
    // shingle sets can exceed driver memory — AQE promotes the join to
    // broadcast at runtime when the cached size is actually small, and
    // falls back to a shuffle join when it isn't.
    // ids-only but still candidate-bounded — same no-hint rule: AQE
    // broadcasts the semi-join side only when it is actually small
    val candDocs = cands.select(col("i").as("doc_id"))
      .union(cands.select(col("j").as("doc_id"))).distinct()
    val candSh = sh.join(candDocs, "doc_id").cache()
    cands
      .join(candSh.withColumnRenamed("doc_id", "i").withColumnRenamed("s", "s_i"), "i")
      .join(candSh.withColumnRenamed("doc_id", "j").withColumnRenamed("s", "s_j"), "j")
      .select(col("i"), col("j"), round(col("est_jaccard"), 4).as("est_jaccard"),
        round(size(array_intersect(col("s_i"), col("s_j"))).cast("double") /
              size(array_union(col("s_i"), col("s_j"))), 4).as("jaccard"))
  }

  /** The d03 fingerprint frame (doc_id, simhash) — split out so
    * Verify's `d03_pairs_complete_singlenode` invariant can recompute
    * the ALL-PAIRS Hamming ground truth from the same fingerprints and
    * pin the banding pipeline's completeness (the expression itself is
    * pinned against the explode+aggregate formulation in
    * FunctionsSpec). */
  private[graft] def d03Fingerprints(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.SimHash64.simhash64
    Tables.documents(spark, dir)
      .select(col("doc_id"), simhash64(tokens).as("simhash"))
  }

  /** 64-bit SimHash near-dup pairs with Hamming distance ≤ 3, candidate
    * generation via 4×16-bit chunk banding (pigeonhole-exact for ≤ 3).
    * Fingerprints come from the single-pass [[graft.functions.SimHash64]]
    * expression: one row per doc, no explode/aggregation state. */
  def d03SimHashPairs(spark: SparkSession, dir: String): DataFrame = {
    val fps = d03Fingerprints(spark, dir)
    // 4×16-bit chunk banding: pigeonhole guarantees every pair with
    // hamming ≤ 3 shares ≥ 1 chunk (the canonical 64-bit/k=3 near-dup
    // setting); 16-bit buckets keep candidate groups small, so the
    // bucket self-join stays near-linear in corpus size
    val chunks = fps.select(col("doc_id"), col("simhash"),
        explode(array((0 until 4).map(c =>
          struct(lit(c).as("c"), shiftright(col("simhash"), c * 16).bitwiseAND(0xFFFF).as("v"))): _*)).as("ch"))
      .select(col("doc_id"), col("simhash"), col("ch.c").as("c"), col("ch.v").as("v"))
    chunks.as("a").join(chunks.as("b"),
        col("a.c") === col("b.c") && col("a.v") === col("b.v") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
              bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .dropDuplicates("i", "j")
      .filter(col("hamming") <= 3)
      .select(col("i"), col("j"), col("hamming").cast("bigint").as("hamming"))
      .orderBy("i", "j")
  }

  /** Cosine similarity between two float-vector columns via the
    * codegen'd dot-product expression; strict left-fold summation,
    * bit-compatible with the DuckDB oracle's list_aggregate sum. */
  def cosine(a: Column, b: Column): Column = {
    import graft.functions.VectorFunctions._
    val ad = as_double_array(a)
    val bd = as_double_array(b)
    array_dot(ad, bd) / (array_norm(ad) * array_norm(bd))
  }

  /** Embeddings with the vector cast to array<double> once and the L2
    * norm precomputed per vector (identical bits to recomputing per
    * pair, at 1/N-th the cost). */
  private[analytics] def normalizedVectors(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions._
    Tables.embeddings(spark, dir).select(col("vec_id"),
        as_double_array(col("embedding")).as("v"))
      .withColumn("norm", array_norm(col("v")))
  }

  /** Embedding-cosine near-dup pairs (exact brute force, threshold
    * 0.4 — the synthetic embeddings top out at ~0.51). At scale, use
    * the LSH-bucketed variant (Similarity.s02). The pair score is one
    * codegen'd dot product; norms come precomputed from the build
    * side, so the O(N²) loop does no redundant work. */
  def d04EmbeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions._
    val e = normalizedVectors(spark, dir)
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"),
        Det.dround(array_dot(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm")), 4).as("cos_sim"))
      .filter(col("cos_sim") >= 0.4)
      .orderBy("i", "j")
  }

  /** Flag threshold for [[t40SemanticDecontam]] — d04's cosine bar. */
  private val SemDecontamMin = 0.4

  /** t40 gate: SEMANTIC decontamination — the third tier of the
    * decontamination family (t14 exact 8-gram, t20 Bloom-prefiltered,
    * here embedding-cosine): paraphrased benchmark leakage shares no
    * 8-gram, but it lands next to the benchmark in embedding space.
    * The held-out "benchmark" is every 100th-offset-50 vector —
    * disjoint from the `% 100 = 0` query rule, though every such id
    * also satisfies p09/m10's `% 50 = 0` rule, so those query sets
    * CONTAIN it; a corpus doc is flagged
    * when its max cosine to ANY benchmark vector reaches the d04 bar.
    * Per source: docs, docs with vectors, flagged docs, max sim.
    *
    * Scale shape: the benchmark set is workload-bounded and BROADCAST
    * against one corpus scan (s01's shape — the corpus never
    * shuffles); the per-doc max is a partial aggregate. At 100 TB the
    * scorer swaps for the stored-index probe exactly like every
    * query-set gate. Fully oracle-checked. */
  def t40SemanticDecontam(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions._
    val e = normalizedVectors(spark, dir)
    val bench = e.filter(col("vec_id") % 100 === 50)
      .select(col("vec_id").as("bench_id"), col("v").as("bv"), col("norm").as("bnorm"))
    val flags = e.join(broadcast(bench), col("vec_id") =!= col("bench_id"))
      .select(col("vec_id"),
        Det.dround(array_dot(col("v"), col("bv")) / (col("norm") * col("bnorm")), 4)
          .as("sim"))
      .groupBy("vec_id").agg(max(col("sim")).as("max_sim"))
    Tables.documents(spark, dir).select(col("doc_id"), col("source"))
      .join(flags, col("doc_id") === col("vec_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           sum(when(col("max_sim").isNotNull, 1L).otherwise(0L)).as("n_with_vec"),
           sum(when(col("max_sim") >= SemDecontamMin, 1L).otherwise(0L)).as("n_flagged"),
           max(col("max_sim")).as("max_sim"))
      .orderBy("source")
  }

  /** Winnowing (rolling-hash) passage-level near-dup pairs — the
    * LOCAL-similarity tier: two docs sharing any ≥50 normalized-char
    * passage are guaranteed a common fingerprint
    * ([[graft.functions.WinnowFingerprints]], k=25, window=26), which
    * catches copied paragraphs inside otherwise-different documents —
    * the case a global MinHash signature dilutes away. Same df-capped
    * postings-index shape as d01: shuffle #1 keys on the 8-byte
    * fingerprint (never on text), pairs come from the lazy i<j postings
    * slice, shuffle #2 is the final pair count. Overlap coefficient
    * `shared / min(|f_i|,|f_j|)` scores containment so a short doc
    * pasted into a long one still scores high. */
  def d05WinnowPairs(spark: SparkSession, dir: String): DataFrame =
    winnowPairsOf(Tables.documents(spark, dir))
      .filter(col("shared") >= 2)
      .orderBy("i", "j")

  /** Winnowing pair core over an arbitrary (doc_id, text) corpus —
    * unfiltered/unordered; callers apply their own shared-fingerprint
    * threshold. */
  private[analytics] def winnowPairsOf(docs: DataFrame): DataFrame = {
    import graft.functions.WinnowFingerprints.winnow_fingerprints
    val fps = docs
      .select(col("doc_id"), winnow_fingerprints(col("text")).as("f"))
    val inv = fps
      .select(col("doc_id"),
        explode(transform(col("f"), x =>
          struct(x.as("fp"), size(col("f")).cast("long").as("n_f")))).as("e"))
      .select(col("doc_id"), col("e.fp").as("fp"), col("e.n_f").as("n_f"))
    val postings = inv.groupBy("fp")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n_f")))).as("docs"))
      .filter(size(col("docs")).between(2, MaxShingleDf))
    val pairs = postings
      .select(col("docs"), posexplode(col("docs")).as(Seq("idx", "a")))
      .select(col("a"),
        explode(slice(col("docs"), col("idx") + lit(2), size(col("docs")))).as("b"))
    pairs.groupBy(
        col("a.doc_id").as("i"), col("a.n_f").as("n_i"),
        col("b.doc_id").as("j"), col("b.n_f").as("n_j"))
      .agg(count(lit(1)).as("shared"))
      .select(col("i"), col("j"), col("shared"),
        Det.dround(col("shared").cast("double") / least(col("n_i"), col("n_j")), 4).as("overlap"))
  }

  /** Embedding near-dup pairs at scale — the LSH-bucketed tier that
    * replaces d04's O(N²) loop: candidates are vector pairs sharing a
    * random-hyperplane sign bucket in ≥1 of 16 bands
    * ([[Similarity.lshBuckets]], the same core as the s02 query path),
    * verified with one exact codegen'd cosine each. Cost is linear in
    * corpus + bucket-collision pairs; the bucket self-join keys on
    * (band, 6-bit sig) — never on the vector payload. Same 0.4
    * threshold as d04 so the two tiers are directly comparable
    * (recall vs d04 is asserted in CorpusOpsSpec). Rows-only gate
    * (LSH candidate generation has no SQL oracle). */
  def d07EmbeddingLshPairs(spark: SparkSession, dir: String): DataFrame =
    embeddingLshPairsOf(Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")))
      .filter(col("cos_sim") >= 0.4)
      .orderBy("i", "j")

  /** LSH-bucketed embedding pair core over an arbitrary
    * (vec_id, embedding) frame — exact-cosine-scored candidates,
    * unfiltered/unordered; callers apply their own threshold
    * ([[d07EmbeddingLshPairs]] and the curation `embedding` tier). */
  private[analytics] def embeddingLshPairsOf(e: DataFrame): DataFrame = {
    // candidate generation on (band, sig, id) rows ONLY — a duplicate-
    // heavy corpus collides the same pair in all 16 bands, and carrying
    // the 64-float payload through every collision copy made the
    // band join 16× heavier than it needs to be (measured 46× at a 10×
    // replica corpus; ids-only + verify join-back is the d02 shape)
    val b = Similarity.lshBuckets(e, "vec_id", "embedding")
      .select(col("vec_id"), col("band"), col("sig"))
    val cands = b.as("a").join(b.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"))
      .dropDuplicates("i", "j")
    // exact verify: two candidate-bounded joins fetch the vectors once
    // per surviving pair (no broadcast hint — AQE's call, as in d02)
    cands
      .join(e.select(col("vec_id").as("i"), col("embedding").as("e_i")), "i")
      .join(e.select(col("vec_id").as("j"), col("embedding").as("e_j")), "j")
      .select(col("i"), col("j"),
        Det.dround(cosine(col("e_i"), col("e_j")), 4).as("cos_sim"))
  }

  /** Duplicate-cluster assignment — near-dup detection's missing last
    * step: pairwise near-dup output (d01's exact-Jaccard graph,
    * threshold 0.2) is only half the operator a curation run needs;
    * picking ONE survivor per duplicate GROUP requires the connected
    * components of the pair graph. Computed by distributed min-label
    * propagation: every round is one edges⋈labels shuffle join plus a
    * partial-aggregating min-groupBy, the only driver-side value is the
    * scalar changed-label count that decides convergence, and rounds
    * are bounded by the largest component's diameter — near-dup
    * clusters are shallow (dup groups are cliques or near-cliques), so
    * this converges in 2-3 rounds where a transitive-closure self-join
    * would explode. Edges and the current labels are cached per round,
    * previous-round caches released immediately. Output: one row per
    * clustered doc with its cluster representative (min doc_id) and
    * cluster size — oracle-checked against a DuckDB recursive CTE. */
  def d06DupClusters(spark: SparkSession, dir: String): DataFrame =
    dupClustersOf(ngramJaccardPairsOf(docShingles(spark, dir))
      .filter(col("jaccard") >= 0.2))

  /** Connected components over an undirected pair list `(i, j)` —
    * the clustering core behind [[d06DupClusters]] and
    * [[d08EmbeddingDupClusters]], reusable over any near-dup pair
    * output (d01/d02/d03/d05/d07). Returns one row per node:
    * `(doc_id, cluster_id = component min, cluster_size)`.
    *
    * Hybrid execution: the pair graph is OUTPUT-sized (near-dup pairs
    * after thresholding), not corpus-sized, so when it fits
    * comfortably on the driver (≤ [[maxLocalEdges]], ~160 MB at the
    * default) a union-find over the collected edges answers in
    * milliseconds — a distributed loop would spend 30+ scheduler
    * round trips on a graph one core can chew through. Above the
    * threshold, the distributed min-label-propagation +
    * pointer-jumping loop takes over (O(log diameter) rounds, lineage
    * truncated per round); both paths produce identical output and
    * the planted-graph spec pins them against each other. */
  private[analytics] def dupClustersOf(pairs: DataFrame,
                                       maxLocalEdges: Long = 10000000L): DataFrame = {
    val ij = pairs.select(col("i"), col("j")).cache()
    if (ij.count() <= maxLocalEdges) return localClusters(ij)
    val edges = ij.union(ij.select(col("j"), col("i")))
      .toDF("src", "dst").cache()
    // init fused with propagation round 1: label(n) = min(n, neighbors)
    // directly from the edge list — one groupBy replaces the distinct
    // shuffle AND the first full round
    var labels = edges.select(col("src").as("node"), col("dst").as("label"))
      .unionByName(edges.select(col("src").as("node"), col("src").as("label")))
      .groupBy("node").agg(min("label").as("label")).cache()
    // labels only ever decrease, so the exact (decimal — overflow-proof
    // at any corpus size) label sum is strictly monotone until the
    // fixpoint: convergence needs one scalar aggregation per round, not
    // a next⋈prev anti-join over corpus-sized label sets
    def labelSum(df: DataFrame): java.math.BigDecimal =
      // sum over an EMPTY label set is SQL NULL — map it to zero so a
      // dup-free corpus converges on the first round instead of NPEing
      Option(df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    var prevSum = labelSum(labels)
    var converged = false
    while (!converged) {
      val prop = edges.join(labels, col("src") === col("node"))
        .select(col("dst").as("node"), col("label"))
      // localCheckpoint, not cache: caching truncates EXECUTION but the
      // logical plan still accumulates one join+agg layer per round,
      // and Catalyst re-analyzes the whole tower every round — O(R²)
      // planning that dwarfs the actual work on high-diameter graphs.
      // Checkpointing cuts the lineage so every round plans O(1); it
      // also makes the pointer-jump below a clean leaf self-join.
      val combined = labels.unionByName(prop)
        .groupBy("node").agg(min("label").as("label"))
        .localCheckpoint(true)
      // pointer jumping: label := min(label, label(label)) — a label is
      // itself a node id, so one extra self-join halves the remaining
      // distance to the component minimum each round (O(log diameter)
      // rounds instead of O(diameter) — a chain-shaped component at a
      // loose similarity threshold otherwise needs hundreds of rounds)
      val next = combined
        .join(combined.select(col("node").as("label"), col("label").as("ll")),
          Seq("label"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("ll"), col("label"))).as("label"))
        .localCheckpoint(true)
      combined.unpersist()
      val nextSum = labelSum(next)
      labels.unpersist()
      labels = next
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
    }
    // labels stays cached: the returned frame is lazy, so dropping the
    // cache here would make the caller's action re-run every propagation
    // round from scratch. The Verify/Bench runners clearCache() per query.
    val sizes = labels.groupBy("label").agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "label")
      .select(col("node").as("doc_id"), col("label").as("cluster_id"), col("cluster_size"))
      .orderBy("doc_id")
  }

  /** Driver-side union-find over a collected edge list — the fast path
    * for pair graphs that fit on the driver. Union-by-min-root keeps
    * every root the minimum id of its component, so output is
    * bit-identical to the distributed path. */
  private def localClusters(ij: DataFrame): DataFrame = {
    val spark2 = ij.sparkSession
    import spark2.implicits._
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    ij.collect().foreach { row =>
      val i = row.getLong(0); val j = row.getLong(1)
      parent.getOrElseUpdate(i, i); parent.getOrElseUpdate(j, j)
      val ri = find(i); val rj = find(j)
      if (ri != rj) {
        if (ri < rj) parent(rj) = ri else parent(ri) = rj
      }
    }
    val assigned = parent.keys.toSeq.map(n => n -> find(n))
    val sizes = assigned.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assigned.map { case (n, r) => (n, r, sizes(r)) }
      .toDF("doc_id", "cluster_id", "cluster_size")
      .orderBy("doc_id")
  }

  /** Embedding duplicate clusters (the SemDeDup shape: semantic
    * near-dup pairs → connected components → one survivor per
    * cluster): [[dupClustersOf]] composed over [[d04EmbeddingNearDup]]'s
    * exact cosine pairs — text and embedding dedup share one
    * clustering core. Oracle-checked against a DuckDB recursive CTE
    * over the same pair predicate. */
  def d08EmbeddingDupClusters(spark: SparkSession, dir: String): DataFrame =
    dupClustersOf(d04EmbeddingNearDup(spark, dir).select(col("i"), col("j")))
      .select(col("doc_id").as("vec_id"), col("cluster_id"), col("cluster_size"))
      .orderBy("vec_id")

  /** Quality-aware survivor selection — the keep policy a production
    * dedup actually runs: d06 told us WHICH documents form a duplicate
    * group; this picks the one copy worth keeping, by quality, not by
    * arrival order. Survivor = the cluster's max type-token ratio
    * (distinct tokens / tokens — the t03 quality signal), ties broken
    * to the smallest doc_id. Output per cluster: survivor id, its
    * quality, cluster size, and how many copies the policy removes.
    *
    * Scale shape: the cluster table is OUTPUT-sized (only clustered
    * docs), the per-doc quality is a narrow projection computed before
    * the join (so the equi join on doc_id moves one double per doc,
    * never token arrays), and the argmax is a partial-aggregating
    * `max(struct(quality, -doc_id))` groupBy — struct ordering is
    * lexicographic, so map-side combine already reduces every
    * partition to one candidate per cluster and NO per-cluster window
    * (single-partition-per-key shuffle) exists anywhere. */
  def d11ClusterSurvivors(spark: SparkSession, dir: String): DataFrame = {
    val clusters = d06DupClusters(spark, dir)
    val toks = split(trim(col("text")), "\\s+")
    val quality = Tables.documents(spark, dir)
      .select(col("doc_id"),
        Det.dround(size(array_distinct(toks)).cast("double") / size(toks), 4).as("q"))
    clusters.join(quality, "doc_id")
      .groupBy(col("cluster_id"), col("cluster_size"))
      .agg(max(struct(col("q").as("q"), (-col("doc_id")).as("nid"))).as("best"))
      .select(col("cluster_id"),
        (-col("best.nid")).as("survivor"),
        col("best.q").as("quality"),
        col("cluster_size"),
        (col("cluster_size") - 1).as("n_removed"))
      .orderBy("cluster_id")
  }

  /** Gram length for [[d09ExactSubstr]] — the "minimum duplicated
    * substring worth removing" threshold (Lee et al. use 50 BPE
    * tokens; 40 chars plays that role on this fixture's ~300-char
    * docs). */
  private[analytics] val SubstrGramLen = 40

  /** Exact duplicated-substring spans — the ExactSubstr dedup of
    * "Deduplicating Training Data Makes Language Models Better"
    * (Lee et al., 2022), re-expressed as relational passes instead of
    * a suffix array: every length-40 character gram is keyed globally;
    * an occurrence is DUPLICATED unless it is the corpus-wide first
    * (smallest (doc_id, pos), the suffix-array keep-first policy);
    * per document, duplicated gram intervals [pos, pos+40) merge into
    * maximal spans (gaps-and-islands), so overlapping grams of one
    * long repeated passage count its characters once. Output per
    * affected document: span count, duplicated chars, duplicated
    * fraction of the text.
    *
    * Scale shape: the gram table is ~len(text) rows per document, and
    * its key is the 8-byte rolling hash from [[graft.functions.GramHashes]]
    * (one O(len) pass, no gram string ever materialized — grouping and
    * joining on fixed-width longs instead of 40-byte strings is what
    * keeps the hash-aggregate and shuffle k× smaller; a collision
    * over-marks a span at birthday-in-2^64 odds, and the oracle's
    * string-keyed recomputation attests none materializes). The
    * keep-first marking is a partial-aggregating groupBy on that key
    * (min(k), count — map-side combined, so a boilerplate gram that
    * appears a billion times still ships one (min, count) pair per
    * partition) followed by an equi join back, which AQE skew-splits
    * if a hot gram dominates — deliberately NOT a per-gram window,
    * whose single partition per gram cannot be split. Span merging is
    * windowed per doc_id, bounded by document length. */
  def d09ExactSubstr(spark: SparkSession, dir: String): DataFrame =
    dupSpans(spark, dir).groupBy("doc_id", "len")
      .agg(count(lit(1)).as("n_dup_spans"),
           sum(col("e") - col("s")).as("dc"))
      .select(col("doc_id"), col("n_dup_spans"),
        col("dc").cast("bigint").as("dup_chars"),
        Det.dround(col("dc").cast("double") / col("len"), 4).as("dup_frac"))
      .orderBy("doc_id")

  /** The d09/d10 core: maximal duplicated-character spans per document,
    * as (doc_id, len, s, e) with e exclusive — see [[d09ExactSubstr]]
    * for the algorithm and scale shape. */
  private[analytics] def dupSpans(spark: SparkSession, dir: String): DataFrame =
    exactSubstrSpans(Tables.documents(spark, dir), SubstrGramLen)

  /** User-facing ExactSubstr span detection over an arbitrary
    * (doc_id, text) frame: maximal duplicated-character spans as
    * (doc_id, len, s, e), 1-based, `e` exclusive; the corpus-wide
    * first occurrence of each passage is never marked. `gramLen` is
    * the minimum duplicated-substring length worth flagging (Lee et
    * al. use ~50 BPE tokens; pick the char equivalent for your
    * tokenizer). */
  def exactSubstrSpans(corpus: DataFrame, gramLen: Int = SubstrGramLen): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.GramHashes.gram_hashes
    val L = gramLen
    val docs = corpus
      .select(col("doc_id"), col("text"), length(col("text")).as("len"))
      .filter(col("len") >= L)
    // k: global occurrence order in one comparable long (pos < 1e9)
    val grams = docs.select(
      col("doc_id"), col("len"),
      posexplode(gram_hashes(col("text"), L)))
      .select(col("doc_id"), col("len"), (col("pos") + 1).as("pos"),
        col("col").as("gram"),
        (col("doc_id") * lit(1000000000L) + col("pos") + 1).as("k"))
    val firsts = grams.groupBy("gram")
      .agg(min(col("k")).as("first_k"), count(lit(1)).as("c"))
      .filter(col("c") > 1)
    val dup = grams.join(firsts, "gram")
      .filter(col("k") =!= col("first_k"))
      .select(col("doc_id"), col("len"), col("pos"), (col("pos") + L).as("e"))
    val w = Window.partitionBy("doc_id").orderBy("pos", "e")
    val pmax = max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1))
    dup
      .withColumn("new_span", when(pmax.isNull || col("pos") > pmax, 1).otherwise(0))
      .withColumn("island", sum(col("new_span")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("len"), col("island"))
      .agg(min("pos").as("s"), max("e").as("e"))
      .select(col("doc_id"), col("len"), col("s"), col("e"))
  }

  /** Exact-substring REMOVAL — the end product of [[d09ExactSubstr]]:
    * cut every duplicated span out of every document (the corpus-wide
    * first occurrence of each passage survives, so exactly one copy of
    * every repeated passage remains in the cleaned corpus — Lee et
    * al.'s ExactSubstr deduplication applied, not just measured).
    * Output per document (ALL documents, untouched ones included):
    * original/cleaned length, spans cut, and the md5 of the cleaned
    * text — the digest keeps the gate narrow while pinning every byte
    * of the reconstruction cross-engine.
    *
    * Scale shape: the span table is output-sized (only affected docs),
    * sorted per doc into an array — bounded by doc length — and the
    * cut itself is one `aggregate` higher-order fold per document over
    * that array (each kept segment sliced once, no per-span join, no
    * explode). The docs⋈spans join is an equi join on doc_id; nothing
    * here is corpus×corpus. */
  def d10ExactSubstrClean(spark: SparkSession, dir: String): DataFrame =
    exactSubstrClean(Tables.documents(spark, dir), SubstrGramLen)
      .select(col("doc_id"), col("orig_len"), col("clean_len"),
        col("n_cut_spans"), md5(col("clean_text").cast("binary")).as("clean_md5"))
      // always true (md5 hex is 32 chars), but not provably so to the
      // optimizer: without it a bare count() eliminates the spans join
      // (aggregated-on-key right side, no columns referenced) and
      // "measures" d10 as a document scan — this pins every timed
      // action to the real reconstruction the gate's parquet dump pays
      .filter(length(col("clean_md5")) === 32)
      .orderBy("doc_id")

  /** User-facing ExactSubstr REMOVAL over an arbitrary (doc_id, text)
    * frame: returns every document with its duplicated spans cut
    * (first occurrence corpus-wide survives) as (doc_id, orig_len,
    * clean_len, n_cut_spans, clean_text). See [[d10ExactSubstrClean]]
    * for the gate form and scale shape. */
  def exactSubstrClean(corpus: DataFrame, gramLen: Int = SubstrGramLen): DataFrame = {
    val docs = corpus
      .select(col("doc_id"), col("text"), length(col("text")).as("len"))
    val spanList = exactSubstrSpans(corpus, gramLen)
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("spans"))
    val cleaned = docs.join(spanList, Seq("doc_id"), "left")
      .withColumn("clean",
        when(col("spans").isNull, col("text")).otherwise(
          // fold over the sorted spans: emit the kept segment before
          // each span, carry the cursor past it, then emit the tail
          aggregate(
            col("spans"),
            struct(lit(1).as("p"), lit("").as("acc")),
            (st, sp) => struct(
              sp.getField("e").as("p"),
              concat(st.getField("acc"),
                col("text").substr(st.getField("p"),
                  sp.getField("s") - st.getField("p"))).as("acc")),
            st => concat(st.getField("acc"),
              col("text").substr(st.getField("p"),
                col("len") - st.getField("p") + 1)))))
    cleaned.select(col("doc_id"),
      col("len").cast("bigint").as("orig_len"),
      length(col("clean")).cast("bigint").as("clean_len"),
      coalesce(size(col("spans")), lit(0)).cast("bigint").as("n_cut_spans"),
      col("clean").as("clean_text"))
  }

  /** Incremental dedup against an ingest ledger — the shape every
    * long-running corpus actually needs: yesterday's corpus is
    * already ingested (here: the `src0`–`src9` slice plays the
    * ledger), and TODAY'S batch must drop (a) anything the ledger
    * already holds and (b) within-batch duplicates, with per-source
    * accounting of why each document fell. Precedence is
    * ledger-first (a re-crawled known document is a ledger hit, not
    * a within-batch dup).
    *
    * Scale shape: the ledger side is a DISTINCT-fingerprint semi
    * join — at 100 TB the ledger fingerprint set rides behind a
    * Bloom pre-filter exactly like t20's decontamination tier
    * (fingerprints are 16-byte keys, never text), and the
    * within-batch winner pick is t06's partial-aggregating
    * groupBy(fp) → min — map-side combine bounds both shuffles by
    * distinct-fingerprint count, not corpus size. */
  def d12IncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val fp = substring(md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")), 1, 16)
    val d = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), fp.as("fp"))
    val isLedger = col("source").rlike("^src[0-9]$")
    val ledger = d.filter(isLedger).select("fp").distinct()
      .withColumn("in_ledger", lit(true))
    val batch = d.filter(!isLedger)
    val flagged = batch.join(ledger, Seq("fp"), "left")
    val winners = flagged.filter(col("in_ledger").isNull)
      .groupBy("fp").agg(min("doc_id").as("keep_id"))
    flagged.join(winners, Seq("fp"), "left")
      .select(col("source"),
        when(col("in_ledger").isNotNull, "ledger")
          .when(col("doc_id") =!= col("keep_id"), "within")
          .otherwise("kept").as("status"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           sum(when(col("status") === "ledger", 1L).otherwise(0L)).as("n_ledger_dups"),
           sum(when(col("status") === "within", 1L).otherwise(0L)).as("n_within_dups"),
           sum(when(col("status") === "kept", 1L).otherwise(0L)).as("n_kept"))
      .orderBy("source")
  }

  /** Train/holdout leakage audit — the check that makes a split
    * trustworthy: t23's content-hash split guarantees EXACT
    * duplicates land in one split, but semantic near-dups (d04's
    * cosine pairs) can still straddle train and holdout and leak
    * evaluation signal. Per unordered split pair: how many near-dup
    * pairs connect them and the tightest cosine involved — the
    * off-diagonal rows are the leaks a pipeline owner must resolve
    * (move or drop one side). Composes two oracle-checked operators
    * (d04's pair predicate, t23's split gate), so it is
    * oracle-checked end to end itself; the pair join inherits d04's
    * scale tier (swap in d07's LSH candidates at 100 TB). */
  def d13SplitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val h = substring(md5(col("text")), 1, 2)
    val split = when(h < "cc", "train").when(h < "e6", "val").otherwise("test")
    val splits = Tables.documents(spark, dir)
      .select(col("doc_id"), split.as("split"))
    val pairs = d04EmbeddingNearDup(spark, dir)
    pairs
      .join(splits.select(col("doc_id").as("i"), col("split").as("split_i")), "i")
      .join(splits.select(col("doc_id").as("j"), col("split").as("split_j")), "j")
      .select(least(col("split_i"), col("split_j")).as("split_a"),
              greatest(col("split_i"), col("split_j")).as("split_b"),
              col("cos_sim"))
      .groupBy("split_a", "split_b")
      .agg(count(lit(1)).as("n_pairs"), max("cos_sim").as("max_cos"))
      .orderBy("split_a", "split_b")
  }

  /** The derived "tomorrow" snapshot d14/st18 diff against — a
    * deterministic, SQL-expressible mutation of the corpus so the CDC
    * output has an exact DuckDB oracle: every `doc_id % 10 == 7` doc
    * is deleted, every `% 10 == 3` doc is revised (suffix appended),
    * and every `% 10 == 0` doc gains a NEGATED-id copy (the "added"
    * rows — `-(doc_id+1)` can never collide with a real id at any
    * corpus size, since corpus ids are non-negative). Emitted as
    * (doc_id, new_md5) pairs — the diff never needs snapshot-B text,
    * only its content hash. */
  private[analytics] def cdcSnapshotB(docs: DataFrame): DataFrame =
    cdcSnapshotBText(docs)
      .select(col("doc_id"), md5(col("text")).as("new_md5"))

  /** The single definition of the derived-snapshot mutation rule,
    * carrying full rows (doc_id, source, lang, text) — what a
    * downstream consumer re-processing the diff reads; [[cdcSnapshotB]]
    * is its hash projection, so the rule cannot drift between the
    * diff and its consumers. */
  private[analytics] def cdcSnapshotBText(docs: DataFrame): DataFrame = {
    val revised = when(col("doc_id") % 10 === 3,
      concat(col("text"), lit(" [rev2]"))).otherwise(col("text"))
    val bRows = array(
      when(col("doc_id") % 10 =!= 7,
        struct(col("doc_id").as("doc_id"), col("source").as("source"),
          col("lang").as("lang"), revised.as("text"))),
      when(col("doc_id") % 10 === 0,
        struct((-(col("doc_id") + 1L)).as("doc_id"), col("source").as("source"),
          col("lang").as("lang"), col("text").as("text"))))
    docs.select(explode(filter(bRows, r => r.isNotNull)).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.source").as("source"),
        col("r.lang").as("lang"), col("r.text").as("text"))
  }

  /** The CDC rollup: full-outer join of the two snapshots' (id, hash)
    * pairs. Hashes are computed map-side BEFORE the join, so the
    * shuffle carries 48-byte rows, never document text — at 100 TB the
    * diff of two corpus snapshots moves id+hash pairs only. */
  private[analytics] def cdcDiff(a: DataFrame, b: DataFrame): DataFrame =
    a.join(b, Seq("doc_id"), "full_outer")
      .withColumn("change_type",
        when(col("old_md5").isNull, "added")
          .when(col("new_md5").isNull, "deleted")
          .otherwise("changed"))
      .filter(col("old_md5").isNull || col("new_md5").isNull ||
              col("old_md5") =!= col("new_md5"))
      .select(col("doc_id"), col("change_type"),
        coalesce(col("old_md5"), lit("")).as("old_md5"),
        coalesce(col("new_md5"), lit("")).as("new_md5"))
      .orderBy("doc_id")

  /** d14 gate: snapshot CDC — the added/deleted/changed rows between
    * the corpus and its derived next-day snapshot, by content hash.
    * This is the incremental-pipeline front door: downstream dedup,
    * embedding, and index maintenance (d12, s11) re-process exactly
    * these rows, not the corpus. Oracle-exact (md5 is engine-neutral). */
  def d14SnapshotCdc(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val a = docs.select(col("doc_id"), md5(col("text")).as("old_md5"))
    cdcDiff(a, cdcSnapshotB(docs))
  }

  /** d15 gate: CDC APPLY — the other half of d14's loop. Fold the
    * change rows into the previous snapshot with one keyed outer
    * join: deletes drop, changes replace, adds insert, untouched rows
    * pass through. The merged snapshot must equal the new snapshot
    * EXACTLY (the oracle derives B independently), which is the
    * MERGE INTO contract: at 100 TB the join shuffles (id, hash)
    * pairs and only changed partitions rewrite — history is never
    * rescanned. Output is the merged (doc_id, md5) snapshot itself,
    * so any divergence anywhere in the corpus fails the hash. */
  def d15CdcApply(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val a = docs.select(col("doc_id"), md5(col("text")).as("old_md5"))
    val changes = cdcDiff(a, cdcSnapshotB(docs))
    a.select(col("doc_id"), col("old_md5").as("prev_md5"))
      .join(changes, Seq("doc_id"), "full_outer")
      .filter(coalesce(col("change_type"), lit("")) =!= "deleted")
      .select(col("doc_id"),
        when(col("change_type").isin("added", "changed"), col("new_md5"))
          .otherwise(col("prev_md5")).as("new_md5"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d01_ngram_jaccard_pairs" -> d01NgramJaccardPairs _,
    "d02_minhash_pairs"       -> d02MinHashPairs _,
    "d03_simhash_pairs"       -> d03SimHashPairs _,
    "d04_embedding_neardup"   -> d04EmbeddingNearDup _,
    "d05_winnow_pairs"        -> d05WinnowPairs _,
    "d06_dup_clusters"        -> d06DupClusters _,
    "d07_embedding_lsh_pairs" -> d07EmbeddingLshPairs _,
    "d08_embedding_clusters"  -> d08EmbeddingDupClusters _,
    "d09_exact_substr"        -> d09ExactSubstr _,
    "d10_substr_clean"        -> d10ExactSubstrClean _,
    "d11_cluster_survivors"   -> d11ClusterSurvivors _,
    "d12_incremental_dedup"   -> d12IncrementalDedup _,
    "d13_split_leakage"       -> d13SplitLeakage _,
    "d14_snapshot_cdc"        -> d14SnapshotCdc _,
    "d15_cdc_apply"           -> d15CdcApply _,
    "t40_semantic_decontam"   -> t40SemanticDecontam _,
  )

  /** d02/d03 use Spark xxhash64 and d05 a u64 rolling hash — not
    * reproducible in DuckDB SQL, so they get the driver's rows-only
    * check; d01/d04 are exact. */
  val oracleSql: Map[String, String] = Map(
    "d15_cdc_apply" ->
      """WITH b AS (SELECT doc_id,
                     md5(CASE WHEN doc_id % 10 = 3 THEN text || ' [rev2]' ELSE text END) new_md5
                    FROM documents WHERE doc_id % 10 <> 7
                    UNION ALL
                    SELECT -(doc_id + 1) AS doc_id, md5(text) new_md5
                    FROM documents WHERE doc_id % 10 = 0)
         SELECT doc_id, new_md5 FROM b ORDER BY doc_id""",
    "d14_snapshot_cdc" ->
      """WITH b AS (SELECT doc_id,
                     md5(CASE WHEN doc_id % 10 = 3 THEN text || ' [rev2]' ELSE text END) new_md5
                    FROM documents WHERE doc_id % 10 <> 7
                    UNION ALL
                    SELECT -(doc_id + 1) AS doc_id, md5(text) new_md5
                    FROM documents WHERE doc_id % 10 = 0),
          a AS (SELECT doc_id, md5(text) old_md5 FROM documents)
         SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
          CASE WHEN a.doc_id IS NULL THEN 'added'
               WHEN b.doc_id IS NULL THEN 'deleted'
               ELSE 'changed' END AS change_type,
          COALESCE(old_md5, '') AS old_md5, COALESCE(new_md5, '') AS new_md5
         FROM a FULL JOIN b ON a.doc_id = b.doc_id
         WHERE a.doc_id IS NULL OR b.doc_id IS NULL OR old_md5 <> new_md5
         ORDER BY doc_id""",
    "d12_incremental_dedup" ->
      """WITH d AS (SELECT source, doc_id,
                     substr(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 16) fp
                    FROM documents),
          ledger AS (SELECT DISTINCT fp FROM d WHERE regexp_matches(source, '^src[0-9]$')),
          batch AS (SELECT * FROM d WHERE NOT regexp_matches(source, '^src[0-9]$')),
          flagged AS (SELECT b.*, b.fp IN (SELECT fp FROM ledger) in_ledger FROM batch b),
          winners AS (SELECT fp, min(doc_id) keep_id FROM flagged WHERE NOT in_ledger GROUP BY fp),
          st AS (SELECT f.source,
                  CASE WHEN f.in_ledger THEN 'ledger'
                       WHEN f.doc_id <> w.keep_id THEN 'within'
                       ELSE 'kept' END status
                 FROM flagged f LEFT JOIN winners w USING (fp))
         SELECT source, count(*) AS n_docs,
          CAST(sum(CASE WHEN status = 'ledger' THEN 1 ELSE 0 END) AS BIGINT) AS n_ledger_dups,
          CAST(sum(CASE WHEN status = 'within' THEN 1 ELSE 0 END) AS BIGINT) AS n_within_dups,
          CAST(sum(CASE WHEN status = 'kept' THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         FROM st GROUP BY source ORDER BY source""",
    "d13_split_leakage" ->
      """WITH sp AS (SELECT doc_id,
                 CASE WHEN substr(md5(text), 1, 2) < 'cc' THEN 'train'
                      WHEN substr(md5(text), 1, 2) < 'e6' THEN 'val'
                      ELSE 'test' END AS split
               FROM documents),
          pairs AS (SELECT a.vec_id AS i, b.vec_id AS j,
              floor((list_aggregate(list_transform(range(1, len(a.embedding)+1),
                  k -> CAST(a.embedding[k] AS DOUBLE) * CAST(b.embedding[k] AS DOUBLE)), 'sum')
                / (sqrt(list_aggregate(list_transform(a.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum'))
                 * sqrt(list_aggregate(list_transform(b.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum')))) * 10000.0 + 0.5) / 10000.0 AS cos_sim
             FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
             WHERE cos_sim >= 0.4),
          lab AS (SELECT least(si.split, sj.split) split_a,
                   greatest(si.split, sj.split) split_b, p.cos_sim
                  FROM pairs p JOIN sp si ON p.i = si.doc_id
                               JOIN sp sj ON p.j = sj.doc_id)
         SELECT split_a, split_b, count(*) AS n_pairs, max(cos_sim) AS max_cos
         FROM lab GROUP BY 1, 2 ORDER BY split_a, split_b""",
    "d01_ngram_jaccard_pairs" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') t FROM documents),
          sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t)-1),
                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) s
                 FROM toks WHERE len(t) >= 3),
          ex AS (SELECT doc_id, unnest(s) shingle FROM sh),
          pairs AS (SELECT a.doc_id i, b.doc_id j, count(*) shared
                    FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                    GROUP BY 1, 2),
          jac AS (SELECT i, j,
                   floor((CAST(shared AS DOUBLE)/(sa.ls + sb.ls - shared)) * 10000.0 + 0.5) / 10000.0 jaccard
                  FROM pairs
                  JOIN (SELECT doc_id, len(s) ls FROM sh) sa ON i = sa.doc_id
                  JOIN (SELECT doc_id, len(s) ls FROM sh) sb ON j = sb.doc_id)
         SELECT i, j, jaccard FROM jac WHERE jaccard >= 0.2 ORDER BY i, j""",
    "t40_semantic_decontam" ->
      """WITH b AS (SELECT vec_id bench_id, embedding be FROM embeddings WHERE vec_id % 100 = 50),
          sc AS (SELECT e.vec_id,
            floor((list_aggregate(list_transform(range(1, len(e.embedding)+1),
                k -> CAST(e.embedding[k] AS DOUBLE) * CAST(b.be[k] AS DOUBLE)), 'sum')
              / (sqrt(list_aggregate(list_transform(e.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum'))
               * sqrt(list_aggregate(list_transform(b.be, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum')))) * 10000.0 + 0.5) / 10000.0 AS sim
           FROM embeddings e JOIN b ON e.vec_id <> b.bench_id),
          mx AS (SELECT vec_id, max(sim) max_sim FROM sc GROUP BY vec_id)
         SELECT d.source, count(*) AS n_docs,
          CAST(sum(CASE WHEN mx.max_sim IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_with_vec,
          CAST(sum(CASE WHEN mx.max_sim >= 0.4 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
          max(mx.max_sim) AS max_sim
         FROM documents d LEFT JOIN mx ON d.doc_id = mx.vec_id
         GROUP BY d.source ORDER BY d.source""",
    "d04_embedding_neardup" ->
      """SELECT a.vec_id AS i, b.vec_id AS j,
          floor((list_aggregate(list_transform(range(1, len(a.embedding)+1),
              k -> CAST(a.embedding[k] AS DOUBLE) * CAST(b.embedding[k] AS DOUBLE)), 'sum')
            / (sqrt(list_aggregate(list_transform(a.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum'))
             * sqrt(list_aggregate(list_transform(b.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum')))) * 10000.0 + 0.5) / 10000.0 AS cos_sim
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         WHERE cos_sim >= 0.4 ORDER BY i, j""",
    "d06_dup_clusters" ->
      """WITH RECURSIVE
          toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') t FROM documents),
          sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t)-1),
                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) s
                 FROM toks WHERE len(t) >= 3),
          ex AS (SELECT doc_id, unnest(s) shingle FROM sh),
          cand AS (SELECT a.doc_id i, b.doc_id j, count(*) shared
                   FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
          pairs AS (SELECT i, j FROM cand
                    JOIN (SELECT doc_id, len(s) ls FROM sh) sa ON i = sa.doc_id
                    JOIN (SELECT doc_id, len(s) ls FROM sh) sb ON j = sb.doc_id
                    WHERE floor((CAST(shared AS DOUBLE)/(sa.ls + sb.ls - shared)) * 10000.0 + 0.5) / 10000.0 >= 0.2),
          edges AS (SELECT i a, j b FROM pairs UNION ALL SELECT j AS a, i AS b FROM pairs),
          reach(node, lab) AS (
            SELECT a, a FROM edges
            UNION
            SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.node),
          cc AS (SELECT node, min(lab) cluster_id FROM reach GROUP BY node)
         SELECT cc.node AS doc_id, cc.cluster_id, s.n AS cluster_size
         FROM cc JOIN (SELECT cluster_id, count(*) n FROM cc GROUP BY 1) s USING (cluster_id)
         ORDER BY doc_id""",
    "d11_cluster_survivors" ->
      """WITH RECURSIVE
          toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') t FROM documents),
          sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t)-1),
                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) s
                 FROM toks WHERE len(t) >= 3),
          ex AS (SELECT doc_id, unnest(s) shingle FROM sh),
          cand AS (SELECT a.doc_id i, b.doc_id j, count(*) shared
                   FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
          pairs AS (SELECT i, j FROM cand
                    JOIN (SELECT doc_id, len(s) ls FROM sh) sa ON i = sa.doc_id
                    JOIN (SELECT doc_id, len(s) ls FROM sh) sb ON j = sb.doc_id
                    WHERE floor((CAST(shared AS DOUBLE)/(sa.ls + sb.ls - shared)) * 10000.0 + 0.5) / 10000.0 >= 0.2),
          edges AS (SELECT i a, j b FROM pairs UNION ALL SELECT j AS a, i AS b FROM pairs),
          reach(node, lab) AS (
            SELECT a, a FROM edges
            UNION
            SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.node),
          cc AS (SELECT node, min(lab) cluster_id FROM reach GROUP BY node),
          q AS (SELECT doc_id, floor((CAST(len(list_distinct(t)) AS DOUBLE) / len(t)) * 10000.0 + 0.5) / 10000.0 q
                FROM toks),
          sz AS (SELECT cluster_id, count(*) n FROM cc GROUP BY 1),
          r AS (SELECT cc.cluster_id, cc.node, q.q, sz.n,
                  row_number() OVER (PARTITION BY cc.cluster_id ORDER BY q.q DESC, cc.node ASC) rn
                FROM cc JOIN q ON cc.node = q.doc_id JOIN sz USING (cluster_id))
         SELECT cluster_id, node AS survivor, q AS quality, n AS cluster_size, n - 1 AS n_removed
         FROM r WHERE rn = 1 ORDER BY cluster_id""",
    "d08_embedding_clusters" ->
      """WITH RECURSIVE
          pairs AS (SELECT a.vec_id AS i, b.vec_id AS j,
              floor((list_aggregate(list_transform(range(1, len(a.embedding)+1),
                  k -> CAST(a.embedding[k] AS DOUBLE) * CAST(b.embedding[k] AS DOUBLE)), 'sum')
                / (sqrt(list_aggregate(list_transform(a.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum'))
                 * sqrt(list_aggregate(list_transform(b.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum')))) * 10000.0 + 0.5) / 10000.0 AS cos_sim
             FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
             WHERE cos_sim >= 0.4),
          edges AS (SELECT i a, j b FROM pairs UNION ALL SELECT j AS a, i AS b FROM pairs),
          reach(node, lab) AS (
            SELECT a, a FROM edges
            UNION
            SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.node),
          cc AS (SELECT node, min(lab) cluster_id FROM reach GROUP BY node)
         SELECT cc.node AS vec_id, cc.cluster_id, s.n AS cluster_size
         FROM cc JOIN (SELECT cluster_id, count(*) n FROM cc GROUP BY 1) s USING (cluster_id)
         ORDER BY vec_id""",
    "d09_exact_substr" -> SpanSql(
      """SELECT doc_id, count(*) AS n_dup_spans,
          CAST(sum(e - s) AS BIGINT) AS dup_chars,
          floor((CAST(sum(e - s) AS DOUBLE) / len) * 10000.0 + 0.5) / 10000.0 AS dup_frac
         FROM sp GROUP BY doc_id, len ORDER BY doc_id"""),
    "d10_substr_clean" -> SpanSql(
      """seg AS (SELECT doc_id, docs.len AS len, text, s, e,
                 lag(e, 1, 1) OVER (PARTITION BY doc_id ORDER BY s) pe
                FROM sp JOIN docs USING (doc_id)),
          sega AS (SELECT doc_id, any_value(len) AS len, any_value(text) AS text,
                   string_agg(substr(text, pe, s - pe), '' ORDER BY s) pre,
                   max(e) me, count(*) n
                  FROM seg GROUP BY doc_id),
          cl AS (SELECT doc_id, pre || substr(text, me, len - me + 1) clean, n FROM sega)
         SELECT d.doc_id, CAST(strlen(d.text) AS BIGINT) orig_len,
          CAST(coalesce(strlen(cl.clean), strlen(d.text)) AS BIGINT) clean_len,
          CAST(coalesce(cl.n, 0) AS BIGINT) n_cut_spans,
          md5(coalesce(cl.clean, d.text)) clean_md5
         FROM documents d LEFT JOIN cl USING (doc_id) ORDER BY d.doc_id""",
      extraCte = true),
  )

  /** The d09/d10 oracle's shared span derivation (DuckDB mirror of
    * [[dupSpans]], computed on real gram STRINGS — which is what makes
    * the string-free rolling-hash Spark side attestable): `docs` and
    * `sp(doc_id, len, s, e)` CTEs, composed with a per-gate tail.
    * `extraCte` appends the tail as further CTEs instead of a bare
    * SELECT. */
  private def SpanSql(tail: String, extraCte: Boolean = false): String =
    """WITH docs AS (SELECT doc_id, text, strlen(text) len FROM documents WHERE strlen(text) >= 40),
          g AS (SELECT doc_id, len, unnest(generate_series(1, len-39)) pos, text FROM docs),
          gr AS (SELECT doc_id, len, pos, substr(text, pos, 40) gram,
                  doc_id*1000000000 + pos AS k FROM g),
          agg AS (SELECT gram, min(k) first_k, count(*) c FROM gr GROUP BY gram),
          dup AS (SELECT gr.doc_id, gr.len, gr.pos, gr.pos + 40 AS e
                  FROM gr JOIN agg USING (gram) WHERE agg.c > 1 AND gr.k <> agg.first_k),
          w AS (SELECT doc_id, len, pos, e,
                 max(e) OVER (PARTITION BY doc_id ORDER BY pos, e
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) pmax
                FROM dup),
          isl AS (SELECT doc_id, len, pos, e,
                   sum(CASE WHEN pmax IS NULL OR pos > pmax THEN 1 ELSE 0 END)
                     OVER (PARTITION BY doc_id ORDER BY pos, e
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) island
                  FROM w),
          sp AS (SELECT doc_id, len, island, min(pos) s, max(e) e FROM isl GROUP BY 1, 2, 3)""" +
      (if (extraCte) ",\n          " else "\n         ") + tail
}
