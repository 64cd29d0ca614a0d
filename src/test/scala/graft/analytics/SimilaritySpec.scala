package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

import graft.store.SparkTestSession

/** Approximate ANN paths must return sane results: full top-10 lists
  * per query and reasonable recall against the exact brute force. */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect().toSeq
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap

  test("IVF and LSH recall vs exact brute force") {
    val exact = topSets(Similarity.s01BruteForceTopK(spark, dir))
    val ivf   = topSets(Similarity.s03IvfTopK(spark, dir))
    val lsh   = topSets(Similarity.s02LshTopK(spark, dir))
    assert(exact.nonEmpty)
    def recall(approx: Map[Long, Set[Long]]): Double = {
      val per = exact.map { case (q, ex) =>
        approx.get(q).map(ap => ap.intersect(ex).size.toDouble / ex.size).getOrElse(0.0)
      }
      per.sum / per.size
    }
    val rIvf = recall(ivf)
    val rLsh = recall(lsh)
    info(s"recall: ivf=$rIvf lsh=$rLsh")
    // floors sit well under the measured values (ivf 0.78, lsh 0.42
    // at 10 Lloyd iters, nProbe 6) — high enough that a degenerate
    // quantizer or a trimmed fit cannot pass, with headroom only for
    // fixture drift
    assert(rIvf >= 0.6, s"IVF recall too low: $rIvf")
    assert(rLsh >= 0.3, s"LSH recall too low: $rLsh")
    // approximate results are always a subset of the scored universe
    // with correct per-query list sizes
    assert(ivf.values.forall(_.size <= 10))
  }

  test("s17 int8 errors respect the quantization bound; s18 ranking survives compression") {
    // max reconstruction error is ≤ scale/2 by construction (the code
    // rounds to the nearest scale multiple within range)
    val q = Similarity.s17Int8Quant(spark, dir).collect()
    assert(q.nonEmpty)
    assert(q.forall { r =>
      r.getDouble(2) <= r.getDouble(1) / 2.0 + 1e-12
    }, "a max_err exceeds scale/2 — codes are not nearest-multiple")
    assert(q.forall(r => r.getDouble(3) >= 0.0))
    // 8×-compressed ranking tracks the f64 ranking closely
    val exact = topSets(Similarity.s01BruteForceTopK(spark, dir))
    val int8 = topSets(Similarity.s18Int8TopK(spark, dir))
    val per = exact.map { case (qid, ex) =>
      int8.get(qid).map(ap => ap.intersect(ex).size.toDouble / ex.size).getOrElse(0.0)
    }
    val recall = per.sum / per.size
    info(s"recall: int8=$recall")
    assert(recall >= 0.9, s"int8 recall too low: $recall")
  }

  test("IVF-PQ returns full top-10 lists per query with useful recall") {
    val exact = topSets(Similarity.s01BruteForceTopK(spark, dir))
    val pq = Similarity.s04IvfPqTopK(spark, dir)
    val sets = topSets(pq)
    // nProbe=8 of K=16 cells always holds far more than 10 candidates,
    // so every query must still return a full top-10 list
    assert(sets.keySet == exact.keySet)
    assert(sets.values.forall(_.size == 10))
    val per = exact.map { case (q, ex) =>
      sets(q).intersect(ex).size.toDouble / ex.size }
    val recall = per.sum / per.size
    info(s"recall: ivfpq=$recall")
    // measured 0.86 at 10 IVF + 8 PQ Lloyd iters, nProbe 8, refine
    // 16 — the floor keeps both the cell pruning and the exact refine
    // honest: ADC alone lands ~0.26 on these near-random vectors
    assert(recall >= 0.6, s"IVF-PQ recall too low: $recall")
  }

  test("k-NN graph: exact tier is complete, IVF tier has useful recall") {
    val exact = Similarity.s05KnnGraph(spark, dir)
    val n = Tables.embeddings(spark, dir).count()
    // every vector gets a full top-5 list from the exact tier
    assert(exact.count() == n * 5)
    val exactSets = topSets(exact.withColumnRenamed("vec_id", "query_id"))
    spark.catalog.clearCache()
    val ivf = topSets(Similarity.s06KnnGraphIvf(spark, dir)
      .withColumnRenamed("vec_id", "query_id"))
    // the IVF tier covers every vector too (nProbe=4 cells always hold
    // >= 5 candidates on this fixture)
    assert(ivf.keySet == exactSets.keySet)
    val per = exactSets.map { case (q, ex) =>
      ivf(q).intersect(ex).size.toDouble / ex.size }
    val recall = per.sum / per.size
    info(s"recall: knn_ivf=$recall")
    // measured 0.62 at sf0.001 (nProbe 4 of 16 cells)
    assert(recall >= 0.5, s"IVF k-NN graph recall too low: $recall")
  }

  test("cluster stats cover the whole corpus deterministically") {
    val n = Tables.embeddings(spark, dir).count()
    val a = Similarity.s07ClusterStats(spark, dir).collect()
    spark.catalog.clearCache()
    val b = Similarity.s07ClusterStats(spark, dir).collect()
    spark.catalog.clearCache()
    assert(a.toSeq.map(_.toSeq) == b.toSeq.map(_.toSeq), "cluster stats nondeterministic")
    assert(a.map(_.getAs[Long]("n_vecs")).sum == n, "cells must partition the corpus")
    a.foreach { r =>
      val avg = r.getAs[Double]("avg_sim"); val mn = r.getAs[Double]("min_sim")
      assert(avg >= mn && avg <= 1.0001 && mn >= -1.0001,
        s"cell ${r.getAs[Long]("cell")}: implausible sims avg=$avg min=$mn")
    }
  }

  test("knnGraph facade reproduces both gate tiers") {
    val corpus = Tables.embeddings(spark, dir)
      .select(org.apache.spark.sql.functions.col("vec_id"),
              org.apache.spark.sql.functions.col("embedding"))
    for ((method, gate) <- Seq(
        ("brute", Similarity.s05KnnGraph _),
        ("ivf", Similarity.s06KnnGraphIvf _))) {
      val api = Similarity.knnGraph(corpus, k = 5, method = method)
        .orderBy("vec_id", "rnk").collect().map(_.toSeq).toSeq
      val expected = gate(spark, dir).collect().map(_.toSeq).toSeq
      assert(api == expected, s"$method: knnGraph facade diverges from gate")
      spark.catalog.clearCache()
    }
  }

  test("s09 stored-corpus probe equals s03 exactly (write → read back → pruned probe)") {
    // same deterministic quantizer, queries, and rerank — the parquet
    // round trip and the partition-pruned scan must be semantically
    // invisible. This is the equality Verify emits as an invariant.
    val viaStore = Similarity.s09IvfStoredProbe(spark, dir).collect().map(_.toSeq).toSeq
    spark.catalog.clearCache()
    val inMemory = Similarity.s03IvfTopK(spark, dir).collect().map(_.toSeq).toSeq
    spark.catalog.clearCache()
    assert(viaStore.nonEmpty)
    assert(viaStore == inMemory, "stored-layout probe diverged from the in-memory IVF path")
  }

  test("s14 PQ stored probe equals s04 exactly (codes + codebooks + refine round trip)") {
    // same bounded fit sample, same Lloyd paths for both quantizers,
    // same nProbe/refine — the nibble-packed code round trip, the
    // persisted codebooks, and the pruned refine lookup must be
    // semantically invisible. This is the equality Verify emits as the
    // s14_eq_s04 invariant.
    val viaStore = Similarity.s14IvfPqStored(spark, dir).collect().map(_.toSeq).toSeq
    spark.catalog.clearCache()
    val inMemory = Similarity.s04IvfPqTopK(spark, dir).collect().map(_.toSeq).toSeq
    spark.catalog.clearCache()
    assert(viaStore.nonEmpty)
    assert(viaStore == inMemory, "PQ stored probe diverged from the in-memory IVF-PQ path")
  }

  test("writeIvfPqLayout: every vector coded exactly once, codes nibble-decode to per-subspace cells") {
    import org.apache.spark.sql.functions.col
    val out = graft.core.TempDirs.create("graft-ivfpq-roundtrip")
      .resolve("corpus").toString
    Similarity.writeIvfPqLayout(Dedup.normalizedVectors(spark, dir), out, k = 8, iters = 3)
    val codes = spark.read.parquet(out)
    val refine = spark.read.parquet(s"$out/_refine")
    val n = Tables.embeddings(spark, dir).count()
    assert(codes.count() == n, "code layout dropped or duplicated vectors")
    assert(refine.count() == n, "refine sidecar dropped or duplicated vectors")
    // code and refine sidecar agree on every vector's cell
    val cellMismatch = codes.select(col("vec_id"), col("cell").as("code_cell"))
      .join(refine.select(col("vec_id"), col("cell")), "vec_id")
      .filter(col("code_cell") =!= col("cell")).count()
    assert(cellMismatch == 0, s"$cellMismatch vectors in different cells across code/refine")
    // every nibble is a valid sub-centroid id (0..15) and the books
    // round-trip with full shape
    val books = Similarity.readPqCodebooks(spark, out)
    assert(books.length == 8 && books.forall(_.length == 16))
    val badNibbles = codes.filter(
      (0 until 8).map(m => org.apache.spark.sql.functions.shiftright(col("code"), 4 * m)
        .bitwiseAND(org.apache.spark.sql.functions.lit(15)) > 15).reduce(_ || _)).count()
    assert(badNibbles == 0)
  }

  test("writeIvfCorpus persists every vector exactly once, partitioned by its assigned cell") {
    val out = graft.core.TempDirs.create("graft-ivf-roundtrip")
      .resolve("corpus").toString
    val centroids = Similarity.writeIvfCorpus(spark, dir, out)
    assert(Similarity.readIvfCodebook(spark, out).map(_._1).toSeq ==
      centroids.map(_._1).toSeq, "codebook round trip lost cells")
    val stored = spark.read.parquet(out)
    val n = Tables.embeddings(spark, dir).count()
    assert(stored.count() == n, "stored corpus dropped or duplicated vectors")
    assert(stored.select("vec_id").distinct().count() == n)
    // each cell directory holds exactly the vectors assigned to it
    import org.apache.spark.sql.functions.col
    val (assigned, _) = Similarity.ivfFit(spark, dir)
    val mismatches = stored.select(col("vec_id"), col("cell").as("stored_cell"))
      .join(assigned.select(col("vec_id"), col("cell")), "vec_id")
      .filter(col("stored_cell") =!= col("cell")).count()
    spark.catalog.clearCache()
    assert(mismatches == 0, s"$mismatches vectors landed in the wrong cell partition")
  }

  test("s10 hard negatives sit strictly below each anchor's presumed positives") {
    val hn = Similarity.s10HardNegatives(spark, dir).collect()
    assert(hn.nonEmpty)
    // at most 5 per anchor, ranks contiguous from 1, no near-dups
    hn.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.length <= 5)
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to rs.length).toSeq)
    }
    assert(hn.forall(_.getDouble(3) < 0.95))
    // the mined window is DISJOINT from the s01 top-10 (the presumed
    // positives a contrastive run must not train against) and scores
    // at or below each anchor's rank-10 score
    val top10 = Similarity.s01BruteForceTopK(spark, dir).collect()
    val topSet = top10.map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(hn.forall(r => !topSet.contains((r.getLong(0), r.getLong(2)))))
    val floor10 = top10.groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getDouble(3)).min }
    assert(hn.forall(r => r.getDouble(3) <= floor10(r.getLong(0))))
  }

  test("s12 filtered search honors the predicate; IVF tier on the filtered corpus keeps recall") {
    import org.apache.spark.sql.functions._
    val en = Tables.documents(spark, dir).filter(col("lang") === "en")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val rows = Similarity.s12FilteredAnn(spark, dir).collect()
    assert(rows.nonEmpty)
    // every neighbor passes the filter, and the filter actually bites
    // (excluded vectors exist, so this differs from unfiltered s01)
    assert(rows.forall(r => en.contains(r.getLong(2))),
      "a neighbor outside the filtered slice leaked into the results")
    val nVecs = Tables.embeddings(spark, dir).count()
    assert(en.size < nVecs, "fixture filter excludes nothing — test is vacuous")
    // full lists as long as the filtered corpus allows (a query inside
    // the slice excludes itself from its own candidates)
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val candidates = en.size - (if (en.contains(q)) 1 else 0)
      assert(rs.length == math.min(10, candidates),
        s"query $q returned ${rs.length} of ${math.min(10, candidates)} expected")
    }
    // scale tier: the same pre-filtered corpus through the IVF path
    val corpus = Tables.embeddings(spark, dir)
      .join(Tables.documents(spark, dir).filter(col("lang") === "en")
        .select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
    val queries = Tables.embeddings(spark, dir).filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val ivf = Similarity.topK(corpus, queries, k = 10, method = "ivf").collect()
    spark.catalog.clearCache()
    val exact = rows.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    val approx = ivf.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    val per = exact.map { case (q, ex) =>
      approx.get(q).map(ap => ap.intersect(ex).size.toDouble / ex.size).getOrElse(0.0)
    }
    val recall = per.sum / per.size
    info(s"recall: s12-ivf=$recall")
    assert(recall >= 0.5, s"filtered IVF recall too low: $recall")
  }
}
