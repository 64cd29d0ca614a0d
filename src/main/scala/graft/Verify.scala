package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [comma-separated query subset for local iteration]
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(',').toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // release any narrow per-query cache between queries
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    // Differential invariants for rows-only gates — semantic checks the
    // DuckDB oracle can't express (hash functions, k-means, ANN tiers),
    // computed from the dumped results themselves so the rows-only rows
    // in the correctness report carry weight without a spec run:
    //  - s09_eq_s03: the cell-partitioned stored-corpus probe must equal
    //    the in-memory IVF path exactly;
    //  - d07_subset_d04: LSH candidate pairs are a subset of the exact
    //    cosine pairs (same threshold);
    //  - *_recall: micro-averaged recall of each ANN tier against its
    //    exact baseline (floors asserted in SimilaritySpec: s03 ≥ 0.6,
    //    s02 ≥ 0.3, s04 ≥ 0.5, s06 ≥ 0.5).
    import org.apache.spark.sql.functions.col
    def read(name: String) = spark.read.parquet(s"$outDir/$name")
    def recall(approx: String, exact: String, idCol: String): Double = {
      val ex = read(exact).select(col(idCol).as("q"), col("neighbor_id"))
      val hits = ex.join(read(approx).select(col(idCol).as("q"), col("neighbor_id")),
        Seq("q", "neighbor_id"), "left_semi").count().toDouble
      math.floor(hits / ex.count() * 10000 + 0.5) / 10000
    }
    val invariants: Seq[(String, String)] =
      if (only.isDefined) Seq.empty
      else try {
        val s03 = read("s03_ann_ivf"); val s09 = read("s09_ivf_stored")
        val s09eq = s09.count() == s03.count() &&
          s09.exceptAll(s03).isEmpty && s03.exceptAll(s09).isEmpty
        val d07sub = read("d07_embedding_lsh_pairs").select("i", "j")
          .join(read("d04_embedding_neardup").select("i", "j"),
            Seq("i", "j"), "left_anti").isEmpty
        Seq(
          "s09_eq_s03" -> s09eq.toString,
          "d07_subset_d04" -> d07sub.toString,
          "s02_recall10" -> recall("s02_ann_lsh", "s01_ann_bruteforce", "query_id").toString,
          "s03_recall10" -> recall("s03_ann_ivf", "s01_ann_bruteforce", "query_id").toString,
          "s04_recall10" -> recall("s04_ann_ivfpq", "s01_ann_bruteforce", "query_id").toString,
          "s06_recall5"  -> recall("s06_knn_graph_ivf", "s05_knn_graph", "vec_id").toString,
          // half-corpus codebook + appended other half: the grown
          // layout must still retrieve like an IVF index
          "s11_recall10" -> recall("s11_ivf_append", "s01_ann_bruteforce", "query_id").toString,
          // stored filtered probe (partition-pruned + pushed predicate)
          // vs the exact filtered baseline
          "s13_recall10" -> recall("s13_filtered_ivf_stored", "s12_filtered_ann", "query_id").toString,
          // the PQ-coded stored index shares s04's exact fit paths and
          // parameters, so its probe must equal the in-memory IVF-PQ
          // result exactly — plus the recall floor vs the exact baseline
          "s14_eq_s04" -> {
            val s04 = read("s04_ann_ivfpq"); val s14 = read("s14_ivf_pq_stored")
            (s14.count() == s04.count() &&
              s14.exceptAll(s04).isEmpty && s04.exceptAll(s14).isEmpty).toString
          },
          "s14_recall10" -> recall("s14_ivf_pq_stored", "s01_ann_bruteforce", "query_id").toString,
          // the streamed query probe shares s09's layout, parameters,
          // and query set, and each query is probed independently, so
          // the union over microbatches must equal the in-memory IVF
          // path exactly
          // s15: the distributed projection's per-axis variance must
          // reproduce the eigensolve's eigenvalues (PCA identity) and
          // the captured-variance fractions must accumulate monotonically
          "s15_proj_var_eq_eig" -> {
            val rows = read("s15_pca_reduce").collect()
              .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(3),
                r.getDouble(4), r.getDouble(5))).sortBy(_._1)
            val tie = rows.forall { case (_, eig, _, pm, pv) =>
              math.abs(eig - pv) <= 2e-4 && math.abs(pm) <= 1e-4 }
            val cum = rows.map(_._3)
            (tie && cum.sameElements(cum.sorted) && cum.last <= 1.0001).toString
          },
          "st15_eq_s03" -> {
            val s03b = read("s03_ann_ivf"); val st15 = read("st15_stream_vec_query")
            (st15.count() == s03b.count() &&
              st15.exceptAll(s03b).isEmpty && s03b.exceptAll(st15).isEmpty).toString
          },
          // g01: PageRank over the dumped s05 edge list, re-run
          // single-node with bit-identical arithmetic — exact parity
          "g01_parity_singlenode" -> {
            val edges = read("s05_knn_graph").collect()
              .map(r => (r.getLong(0), r.getLong(2))).toSeq
            val want = graft.analytics.Graph.referencePagerank(edges)
              .toSeq.map { case (id, r) =>
                (id, graft.analytics.Det.droundD(r, 8)) }
              .sortBy { case (id, r) => (-r, id) }
              .take(graft.analytics.Graph.TopN)
            val got = read("g01_knn_pagerank").collect()
              .map(r => (r.getLong(0), r.getDouble(1))).toSeq
              .sortBy { case (id, r) => (-r, id) }
            (got.nonEmpty && got == want).toString
          },
          // g02: the personalized variant, seeded by the s01 query
          // rule — same exact-parity contract
          "g02_parity_singlenode" -> {
            val edges = read("s05_knn_graph").collect()
              .map(r => (r.getLong(0), r.getLong(2))).toSeq
            val seeds = read("s01_ann_bruteforce")
              .select("query_id").distinct().collect()
              .map(_.getLong(0)).toSeq.sorted
            val want = graft.analytics.Graph
              .referencePagerank(edges, seeds = Some(seeds))
              .toSeq.map { case (id, r) =>
                (id, graft.analytics.Det.droundD(r, 8)) }
              .sortBy { case (id, r) => (-r, id) }
              .take(graft.analytics.Graph.TopN)
            val got = read("g02_ppr_retrieval").collect()
              .map(r => (r.getLong(0), r.getDouble(1))).toSeq
              .sortBy { case (id, r) => (-r, id) }
            (got.nonEmpty && got == want).toString
          },
          // s16: MMR's first pick is the relevance argmax, so its
          // rank-1 rows must equal s01's rank-1 rows exactly
          "s16_first_eq_s01_top1" -> {
            val a = read("s16_mmr_rerank").filter(col("rnk") === 1)
              .select("query_id", "neighbor_id")
            val b = read("s01_ann_bruteforce").filter(col("rnk") === 1)
              .select("query_id", "neighbor_id")
            (a.count() == b.count() && a.count() > 0 &&
              a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty).toString
          },
          // st16: the streamed per-source quality rollup must equal the
          // batch scorer's rollup under the same persisted artifact —
          // the serving half of the t28 training loop
          "st16_eq_batch" -> {
            val st16 = read("st16_stream_quality")
            val batch = graft.analytics.StreamingQueries.qualityBatch(spark, sfDir)
            (st16.count() == batch.count() && st16.count() > 0 &&
              st16.exceptAll(batch).isEmpty && batch.exceptAll(st16).isEmpty).toString
          }) ++ {
          // t27: the distributed BPE merge table must equal a single-node
          // re-learn from the same fixture, exactly (order included)
          import org.apache.spark.sql.functions.{count, explode, lit, lower, split, trim}
          val vocab = graft.analytics.Tables.documents(spark, sfDir)
            .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
            .filter(col("tok") =!= "")
            .select(lower(col("tok")).as("word"))
            .groupBy("word").agg(count(lit(1)).as("freq"))
            .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
          val want = graft.analytics.BpeTrain
            .referenceMerges(vocab, graft.analytics.BpeTrain.NumMerges)
            .map { case (r, a, b, c) => (r.toLong, a, b, c) }
          val got = read("t27_bpe_merges").collect()
            .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
            .toSeq.sortBy(_._1)
          // t28: full-batch GD loss curve must strictly descend and the
          // final model must actually separate the planted label
          val t28 = read("t28_quality_classifier").collect()
            .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
          val descending = t28.sliding(2).forall(p => p(1)._2 < p(0)._2)
          // t29: re-encode the corpus single-node with the same
          // rank-priority encoder and the reference merge table; the
          // distributed per-source stats must match exactly
          val ranksMap = want.map { case (r, a, b, _) => (a, b) -> r.toInt }.toMap
          val srcWord = graft.analytics.Tables.documents(spark, sfDir)
            .select(col("source"), explode(split(trim(col("text")), "\\s+")).as("tok"))
            .filter(col("tok") =!= "")
            .select(col("source"), lower(col("tok")).as("word"))
            .groupBy("source", "word").agg(count(lit(1)).as("n"))
            .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
          val encLen = srcWord.map(_._2).distinct
            .map(w => w -> graft.analytics.BpeTrain.encodeWord(w, ranksMap).length.toLong)
            .toMap
          val wantT29 = srcWord.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, rows) =>
            val nWords = rows.map(_._3).sum
            val nSym = rows.map(r => r._3 * encLen(r._2)).sum
            val nChars = rows.map(r => r._3 * r._2.length).sum
            (src, nWords, nSym,
              graft.analytics.Det.droundD(nSym.toDouble / nWords, 4),
              graft.analytics.Det.droundD(nChars.toDouble / nSym, 4))
          }
          val gotT29 = read("t29_bpe_encode").collect()
            .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
              r.getDouble(3), r.getDouble(4))).toSeq.sortBy(_._1)
          // t31: the Misra–Gries guarantee against exact token counts —
          // every token above the N/(k+1) threshold present, every
          // estimate within [true − N/(k+1), true]
          val exactCounts = graft.analytics.Tables.documents(spark, sfDir)
            .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
            .groupBy("tok").agg(count(lit(1)).as("c"))
            .collect().map(r => (r.getString(0), r.getLong(1))).toMap
          val nTok = exactCounts.values.sum
          // derived from the gate's own k so invariant and gate can't drift
          val mgErr = nTok / (graft.analytics.TextOps.HeavyHittersK + 1)
          val sketch = read("t31_heavy_hitters").collect()
            .map(r => (r.getString(1), r.getLong(2))).toMap
          val allHeavyPresent = exactCounts
            .filter(_._2 > mgErr).keys.forall(sketch.contains)
          val estsBounded = sketch.forall { case (tok, est) =>
            val t = exactCounts.getOrElse(tok, 0L)
            est <= t && t <= est + mgErr
          }
          // st17: the STREAMED MG summary carries the same guarantee
          // (contents may differ from t31 — merge order — the bound
          // may not)
          val stSketch = read("st17_stream_heavy_hitters").collect()
            .map(r => (r.getString(0), r.getLong(1))).toMap
          val stGuarantee = exactCounts
            .filter(_._2 > mgErr).keys.forall(stSketch.contains) &&
            stSketch.forall { case (tok, est) =>
              val t = exactCounts.getOrElse(tok, 0L)
              est <= t && t <= est + mgErr
            } && stSketch.size <= graft.analytics.TextOps.HeavyHittersK
          // t33/t34: the distributed unigram-LM train + encode must
          // equal a single-node re-run from the same vocabulary —
          // same exact-parity contract as t27/t29
          val wantT33 = graft.analytics.UnigramTrain.referenceVocab(vocab)
          val gotT33 = read("t33_unigram_vocab").collect()
            .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
            .toSeq.sortBy(_._1)
          val uniLogp = wantT33.map { case (_, p, _, lp) => p -> lp }.toMap
          val uniLen = srcWord.map(_._2).distinct
            .map(w => w -> graft.analytics.UnigramTrain
              .viterbi(w, uniLogp, graft.analytics.UnigramTrain.SeedMaxLen).length.toLong)
            .toMap
          val wantT34 = srcWord.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, rows) =>
            val nWords = rows.map(_._3).sum
            val nPieces = rows.map(r => r._3 * uniLen(r._2)).sum
            val nChars = rows.map(r => r._3 * r._2.length).sum
            (src, nWords, nPieces,
              graft.analytics.Det.droundD(nPieces.toDouble / nWords, 4),
              graft.analytics.Det.droundD(nChars.toDouble / nPieces, 4))
          }
          val gotT34 = read("t34_unigram_encode").collect()
            .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
              r.getDouble(3), r.getDouble(4))).toSeq.sortBy(_._1)
          Seq(
            "t31_mg_guarantee" -> (allHeavyPresent && estsBounded).toString,
            "st17_mg_guarantee" -> stGuarantee.toString,
            "t27_parity_singlenode" -> (got == want).toString,
            "t29_parity_singlenode" -> (gotT29 == wantT29).toString,
            "t33_parity_singlenode" -> (gotT33 == wantT33).toString,
            "t34_parity_singlenode" -> (gotT34 == wantT34).toString,
            "t28_loss_decreasing" -> descending.toString,
            "t28_final_acc" -> t28.last._3.toString)
        }
      } catch { case e: Throwable =>
        System.err.println(s"[verify] invariants failed: ${e.getMessage}")
        Seq("error" -> q(e.getMessage))
      }
    val invJson = invariants.map { case (k, v) => s"${q(k)}: $v" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/invariants.json"), invJson)
    println(s"[verify] invariants: $invJson")
    spark.stop()
  }
}
