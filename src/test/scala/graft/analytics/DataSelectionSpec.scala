package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.store.SparkTestSession

/** Round-8 data-selection operators: DSIR importance weights (t25).
  * Planted-input semantics plus directional checks on the fixture. */
class DataSelectionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def writeDocs(rows: Seq[(Long, String, String, String, Long)]): String = {
    import spark.implicits._
    val tmp = graft.core.TempDirs.create("graft-dsel").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("t25: target-exclusive vocabulary selects, off-target vocabulary rejects") {
    // target model = lang 'en'; docs 1-2 define the target vocabulary,
    // doc 3 reuses it (should score > 0 even though labeled 'de'),
    // doc 4 shares no token with the target (score < 0, not selected)
    val tmp = writeDocs(Seq(
      (1L, "alpha beta gamma alpha", "en", "s", 0L),
      (2L, "alpha beta delta", "en", "s", 0L),
      (3L, "alpha beta gamma", "de", "s", 0L),
      (4L, "zork quux blarg zork", "de", "s", 0L)))
    val got = TextOps.t25DsirWeights(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    assert(got(3)._1 > 0.0 && got(3)._2, s"target-like doc rejected: ${got(3)}")
    assert(got(4)._1 < 0.0 && !got(4)._2, s"off-target doc selected: ${got(4)}")
    // the target docs themselves must be the most target-like
    assert(got(1)._1 > got(4)._1 && got(2)._1 > got(4)._1)
  }

  test("t30: planted token counts pack into the expected sequence spans") {
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    // 100+100+100 tokens at SeqLen 256: doc 3 (start 200, end 300)
    // straddles the seq 0/1 boundary; 2 sequences total
    val tmp = writeDocs(Seq(
      (1L, words(100), "xx", "s", 0L),
      (2L, words(100), "xx", "s", 0L),
      (3L, words(100), "xx", "s", 0L)))
    val r = TextPrep.t30SequencePacking(spark, tmp).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(1) == 2L, s"n_seqs ${row.getLong(1)}")
    assert(row.getLong(2) == 300L)
    // docs-per-seq: docs 1,2 touch seq 0; doc 3 touches 0 and 1 → 4/2
    assert(row.getDouble(3) == 2.0)
    assert(row.getLong(4) == 1L, "exactly one spanning doc expected")
  }

  test("d12: ledger hits take precedence over within-batch dups; kept docs are fresh") {
    // ledger (src0) holds text A; the new batch (web1) re-crawls A,
    // carries an internal dup pair B/B, and one fresh doc C
    val tmp = writeDocs(Seq(
      (1L, "alpha beta gamma", "src0", "src0", 0L),
      (10L, "alpha beta gamma", "web1", "web1", 0L),
      (11L, "delta epsilon zeta", "web1", "web1", 0L),
      (12L, "delta epsilon zeta", "web1", "web1", 0L),
      (13L, "eta theta iota", "web1", "web1", 0L)))
    // writeDocs puts source in column 4 — rebuild with source=web1/src0
    val got = Dedup.d12IncrementalDedup(spark, tmp).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("web1") == ((4L, 1L, 1L, 2L)),
      s"expected (4 docs, 1 ledger dup, 1 within dup, 2 kept): ${got("web1")}")
    // the ledger slice itself is not part of the batch accounting
    assert(!got.contains("src0"))
  }

  test("d13: leakage rollup equals a direct recomputation from d04 pairs and the split gate") {
    val fixture = "/root/testdata/sf0.01"
    val h = substring(md5(col("text")), 1, 2)
    val split = when(h < "cc", "train").when(h < "e6", "val").otherwise("test")
    val splits = Tables.documents(spark, fixture)
      .select(col("doc_id"), split.as("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = Dedup.d04EmbeddingNearDup(spark, fixture).collect()
      .map(r => (splits(r.getLong(0)), splits(r.getLong(1))))
      .map { case (a, b) => if (a <= b) (a, b) else (b, a) }
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val got = Dedup.d13SplitLeakage(spark, fixture).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == want)
    assert(got.values.sum > 0, "fixture has no near-dup pairs — vacuous audit")
  }

  test("p05 funnel: stages partition the raw candidates; packing row is consistent") {
    val fixture = "/root/testdata/sf0.01"
    val rows = Pipeline.p05DataFunnel(spark, fixture).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val nRaw = Tables.documents(spark, fixture)
      .filter(col("source") =!= "src0").count()
    val stageNames = Seq("1_quality_fail", "2_exact_dup", "3_contaminated",
      "4_unselected", "5_kept")
    // the five outcome stages partition the raw candidate set exactly
    assert(stageNames.map(s => rows.get(s).map(_._1).getOrElse(0L)).sum == nRaw)
    // something survives, something falls — a funnel, not a pass-through
    assert(rows("5_kept")._1 > 0 && rows("5_kept")._1 < nRaw)
    // the packed row covers exactly the kept tokens at 256/seq
    val (keptDocs, keptTok) = rows("5_kept")
    val (nSeqs, packedTok) = rows("6_packed_seqs")
    assert(packedTok == keptTok)
    assert(nSeqs == (keptTok + 255) / 256)
    assert(keptDocs > 0)
  }

  test("t25 fixture: en documents average a higher DSIR score than non-en") {
    val docs = Tables.documents(spark, dir).select("doc_id", "lang")
    val scored = TextOps.t25DsirWeights(spark, dir).join(docs, "doc_id")
    val byLang = scored.groupBy(col("lang") === "en")
      .agg(avg("dsir_score")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(byLang(true) > byLang(false),
      s"en mean ${byLang(true)} should exceed non-en mean ${byLang(false)}")
    // every document of the corpus is scored
    assert(scored.count() == Tables.documents(spark, dir).count())
  }
}
