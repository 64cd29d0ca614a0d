package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.store.SparkTestSession

/** Distributed BPE merge learning (t27): exact parity with the
  * single-node reference on planted vocabularies and on the fixture. */
class BpeTrainSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def learn(wordFreq: Seq[(String, Long)], k: Int): Seq[(Int, String, String, Long)] = {
    import spark.implicits._
    BpeTrain.learnMerges(wordFreq.toDF("word", "freq"), k)
  }

  test("classic Sennrich vocabulary: distributed == single-node reference") {
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val got = learn(vocab, 10)
    val want = BpeTrain.referenceMerges(vocab, 10)
    assert(got == want)
    // the famous first merges: 'es' (9 = 6+3) then 'est' then 'est</w>'
    assert(got.head._2 == "e" && got.head._3 == "s" && got.head._4 == 9L)
    assert(got(1)._2 == "es" && got(1)._3 == "t")
  }

  test("overlapping runs merge left-to-right non-overlapping") {
    // "aaaa" freq 3: pair (a,a) counts 9 (3 adjacent pairs x 3); one
    // merge pass yields [aa, aa, </w>] so round 2 ties (aa,aa)=3 with
    // (aa,</w>)=3 and the lexicographic tie-break picks "</w>" < "aa"
    val got = learn(Seq(("aaaa", 3L)), 3)
    assert(got.head == ((1, "a", "a", 9L)))
    assert(got(1) == ((2, "aa", "</w>", 3L)))
    assert(got(2) == ((3, "aa", "aa</w>", 3L)))
    assert(got == BpeTrain.referenceMerges(Seq(("aaaa", 3L)), 3))
  }

  test("stops early when no pair repeats") {
    // all words distinct single chars: every pair count is 1 < 2
    val got = learn(Seq(("x", 1L), ("y", 1L)), 5)
    assert(got.isEmpty)
  }

  test("encodeWord applies merges rank-first and stops when none remain") {
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val ranks = BpeTrain.referenceMerges(vocab, 10)
      .map { case (r, a, b, _) => (a, b) -> r }.toMap
    // a training word re-encodes into few long subwords
    val newest = BpeTrain.encodeWord("newest", ranks)
    assert(newest.length <= 3 && newest.mkString == "newest</w>")
    // an unseen word with a learned suffix reuses it
    val tallest = BpeTrain.encodeWord("tallest", ranks)
    assert(tallest.mkString == "tallest</w>")
    assert(tallest.contains("est</w>") || tallest.contains("est"),
      s"learned 'est' subword unused: $tallest")
    // no learned pair applies → pure characters + marker
    assert(BpeTrain.encodeWord("zq", ranks) == List("z", "q", "</w>"))
  }

  test("t29 gate: distributed encode equals a single-node re-encode") {
    val ranks = BpeTrain.t27BpeMerges(spark, dir).collect()
      .map(r => (r.getString(1), r.getString(2)) -> r.getLong(0).toInt).toMap
    val srcWord = Tables.documents(spark, dir)
      .select(col("source"), explode(split(trim(col("text")), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("source"), lower(col("tok")).as("word"))
      .groupBy("source", "word").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val encLen = srcWord.map(_._2).distinct
      .map(w => w -> BpeTrain.encodeWord(w, ranks).length.toLong).toMap
    val want = srcWord.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, rows) =>
      val nWords = rows.map(_._3).sum
      val nSym = rows.map(r => r._3 * encLen(r._2)).sum
      (src, nWords, nSym)
    }
    val got = BpeTrain.t29BpeEncode(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    // merges actually compress: fewer symbols-per-word than chars+1
    val spw = BpeTrain.t29BpeEncode(spark, dir).collect().map(_.getDouble(3))
    assert(spw.forall(_ >= 1.0))
  }

  test("t27 gate: fixture parity with the single-node reference") {
    val vocab = Tables.documents(spark, dir)
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .select(lower(col("tok")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = BpeTrain.referenceMerges(vocab, BpeTrain.NumMerges)
      .map { case (r, a, b, c) => (r.toLong, a, b, c) }
    val got = BpeTrain.t27BpeMerges(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == want)
    assert(got.size == BpeTrain.NumMerges)
    // multi-character subwords must have emerged by merge 20
    assert(got.exists { case (_, a, b, _) => (a + b).replace("</w>", "").length >= 3 })
  }

  test("merge table is a persisted artifact: trained once per corpus, read back exactly") {
    // explicit artifact round trip
    val out = graft.core.TempDirs.create("graft-bpe-artifact")
      .resolve("_bpe_merges").toString
    BpeTrain.writeBpeMerges(spark, dir, out)
    val viaArtifact = BpeTrain.readBpeMerges(spark, out)
    val viaGate = BpeTrain.t27BpeMerges(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(viaArtifact == viaGate, "artifact round trip changed the merge table")
    // the gate's registry trains once per JVM: both gates resolve the
    // SAME artifact path, and its files are untouched by later reads
    val p1 = BpeTrain.mergesArtifact(spark, dir)
    val mtimes = java.nio.file.Files.list(java.nio.file.Paths.get(p1)).toArray
      .map(_.toString).sorted.mkString(",")
    BpeTrain.t29BpeEncode(spark, dir).collect()
    BpeTrain.t27BpeMerges(spark, dir).collect()
    assert(BpeTrain.mergesArtifact(spark, dir) == p1,
      "artifact registry re-trained for the same corpus")
    val after = java.nio.file.Files.list(java.nio.file.Paths.get(p1)).toArray
      .map(_.toString).sorted.mkString(",")
    assert(after == mtimes, "a consumer rewrote the artifact")
  }
}
