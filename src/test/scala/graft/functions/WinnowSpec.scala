package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.store.SparkTestSession

/** Winnowing fingerprint semantics: the SIGMOD'03 selection guarantee
  * (shared passages of ≥ k+w-1 chars ⇒ shared fingerprint),
  * normalization invariance, and determinism.
  */
class WinnowSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val K = 25
  private val W = 26

  private def fps(texts: String*): Seq[Set[Long]] = {
    import spark.implicits._
    texts.toSeq.toDF("text")
      .select(WinnowFingerprints.winnow_fingerprints(col("text"), K, W).as("f"))
      .collect().toSeq.map(_.getSeq[Long](0).toSet)
  }

  test("identical and whitespace/case-variant texts fingerprint identically") {
    val base = "The quick brown fox jumps over the lazy dog, again and again, every day."
    val Seq(a, b, c) = fps(base, "  the   QUICK brown\tfox jumps over the lazy dog, again and again, every day. ",
      base.toUpperCase)
    assert(a.nonEmpty && a == b && a == c)
  }

  test("texts shorter than k after normalization yield no fingerprints") {
    assert(fps("short text", "   ", "abcdefghij").forall(_.isEmpty))
  }

  test("selection guarantee: a shared >= k+w-1 char passage implies a shared fingerprint") {
    val rnd = new scala.util.Random(42)
    def letters(n: Int) = Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    val cases = Seq.fill(25) {
      val shared = letters(K + W - 1)
      (letters(120) + " " + shared + " " + letters(80),
       letters(95) + " " + shared)
    }
    val all = fps(cases.flatMap(c => Seq(c._1, c._2)): _*)
    all.grouped(2).zipWithIndex.foreach { case (Seq(a, b), i) =>
      assert(a.intersect(b).nonEmpty,
        s"case $i: no shared fingerprint despite a ${K + W - 1}-char shared passage")
    }
  }

  test("unrelated random texts rarely collide and selection is sparse") {
    val Seq(a, b) = fps(
      ("abcdefghij" * 40).grouped(7).mkString(" "),
      ("zyxwvutsrq" * 40).grouped(9).mkString(" "))
    assert(a.intersect(b).isEmpty)
    // winnowing keeps ~2/(w+1) of gram hashes: well under a quarter
    assert(a.size < 400 / 4 && a.size > 2)
  }

  test("d05 pair query finds a planted copied passage at sf0.001") {
    val d05 = graft.analytics.Dedup.d05WinnowPairs(spark, "/root/testdata/sf0.001")
    val rows = d05.collect()
    // self-consistency: i < j, shared >= 2, overlap in (0, 1]
    assert(rows.forall { r =>
      r.getLong(0) < r.getLong(1) && r.getLong(2) >= 2 &&
        r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0
    })
    assert(rows.nonEmpty, "documents fixture contains near-dups; d05 must find passage overlaps")
  }
}
