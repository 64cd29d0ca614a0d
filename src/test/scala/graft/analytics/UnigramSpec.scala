package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.SparkTestSession

/** Unigram-LM tokenizer: Viterbi totality/reconstruction, exact
  * distributed-vs-single-node parity, artifact round trip, and the
  * coverage guarantee (chars always kept). */
class UnigramSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  private def fixtureVocab: Seq[(String, Long)] =
    BpeTrain.vocabOf(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  test("viterbi reconstructs the word and respects piece probabilities") {
    val logp = Map("a" -> -3.0, "b" -> -3.0, "ab" -> -1.0, "abc" -> -9.0, "c" -> -2.0)
    // "ab" as one piece (-1) beats "a"+"b" (-6); "abc" as one piece (-9)
    // loses to "ab"+"c" (-3)
    assert(UnigramTrain.viterbi("ab", logp, 6) == List("ab"))
    assert(UnigramTrain.viterbi("abc", logp, 6) == List("ab", "c"))
    // every segmentation concatenates back to the word
    fixtureVocab.take(200).foreach { case (w, _) =>
      val segs = UnigramTrain.viterbi(w,
        w.map(_.toString -> -1.0).toMap, UnigramTrain.SeedMaxLen)
      assert(segs.mkString == w)
    }
  }

  test("distributed training equals the single-node reference exactly") {
    val want = UnigramTrain.referenceVocab(fixtureVocab)
    val got = UnigramTrain.learnVocab(spark, dir)
    assert(got.nonEmpty && got == want)
    // chars present for coverage; ranks contiguous; logp sorted desc
    val pieces = got.map(_._2).toSet
    fixtureVocab.flatMap(_._1.toSeq).map(_.toString).distinct
      .foreach(c => assert(pieces(c), s"coverage char '$c' pruned"))
    assert(got.map(_._1) == (1L to got.length))
    val lps = got.map(_._4)
    assert(lps.zip(lps.tail).forall { case (a, b) => a >= b })
  }

  test("gate artifact round-trips and the encode stats are self-consistent") {
    val vocabRows = UnigramTrain.t33UnigramVocab(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(vocabRows == UnigramTrain.referenceVocab(fixtureVocab))
    val enc = UnigramTrain.t34UnigramEncode(spark, dir).collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      val (nw, np) = (r.getLong(1), r.getLong(2))
      assert(np >= nw, "fewer pieces than words")
      assert(r.getDouble(3) >= 1.0 && r.getDouble(4) >= 1.0)
    }
    // multi-char pieces actually get used: mean piece length > 1
    val used = vocabRows.filter(_._3 > 0)
    assert(used.exists(_._2.length > 1), "no multi-char piece survived EM")
  }

  test("training is invariant to vocab partitioning") {
    val vocab = BpeTrain.vocabOf(spark, dir)
    val a = UnigramTrain.emLoop(
      UnigramTrain.seedCandidates(vocab.repartition(1)),
      lp => {
        import spark.implicits._
        vocab.repartition(1).select(col("word"), col("freq")).as[(String, Long)]
          .collect().foldLeft(Map.empty[String, Long]) { case (m, (w, f)) =>
            UnigramTrain.viterbi(w, lp, UnigramTrain.SeedMaxLen)
              .foldLeft(m)((mm, p) => mm.updated(p, mm.getOrElse(p, 0L) + f))
          }
      })
    val b = UnigramTrain.learnVocab(spark, dir)
    assert(a == b)
  }
}
