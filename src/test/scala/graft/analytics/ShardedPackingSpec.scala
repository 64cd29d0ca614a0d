package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.SparkTestSession

/** t39 contract: sharding the packing stream re-keys the window, it
  * never loses or invents tokens — per-language totals equal t30's,
  * and every document lands in exactly one shard. */
class ShardedPackingSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("t39: per-shard token and doc counts conserve t30's per-language totals") {
    val sharded = TextPrep.t39ShardedPacking(spark, dir)
      .groupBy("lang")
      .agg(sum("n_tokens").as("tok"), sum("n_docs").as("docs"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val perLang = TextPrep.t30SequencePacking(spark, dir)
      .select("lang", "n_tokens")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val docCounts = Tables.documents(spark, dir)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sharded.keySet == perLang.keySet)
    sharded.foreach { case (lang, (tok, docs)) =>
      assert(tok == perLang(lang), s"$lang: tokens $tok != ${perLang(lang)}")
      assert(docs == docCounts(lang), s"$lang: docs $docs != ${docCounts(lang)}")
    }
  }

  test("t39: no window partition is language-sized once sharded") {
    val perShard = TextPrep.t39ShardedPacking(spark, dir)
      .groupBy("lang").agg(max("n_docs").as("mx"), sum("n_docs").as("tot"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    perShard.foreach { case (lang, mx, tot) =>
      // languages with enough docs to shard must actually split
      if (tot >= 8) assert(mx < tot, s"$lang: one shard holds all $tot docs")
    }
  }
}
