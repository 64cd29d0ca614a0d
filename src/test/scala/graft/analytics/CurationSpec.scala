package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.store.SparkTestSession

/** The composable curation API: each dedup tier removes its class of
  * duplicates from a planted corpus, the quality gate and holdout are
  * honored, and the oracle-locked p01 gate is exactly `curate` with
  * defaults.
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import Pipeline.{curate, CurationConfig}

  // 40+ distinct tokens so the quality gate (>=20 tokens, ttr>=0.3) passes
  private val base = (1 to 45).map(i => s"tok$i").mkString(" ")
  private val other = (100 to 145).map(i => s"w$i").mkString(" ")

  private def corpus() = {
    import spark.implicits._
    Seq(
      (1L, "en", base),                       // survivor
      (2L, "en", base),                       // byte dup of 1
      (3L, "en", base + " extra tail here"),  // near dup of 1 (shares passage)
      (4L, "de", other),                      // distinct survivor
      (6L, "en", "too short"),                // fails quality gate
      (10L, "en", other + " " + other)        // held out (10 % 5 == 0)
    ).toDF("doc_id", "lang", "text")
  }

  private def ids(cfg: CurationConfig): Set[Long] =
    curate(corpus(), cfg).select("doc_id").collect().map(_.getLong(0)).toSet

  test("exact tier removes byte dups; gate and holdout honored") {
    assert(ids(CurationConfig()) == Set(1L, 3L, 4L))
  }

  test("winnow tier also removes the shared-passage near dup") {
    assert(ids(CurationConfig(dedup = "winnow")) == Set(1L, 4L))
  }

  test("minhash tier also removes the near dup") {
    assert(ids(CurationConfig(dedup = "minhash", minhashJaccard = 0.5)) == Set(1L, 4L))
  }

  test("cluster tier keeps exactly one survivor per near-dup component") {
    // same duplicate structure as minhash here (1-2-3 form one
    // component whose min is 1), but via connected components
    assert(ids(CurationConfig(dedup = "cluster", minhashJaccard = 0.5)) == Set(1L, 4L))
  }

  test("none tier keeps all quality-passing unheld docs") {
    assert(ids(CurationConfig(dedup = "none")) == Set(1L, 2L, 3L, 4L))
  }

  test("holdout can be disabled") {
    assert(ids(CurationConfig(dedup = "none", holdoutModulus = 0)) ==
      Set(1L, 2L, 3L, 4L, 10L))
  }

  test("p01 gate equals curate(defaults) + stats on the real table") {
    val dir = "/root/testdata/sf0.001"
    val viaApi = Pipeline.curationStats(
      curate(Tables.documents(spark, dir))).collect().map(_.toSeq).toSeq
    val gate = Pipeline.p01CurationPipeline(spark, dir).collect().map(_.toSeq).toSeq
    assert(viaApi == gate && gate.nonEmpty)
  }
}
