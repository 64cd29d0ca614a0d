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

  test("embedding tier keeps one survivor per semantic cluster") {
    import spark.implicits._
    // doc 2 is semantically (not textually) near doc 4: the embedding
    // tier must cluster {2,4} and keep the min id, while text-identical
    // 1/2/3 stay untouched — the case only vector dedup catches.
    // Embeddings: 2 and 4 share a direction (cos ≈ 1), others orthogonal.
    def unit(axis: Int, jitter: Double = 0.0): Array[Float] =
      Array.tabulate(64)(d =>
        (if (d == axis) 1.0f else 0.0f) + (if (d == 63) jitter.toFloat else 0.0f))
    val emb = Seq(
      (1L, unit(0)), (2L, unit(1)), (3L, unit(2)),
      (4L, unit(1, jitter = 0.05)), (10L, unit(3))
    ).toDF("vec_id", "embedding")
    val got = curate(corpus(), CurationConfig(dedup = "embedding"), Some(emb))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // quality gate leaves {1,2,3,4,10}; cluster {2,4} keeps 2; holdout
    // drops 10
    assert(got == Set(1L, 2L, 3L))
  }

  test("semdedup tier dedups within k-means clusters and keeps the min id") {
    import spark.implicits._
    // same semantic structure as the embedding-tier case: {2,4} share a
    // direction, everyone else orthogonal. k-means puts co-directional
    // vectors in one cell; the within-cell cosine pass must then catch
    // the pair and keep the min id — while never comparing across cells.
    def unit(axis: Int, jitter: Double = 0.0): Array[Float] =
      Array.tabulate(64)(d =>
        (if (d == axis) 1.0f else 0.0f) + (if (d == 63) jitter.toFloat else 0.0f))
    val emb = Seq(
      (1L, unit(0)), (2L, unit(1)), (3L, unit(2)),
      (4L, unit(1, jitter = 0.05)), (10L, unit(3))
    ).toDF("vec_id", "embedding")
    val got = curate(corpus(), CurationConfig(dedup = "semdedup"), Some(emb))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L))
  }

  test("p02 gate equals curate(semdedup) + stats on the real table") {
    val dir = "/root/testdata/sf0.001"
    val viaApi = Pipeline.curationStats(
      curate(Tables.documents(spark, dir),
        CurationConfig(dedup = "semdedup"),
        Some(Tables.embeddings(spark, dir)))).collect().map(_.toSeq).toSeq
    val gate = Pipeline.p02SemdedupPipeline(spark, dir).collect().map(_.toSeq).toSeq
    assert(viaApi == gate && gate.nonEmpty)
    spark.catalog.clearCache()
  }

  test("semdedup tier degrades to a no-op when no embeddings cover the corpus") {
    import spark.implicits._
    // vec_ids disjoint from the quality docs: nothing is embeddable,
    // so nothing may be dropped (and nothing may crash)
    val emb = Seq((900L, Array.fill(64)(1.0f))).toDF("vec_id", "embedding")
    val got = curate(corpus(), CurationConfig(dedup = "semdedup"), Some(emb))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L, 4L))
  }

  test("semdedup tier never pairs zero-norm vectors (NaN cosine guard)") {
    import spark.implicits._
    // docs 2 and 4 get all-zero embeddings: no similarity signal, so
    // NEITHER may be deleted — without the norm>0 guard their NaN
    // cosine orders above every threshold and 4 would vanish
    val zero = Array.fill(64)(0.0f)
    def unit(axis: Int): Array[Float] = Array.tabulate(64)(d => if (d == axis) 1.0f else 0.0f)
    val emb = Seq(
      (1L, unit(0)), (2L, zero), (3L, unit(2)), (4L, zero), (10L, unit(3))
    ).toDF("vec_id", "embedding")
    val got = curate(corpus(), CurationConfig(dedup = "semdedup"), Some(emb))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L, 4L))
  }

  test("embedding tier without an embeddings frame is a config error") {
    intercept[IllegalArgumentException] {
      curate(corpus(), CurationConfig(dedup = "embedding"))
    }
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

  test("t40 semantic decontam flags equal what d04's pair table implies") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    // d04 holds every cos>=0.4 pair (same rounding, same threshold) —
    // a doc is t40-flagged iff it pairs with a benchmark member
    val pairs = Dedup.d04EmbeddingNearDup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val isBench = (id: Long) => id % 100 == 50
    val expect = pairs.flatMap { case (i, j) =>
      Seq(i).filter(_ => isBench(j)) ++ Seq(j).filter(_ => isBench(i))
    }.toSet
    val perSource = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .filter { case (id, _) => expect(id) }
      .groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val got = Dedup.t40SemanticDecontam(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got.values.sum > 0, "no flags at the d04 threshold — the gate proves nothing")
    got.foreach { case (src, n) =>
      assert(n == perSource.getOrElse(src, 0L), s"$src: $n != ${perSource.getOrElse(src, 0L)}")
    }
  }
}
