package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

import graft.store.SparkTestSession

/** p12 nightly composition: one d14 CDC application drives all five
  * maintained index families plus the incremental quality rescoring,
  * and each family must land exactly where its standalone gate lands
  * (Verify re-pins the same equality at sf0.01 via
  * `p12_families_eq_standalone`; this is the fast sf0.001 signal). */
class NightlyPipelineSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("p12 family digests equal the standalone gates' results") {
    val got = Pipeline.p12NightlyPipeline(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val standalone: Map[String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame] = Map(
      "g07_knn" -> Graph.g07IncrementalKnn _,
      "m12_images" -> Multimodal.m12ImageIndexMaintenance _,
      "p07_quality" -> Pipeline.p07IncrementalQuality _,
      "p08_ivf" -> Pipeline.p08IncrementalIndex _,
      "p10_postings" -> Pipeline.p10IncrementalPostings _,
      "p11_pq" -> Pipeline.p11IncrementalPqIndex _)
    assert(got.keySet == standalone.keySet)
    standalone.foreach { case (fam, gate) =>
      val want = Pipeline.familyDigest(gate(spark, dir))
      assert(got(fam)._1 > 0, s"$fam: empty family result")
      assert(got(fam) == want, s"$fam: $dir composition drifted from standalone")
    }
  }

  test("p12 repeat invocation stays within 2x of the first (no warm-repeat aging)") {
    // the spec-scope twin of Bench's every-pass aging criterion: the
    // r13 driver bench caught p12's SECOND run at 9.7× its first (a
    // masked >60s stall). The gate is now per-invocation idempotent
    // (g07 store resets to seed, families run on a dedicated pool),
    // so a repeat must cost the same work. 2× + 2s slack absorbs
    // suite-level GC/JIT noise at sf0.001 while a genuine stall (the
    // r13 shape was ~10×) still fails loudly.
    def timed(): Double = {
      val t0 = System.nanoTime()
      Pipeline.p12NightlyPipeline(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    val first = timed()
    val second = timed()
    assert(second <= 2.0 * first + 2.0,
      s"p12 repeat took ${second}s vs first ${first}s — warm-repeat aging")
  }
}
