package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

import graft.store.SparkTestSession
import graft.streaming.EventStream

/** st21 contracts: the streamed HLL distinct-count state reports
  * exactly what q39's batch-stored state reports (register-max merge
  * is commutative and associative), and microbatch slicing can't
  * move it. */
class StreamHllSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("streamed HLL state report equals the q39 batch output") {
    val batch = Layout.q39HllState(spark, dir).collect().map(_.toSeq).toSeq
    val streamed = StreamingQueries.st21StreamHllState(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(batch.nonEmpty && streamed == batch)
  }

  test("trickled multi-file arrival equals the one-shot result") {
    import java.nio.file.{Files, Paths}
    val tmp = graft.core.TempDirs.create("graft-stream-hll")
    val staging = s"$tmp/staging"
    Tables.events(spark, dir).repartition(3).write.parquet(staging)
    val parts = Files.list(Paths.get(staging)).toArray.map(_.toString)
      .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS")).sorted
    parts.zipWithIndex.foreach { case (p, i) =>
      val d = Paths.get(s"$tmp/split$i")
      Files.createDirectories(d)
      Files.move(Paths.get(p), d.resolve("events.parquet"))
    }
    val snapshot = EventStream.runToCompletion(spark,
      EventStream.hllState(_, s"$tmp/split*", Some(1)), "spec_trickle_hll")
    val trickled = Layout.hllReport(spark, dir, snapshot)
      .collect().map(_.toSeq).toSeq
    val oneShot = StreamingQueries.st21StreamHllState(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(trickled.nonEmpty && trickled == oneShot)
  }

  test("dense-mode merge: union of sliced sketches tracks a 200k cardinality within HLL error") {
    // the fixture's cardinalities keep the sketch in sparse/exact mode
    // (q39_hll_max_rel_err is 0.0 there), so the merge-closeness
    // invariant is vacuous where it matters — force DENSE mode with a
    // synthetic 200k-distinct id space (lgK=12 → 4096 registers →
    // transition far below 200k), sliced into 16 shards and unioned,
    // exactly the per-day → rollup shape q39 runs
    import org.apache.spark.sql.functions._
    val n = 200000L
    val ids = spark.range(n).select(
      (col("id") % 16).as("slice"),
      // non-contiguous ids: spread hash inputs across the key space
      (col("id") * 2654435761L + 12345L).as("user_id"))
    val partials = ids.groupBy("slice")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val mergedEst = partials
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .first().getLong(0)
    val directEst = ids
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .first().getLong(0)
    val mergedErr = math.abs(mergedEst - n).toDouble / n
    // the estimate must be genuinely approximate (dense mode reached:
    // a 0-error run would mean the spec regressed to sparse/exact
    // territory and proves nothing) yet inside the HLL bound
    // (~1.04/sqrt(4096) ≈ 1.6% std; 5% ≈ 3σ)
    assert(mergedEst != n, "estimate exact — sketch never left sparse mode")
    assert(mergedErr <= 0.05, s"merged estimate off by $mergedErr")
    // and the union must agree with the one-pass sketch at estimate
    // level even in dense mode (register-max merge preserves state;
    // only the estimator mode may differ)
    val gap = math.abs(mergedEst - directEst).toDouble / math.max(1L, directEst)
    assert(gap <= 0.02, s"merged vs direct estimates diverged: $gap")
  }
}
