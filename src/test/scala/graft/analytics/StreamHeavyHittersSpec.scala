package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.SparkTestSession
import graft.streaming.EventStream

/** st17: the Misra–Gries GUARANTEE must survive streaming — both
  * one-shot and trickled multi-file arrival. The summary's exact
  * contents are merge-order-dependent (inherent to MG), so unlike the
  * other st gates the pin is the sketch bound, not row equality. */
class StreamHeavyHittersSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  private lazy val exact: Map[String, Long] =
    Tables.documents(spark, dir)
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap

  private def assertGuarantee(sketch: Map[String, Long], label: String): Unit = {
    val n = exact.values.sum
    val err = n / (TextOps.HeavyHittersK + 1)
    val heavy = exact.filter(_._2 > err).keySet
    assert(heavy.nonEmpty, "fixture has no heavy hitters — vacuous")
    assert(sketch.size <= TextOps.HeavyHittersK, s"$label: summary overflows k")
    assert(heavy.subsetOf(sketch.keySet),
      s"$label: missing heavy hitters ${heavy -- sketch.keySet}")
    sketch.foreach { case (tok, est) =>
      val t = exact.getOrElse(tok, 0L)
      assert(est <= t && t <= est + err,
        s"$label: estimate $est for '$tok' (true $t) out of bounds")
    }
  }

  test("one-shot streamed summary carries the MG guarantee") {
    val sk = StreamingQueries.st17StreamHeavyHitters(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assertGuarantee(sk, "one-shot")
  }

  test("trickled multi-file arrival still carries the guarantee") {
    import java.nio.file.{Files, Paths}
    val tmp = graft.core.TempDirs.create("graft-stream-hh")
    val staging = s"$tmp/staging"
    spark.read.parquet(s"$dir/documents.parquet").repartition(4)
      .write.parquet(staging)
    val parts = Files.list(Paths.get(staging)).toArray.map(_.toString)
      .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS")).sorted
    parts.zipWithIndex.foreach { case (p, i) =>
      val d = Paths.get(s"$tmp/split$i")
      Files.createDirectories(d)
      Files.move(Paths.get(p), d.resolve("documents.parquet"))
    }
    val sk = EventStream.runToCompletion(spark,
        StreamingQueries.heavyHittersStream(_, s"$tmp/split*", Some(1)),
        "spec_trickle_hh")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assertGuarantee(sk, "trickled")
  }
}
