package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

import graft.store.SparkTestSession
import graft.streaming.EventStream

/** The streaming mixture sampler's gate is content-hashed and its
  * rollup commutative, so it must equal t16's batch result and be
  * invariant to microbatch slicing. */
class StreamMixtureSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("streaming sampler equals the batch t16 rollup") {
    val batch = TextOps.t16MixtureSample(spark, dir)
      .collect().map(_.toSeq).toSeq
    val streamed = StreamingQueries.st10StreamMixture(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(batch.nonEmpty && streamed == batch)
  }

  test("trickled multi-file arrival equals the one-shot result") {
    import java.nio.file.{Files, Paths}
    val tmp = graft.core.TempDirs.create("graft-stream-mixture")
    val staging = s"$tmp/staging"
    spark.read.parquet(s"$dir/documents.parquet").repartition(3)
      .write.parquet(staging)
    val parts = Files.list(Paths.get(staging)).toArray.map(_.toString)
      .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS")).sorted
    parts.zipWithIndex.foreach { case (p, i) =>
      val d = Paths.get(s"$tmp/split$i")
      Files.createDirectories(d)
      Files.move(Paths.get(p), d.resolve("documents.parquet"))
    }
    val trickled = EventStream.runToCompletion(spark,
        StreamingQueries.mixtureStream(_, s"$tmp/split*", dir, Some(1)),
        "spec_trickle_mixture")
      .orderBy("lang").collect().map(_.toSeq).toSeq
    val oneShot = StreamingQueries.st10StreamMixture(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(trickled.nonEmpty && trickled == oneShot)

    // st11 rides the same commutative-state argument ((source, fp)
    // counts + min doc): trickled arrival must equal one-shot
    val st11Trickled = StreamingQueries.incDedupRollup(
        EventStream.runToCompletion(spark,
          StreamingQueries.incDedupStream(_, s"$tmp/split*", Some(1)),
          "spec_trickle_incdedup"),
        StreamingQueries.ledgerOf(spark, dir))
      .orderBy("source").collect().map(_.toSeq).toSeq
    val st11OneShot = StreamingQueries.st11StreamIncDedup(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(st11Trickled.nonEmpty && st11Trickled == st11OneShot)
  }

  test("streaming incremental dedup equals the d12 batch accounting") {
    val batch = Dedup.d12IncrementalDedup(spark, dir)
      .collect().map(_.toSeq).toSeq
    val streamed = StreamingQueries.st11StreamIncDedup(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(batch.nonEmpty && streamed == batch)
  }
}
