package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

import graft.store.SparkTestSession
import graft.streaming.EventStream

/** st16: streaming quality scoring under the persisted model artifact.
  * Scoring is a stateless per-row map and the rollup commutative, so
  * the streamed result must equal the batch scorer's rollup bit for
  * bit and be invariant to microbatch slicing; the artifact round
  * trip must reproduce the in-memory scorer exactly. */
class StreamQualitySpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("artifact round trip reproduces the trained scorer exactly") {
    val (trained, _) = QualityModel.train(QualityModel.features(spark, dir))
    val restored = QualityModel.scorerFor(spark, dir)
    assert(restored.w.toSeq == trained.w.toSeq)
    assert(restored.mu.toSeq == trained.mu.toSeq)
    assert(restored.sd.toSeq == trained.sd.toSeq)
  }

  test("streaming rollup equals the batch scorer's rollup") {
    val batch = StreamingQueries.qualityBatch(spark, dir)
      .orderBy("source").collect().map(_.toSeq).toSeq
    val streamed = StreamingQueries.st16StreamQuality(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(batch.nonEmpty && streamed == batch)
    // every source is scored, and scores actually spread (a constant
    // scorer would vacuously pass parity)
    val means = batch.map(_(2).asInstanceOf[Double])
    assert(means.distinct.length > 1, "mean scores are constant across sources")
  }

  test("trickled multi-file arrival equals the one-shot result") {
    import java.nio.file.{Files, Paths}
    val tmp = graft.core.TempDirs.create("graft-stream-quality")
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
        StreamingQueries.qualityStream(_, s"$tmp/split*", dir, Some(1)),
        "spec_trickle_quality")
      .orderBy("source").collect().map(_.toSeq).toSeq
    val oneShot = StreamingQueries.st16StreamQuality(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(trickled.nonEmpty && trickled == oneShot)
  }
}
