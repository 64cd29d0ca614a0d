package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

import graft.store.SparkTestSession
import graft.streaming.EventStream

/** st20 contracts: the streamed rollup state equals q36's batch
  * output, and microbatch slicing can't move it (every state column
  * is commutative). */
class StreamRollupSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("streamed rollup state report equals the q36 batch output") {
    val batch = Layout.q36IncrementalAgg(spark, dir).collect().map(_.toSeq).toSeq
    val streamed = StreamingQueries.st20StreamRollupState(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(batch.nonEmpty && streamed == batch)
  }

  test("trickled multi-file arrival equals the one-shot result") {
    import java.nio.file.{Files, Paths}
    val tmp = graft.core.TempDirs.create("graft-stream-rollup")
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
      EventStream.rollupState(_, s"$tmp/split*", Some(1)), "spec_trickle_rollup")
    val trickled = StreamingQueries.rollupReport(snapshot)
      .collect().map(_.toSeq).toSeq
    val oneShot = StreamingQueries.st20StreamRollupState(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(trickled.nonEmpty && trickled == oneShot)
  }
}
