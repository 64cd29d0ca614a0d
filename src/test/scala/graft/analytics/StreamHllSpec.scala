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
    val tmp = Files.createTempDirectory("graft-stream-hll")
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
}
