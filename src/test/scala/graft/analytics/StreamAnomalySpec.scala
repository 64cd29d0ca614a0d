package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

import graft.store.SparkTestSession
import graft.streaming.EventStream

/** The streaming anomaly monitor scores each event statelessly against
  * a static batch-fit profile and its rollup (count/sum/max) is
  * commutative, so it must equal the batch twin exactly and be
  * invariant to microbatch slicing. */
class StreamAnomalySpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("streaming anomaly rollup equals the batch twin") {
    val batch = EventStream.anomalyRollup(
        Tables.events(spark, dir), EventStream.eventStats(spark, dir), 2.0)
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    val streamed = StreamingQueries.st12StreamAnomaly(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(batch.nonEmpty && streamed == batch)
    // the fixture must actually exercise both sides of the flag — a
    // profile that flags nothing (or everything) would make the gate
    // vacuous
    val anomalies = batch.map(r => r(2).asInstanceOf[Long]).sum
    val events = batch.map(r => r(1).asInstanceOf[Long]).sum
    assert(anomalies > 0 && anomalies < events)
  }

  test("trickled multi-file arrival equals the one-shot result") {
    import java.nio.file.{Files, Paths}
    val tmp = graft.core.TempDirs.create("graft-stream-anomaly")
    val staging = s"$tmp/staging"
    // write through Tables.events so the splits carry the normalized
    // TimestampType ts — the probe then declares it directly
    Tables.events(spark, dir).repartition(3).write.parquet(staging)
    val parts = Files.list(Paths.get(staging)).toArray.map(_.toString)
      .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS")).sorted
    assert(parts.length == 3)
    parts.zipWithIndex.foreach { case (p, i) =>
      val d = Paths.get(s"$tmp/split$i")
      Files.createDirectories(d)
      Files.move(Paths.get(p), d.resolve("events.parquet"))
    }
    val trickled = EventStream.runToCompletion(spark,
        EventStream.anomalyCounts(_, s"$tmp/split*", Some(1)),
        "spec_trickle_anomaly")
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    val oneShot = StreamingQueries.st12StreamAnomaly(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(trickled.nonEmpty && trickled == oneShot)
  }
}
