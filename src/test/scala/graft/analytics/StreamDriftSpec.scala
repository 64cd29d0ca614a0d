package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

import graft.store.SparkTestSession
import graft.streaming.EventStream

/** The streaming drift monitor's bin counts are exact and commutative,
  * so it must equal the batch t32 report and be invariant to
  * microbatch slicing. */
class StreamDriftSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("streaming drift report equals the batch t32 report") {
    val batch = TextOps.t32SourceDrift(spark, dir)
      .collect().map(_.toSeq).toSeq
    val streamed = StreamingQueries.st14StreamDrift(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(batch.nonEmpty && streamed == batch)
    // the report must discriminate: not every source can carry the
    // same PSI, or the monitor says nothing
    assert(batch.map(_(2)).distinct.size > 1)
  }

  test("trickled multi-file arrival equals the one-shot result") {
    import java.nio.file.{Files, Paths}
    val tmp = graft.core.TempDirs.create("graft-stream-drift")
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
    val snapshot = EventStream.runToCompletion(spark,
      StreamingQueries.driftStream(_, s"$tmp/split*", Some(1)), "spec_trickle_drift")
    val ref = Tables.documents(spark, dir)
      .select(org.apache.spark.sql.functions.col("source"),
        TextOps.driftBin.as("bin"))
    import org.apache.spark.sql.functions._
    val trickled = TextOps.driftRollup(spark, snapshot,
        ref.groupBy("bin").agg(count(lit(1)).as("cc")),
        ref.groupBy().agg(count(lit(1)).cast("double").as("nc")))
      .orderBy("source").collect().map(_.toSeq).toSeq
    val oneShot = StreamingQueries.st14StreamDrift(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(trickled.nonEmpty && trickled == oneShot)
  }
}
