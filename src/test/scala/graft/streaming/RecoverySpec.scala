package graft.streaming

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.store.SparkTestSession

/** Checkpointed recovery: a streaming aggregation stopped mid-stream
  * and restarted from the same checkpoint must pick up exactly where
  * it left off — the parquet sink ends with no duplicated and no lost
  * windows versus processing everything in one run. This is the
  * operational property a long-running 100 TB ingestion depends on:
  * crash, restart, same answer.
  */
class RecoverySpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("restart from checkpoint neither duplicates nor loses windows") {
    val tmp = graft.core.TempDirs.create("graft-recovery")

    // split events into 3 TIME-CONTIGUOUS single-file batches: files
    // must arrive roughly in event-time order or the watermark from an
    // early batch legitimately drops later files' events as late data.
    // Tables.events normalizes ts to TimestampType, so the staged
    // files are written as adjusted-to-UTC timestamp[us] and the
    // stream below declares exactly that.
    val ev = graft.analytics.Tables.events(spark, dir)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("ts", "event_id")))
    val total = ev.count()
    val parts = (0 until 3).map { i =>
      val stage = s"$tmp/stage$i"
      ev.filter(col("rn") > i * total / 3 && col("rn") <= (i + 1) * total / 3)
        .drop("rn").coalesce(1).write.parquet(stage)
      Files.list(Paths.get(stage)).toArray.map(_.toString)
        .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS")).head
    }
    val srcDir = Files.createDirectories(Paths.get(s"$tmp/src"))
    def addFile(i: Int): Unit =
      Files.copy(Paths.get(parts(i)), srcDir.resolve(s"events_$i.parquet"))

    // append-mode daily aggregation: windows emit when the watermark
    // closes them, so output accumulates monotonically in the sink
    def agg(s: org.apache.spark.sql.SparkSession) = {
      s.readStream.schema(EventStream.eventsSchemaWith(
          org.apache.spark.sql.types.TimestampType))
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$tmp/src")
        .withWatermark("ts", "1 day")
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
                col("event_type"), col("n_events"))
    }
    def drive(label: String): Unit = {
      val s = spark.newSession()
      val q = agg(s).writeStream
        .outputMode(OutputMode.Append)
        .option("checkpointLocation", s"$tmp/chk")
        .format("parquet").option("path", s"$tmp/out")
        .start()
      q.processAllAvailable()
      q.stop()
    }

    addFile(0); addFile(1)
    drive("first run")     // processes files 0-1, then STOPS (crash stand-in)
    addFile(2)
    drive("restarted run") // same checkpoint: must resume, not reprocess

    val out = spark.read.parquet(s"$tmp/out")
    // no window emitted twice
    assert(out.groupBy("day", "event_type").count().filter(col("count") > 1).isEmpty,
      "restart duplicated emitted windows")
    // equals the batch result for every closed (emitted) window, and
    // covers all but the final unclosed day
    val batch = graft.analytics.Tables.events(spark, dir)
      .select(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
              col("event_type"))
      .groupBy("day", "event_type").agg(count(lit(1)).as("n_events"))
    val mismatched = out.join(batch, Seq("day", "event_type"))
      .filter(out("n_events") =!= batch("n_events"))
    assert(mismatched.isEmpty, "recovered counts disagree with batch")
    // a window [d, d+1) closes once watermark = maxTs - 1 day passes
    // d+1, so the final day plus the 1-day watermark lag may be
    // legitimately unemitted — anything beyond that is lost data
    val emittedDays = out.select("day").distinct().count()
    val allDays = batch.select("day").distinct().count()
    assert(emittedDays >= allDays - 2,
      s"lost closed windows: emitted $emittedDays of $allDays days")
  }
}
