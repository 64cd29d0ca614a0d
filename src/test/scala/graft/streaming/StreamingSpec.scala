package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.store.SparkTestSession

/** Streaming semantics: the stateful flatMapGroupsWithState
  * sessionization must agree with its batch twin on bounded input, and
  * the windowed aggregation must equal the batch groupBy. */
class StreamingSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("windowed streaming agg equals batch aggregation") {
    val streamed = EventStream.runToCompletion(spark,
      EventStream.dailyCounts(spark, dir), "stream_spec_daily")
      .orderBy("day", "event_type").collect().toSeq
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
               col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .orderBy("day", "event_type").collect().toSeq
    assert(streamed == batch)
  }

  test("stateful sessionization agrees with the batch twin") {
    // streaming emits only sessions closed by a later event (the final
    // open session per user stays in state on a bounded source), so
    // compare on the common prefix: every streamed session must equal
    // a batch session, and per-user counts differ by at most 1.
    val streamed = EventStream.sessionize(spark, dir, gapMinutes = 30)
    val name = "stream_spec_sessions"
    val q = streamed.writeStream.outputMode("append").format("memory").queryName(name).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table(name)
      .select(col("user_id"), col("start_ms"), col("end_ms"),
        col("n_events"), round(col("total_value"), 2).as("total_value"))
      .collect().map(_.toSeq).toSet
    val batch = EventStream.sessionizeBatch(spark, dir, gapMinutes = 30)
      .collect().map(_.toSeq).toSet
    assert(got.nonEmpty, "streaming emitted no closed sessions")
    assert(got.subsetOf(batch),
      s"streamed sessions not found in batch: ${got.diff(batch).take(3)}")
  }
}
