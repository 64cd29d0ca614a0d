package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

import graft.store.SparkTestSession

/** Streaming semantics: the stateful flatMapGroupsWithState
  * sessionization must agree with its batch twin on bounded input, and
  * the windowed aggregation must equal the batch groupBy. */
class StreamingSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("windowed streaming agg equals batch aggregation") {
    val streamed = EventStream.runToCompletion(spark,
      EventStream.dailyCounts(_, dir), "stream_spec_daily")
      .orderBy("day", "event_type").collect().toSeq
    val batch = graft.analytics.Tables.events(spark, dir)
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
               col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .orderBy("day", "event_type").collect().toSeq
    assert(streamed == batch)
  }

  test("stream reader handles both fixture ts generations (nanos-long and timestamp[us])") {
    // the events fixture has changed physical ts type twice
    // (TIMESTAMP(NANOS) → timestamp[us]); the streaming reader must
    // produce identical results over either encoding of the same data.
    // Materialize both from the canonical fixture and drive st01's
    // daily aggregation through each.
    import java.nio.file.Files
    val tmp = graft.core.TempDirs.create("graft-ts-generations")
    val canonical = graft.analytics.Tables.events(spark, dir)
    // micros generation: TIMESTAMP_NTZ writes as timestamp[us],
    // isAdjustedToUTC=false — the round-6 fixture shape
    canonical
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.parquet(s"$tmp/micros/events.parquet")
    // nanos generation: an INT64 of epoch-nanoseconds — exactly what
    // the nanosAsLong surface of the original TIMESTAMP(NANOS) fixture
    // hands the reader
    canonical
      .withColumn("ts", expr("unix_micros(ts) * 1000"))
      .write.parquet(s"$tmp/nanos/events.parquet")
    def drive(d: String, name: String) =
      EventStream.runToCompletion(spark, EventStream.dailyCounts(_, d), name)
        .orderBy("day", "event_type").collect().toSeq
    val expected = drive(dir, "spec_gen_canonical")
    assert(expected.nonEmpty)
    assert(drive(s"$tmp/micros", "spec_gen_micros") == expected,
      "timestamp[us] fixture generation diverged from canonical")
    assert(drive(s"$tmp/nanos", "spec_gen_nanos") == expected,
      "nanos-long fixture generation diverged from canonical")
  }

  test("stream starts over an empty source directory and picks up arriving files") {
    // the production arriving-file mode: the directory exists but the
    // first file lands AFTER the stream starts — the footer probe must
    // fall back to a declared schema instead of refusing to start
    import java.nio.file.Files
    val tmp = graft.core.TempDirs.create("graft-stream-empty")
    Files.createDirectories(tmp.resolve("events.parquet"))
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val q = EventStream.dailyCounts(s, tmp.toString).writeStream
      .outputMode("complete").format("memory")
      .queryName("spec_empty_start").start()
    q.processAllAvailable()
    assert(s.table("spec_empty_start").count() == 0)
    // first file arrives (current fixture generation: timestamp[us])
    graft.analytics.Tables.events(spark, dir)
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .coalesce(1).write.mode("append").parquet(s"$tmp/events.parquet")
    q.processAllAvailable()
    q.stop()
    assert(s.table("spec_empty_start").count() > 0,
      "arriving file was not picked up by the already-running stream")
  }

  test("file-source incremental ingestion equals the single-batch result") {
    // the same events split over 3 files and trickled one file per
    // microbatch must aggregate to the single-batch (and batch-oracle)
    // result — the property the production file/Kafka path relies on
    import java.nio.file.{Files, Paths}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tmp = graft.core.TempDirs.create("graft-stream-files")
    // three single-file splits, each named events.parquet so the
    // source's pathGlobFilter matches: $tmp/split{i}/events.parquet
    val staging = s"$tmp/staging"
    spark.read.parquet(s"$dir/events.parquet").repartition(3)
      .write.parquet(staging)
    val parts = Files.list(Paths.get(staging)).toArray.map(_.toString)
      .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS")).sorted
    assert(parts.length == 3)
    parts.zipWithIndex.foreach { case (p, i) =>
      val d = Paths.get(s"$tmp/split$i")
      Files.createDirectories(d)
      Files.move(Paths.get(p), d.resolve("events.parquet"))
    }
    val trickled = EventStream.runToCompletion(spark,
      EventStream.dailyCounts(_, s"$tmp/split*", maxFilesPerTrigger = Some(1)),
      "spec_trickle_daily")
      .orderBy("day", "event_type").collect().map(_.toSeq).toSeq
    val oneShot = EventStream.runToCompletion(spark,
      EventStream.dailyCounts(_, dir), "spec_oneshot_daily")
      .orderBy("day", "event_type").collect().map(_.toSeq).toSeq
    assert(trickled.nonEmpty && trickled == oneShot)
  }

  test("idle sessions are emitted via event-time timeout") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[EventStream.Event]
    val name = "spec_timeout_sessions"
    val q = EventStream.sessionizeEvents(src.toDS(), gapMinutes = 30)
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    val M = 60000L
    // base at 1970-01-02: a t=0 event would equal the initial watermark
    // (0) and be discarded as late data before reaching the state fn
    val B = 86400000L
    def ev(id: Long, user: Long, tsMs: Long, v: Double) =
      EventStream.Event(id, new java.sql.Timestamp(B + tsMs), user, "view", v)
    // batch 1: user 1 has a 2-event session, then a second session at
    // 2h — and then goes idle FOREVER. User 2 has one event at t=0.
    src.addData(ev(1, 1, 0, 1.0), ev(2, 1, 10 * M, 2.0), ev(3, 1, 120 * M, 3.0),
                ev(4, 2, 0, 4.0))
    q.processAllAvailable()
    // batch 2: user 2 returns 10h later → watermark advances to 9h,
    // far past user 1's timeout horizon (2h30m)
    src.addData(ev(5, 2, 600 * M, 5.0))
    q.processAllAvailable()
    // batch 3: runs under the 9h watermark → user 1's idle session MUST
    // fire via hasTimedOut (its user has no event in any later batch)
    src.addData(ev(6, 2, 601 * M, 6.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table(name)
      .select("user_id", "start_ms", "end_ms", "n_events", "total_value")
      .collect().map(_.toSeq).toSet
    val expected: Set[Seq[Any]] = Set(
      Seq(1L, B, B + 10 * M, 2L, 3.0),            // closed by user 1's 2h event
      Seq(1L, B + 120 * M, B + 120 * M, 1L, 3.0), // idle session — timeout-only emission
      Seq(2L, B, B, 1L, 4.0),                     // closed by user 2's 10h event (or its timeout)
    )
    assert(got == expected,
      s"timeout emission mismatch: got ${got.diff(expected)}, missing ${expected.diff(got)}")
  }

  test("sessionization is invariant to microbatch slicing") {
    // the state function must produce identical sessions no matter how
    // the same event stream is cut into microbatches — the property
    // that makes results reproducible across trigger intervals, source
    // rates, and replays
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val M = 60000L
    val B = 86400000L
    def ev(id: Long, user: Long, tsMs: Long) =
      EventStream.Event(id, new java.sql.Timestamp(B + tsMs), user, "view", 1.0)
    // globally time-ordered: under a finer slicing the watermark
    // advances between batches, so an out-of-order fixture would make
    // later users' events legitimately late (dropped) — the invariance
    // being asserted holds for in-order delivery
    val events = Seq(
      ev(1, 1, 0), ev(6, 2, 5 * M), ev(2, 1, 10 * M),    // u1 session A starts, u2 singleton
      ev(3, 1, 20 * M), ev(7, 2, 50 * M), ev(8, 3, 60 * M), // u2 second singleton, u3
      ev(4, 1, 120 * M), ev(5, 1, 125 * M))              // u1 session B
    // tail event far in the future: advances the watermark past every
    // session's gap horizon so all of u1-u3's sessions close
    val tail = ev(99, 99, 3000 * M)

    def runWith(slices: Seq[Seq[EventStream.Event]], name: String): Set[Seq[Any]] = {
      val src = MemoryStream[EventStream.Event]
      val q = EventStream.sessionizeEvents(src.toDS(), gapMinutes = 30)
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      (slices :+ Seq(tail)).foreach { s => src.addData(s: _*); q.processAllAvailable() }
      // one more batch under the advanced watermark so timeouts fire
      src.addData(ev(100, 99, 3001 * M)); q.processAllAvailable()
      q.stop()
      spark.table(name).filter(col("user_id") =!= 99)
        .select("user_id", "start_ms", "end_ms", "n_events", "total_value")
        .collect().map(_.toSeq).toSet
    }

    val oneBatch = runWith(Seq(events), "spec_slice_one")
    val bySession = runWith(Seq(events.take(3), events.slice(3, 6), events.drop(6)), "spec_slice_three")
    val perEvent = runWith(events.map(Seq(_)), "spec_slice_single")
    assert(oneBatch.size == 5, s"expected 5 closed sessions, got $oneBatch")
    assert(oneBatch == bySession && oneBatch == perEvent,
      s"slicing changed the result:\none=$oneBatch\nthree=$bySession\nsingle=$perEvent")
  }

  test("stateful sessionization agrees with the batch twin") {
    // bounded-source agreement: every streamed session (event-closed or
    // timeout-closed) must equal a batch session; only per-user trailing
    // sessions inside the watermark+gap horizon may still sit in state.
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

  test("streaming ingest stores cumulative stats: trickle == one-shot byte-identical; compaction bounds the log") {
    // the round-7 defect: per-batch partial aggregates meant a
    // multi-batch drive left each asset holding only the LAST batch's
    // (n, total). Update-mode aggregation must make the stored payload
    // the CUMULATIVE totals under any slicing — byte-identical to the
    // one-shot drive — and in-line compaction must keep the append
    // log's live-file count bounded as batches accumulate.
    import java.nio.file.{Files, Paths}
    val tmp = graft.core.TempDirs.create("graft-ingest-cumulative")
    val staging = s"$tmp/staging"
    spark.read.parquet(s"$dir/events.parquet").repartition(4)
      .write.parquet(staging)
    val parts = Files.list(Paths.get(staging)).toArray.map(_.toString)
      .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS")).sorted
    assert(parts.length == 4)
    parts.zipWithIndex.foreach { case (p, i) =>
      val d = Paths.get(s"$tmp/split$i")
      Files.createDirectories(d)
      Files.move(Paths.get(p), d.resolve("events.parquet"))
    }
    // stored truth per key, straight from the table's append log with
    // the store's own resolution order (newest put_time, then seq)
    def payloadMap(basedir: String): Map[(String, String), String] = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("project", "experiment", "location", "network", "obsvar", "layer")
        .orderBy(col("put_time").desc, col("seq").desc)
      spark.read.parquet(s"$basedir/timeseries")
        .withColumn("_rn", org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("_rn") === 1 && col("op") === "put")
        .select("experiment", "location", "json").collect()
        .map(r => ((r.getString(0), r.getString(1)), r.getString(2))).toMap
    }
    def dataFiles(basedir: String): Int = {
      val walk = Files.walk(Paths.get(basedir, "timeseries"))
      try walk.iterator().asScala.count(_.toString.endsWith(".parquet"))
      finally walk.close()
    }
    def drive(src: String, mfpt: Option[Int], compactEvery: Int): (String, Map[(String, String), String], Int) = {
      val base = graft.core.TempDirs.create("graft-ingest-store").toString
      val db = new graft.store.TableStore(spark, base)
      try {
        EventStream.ingestEventsToStore(spark, src, db, mfpt, compactEvery)
        (base, payloadMap(base), dataFiles(base))
      } finally db.close()
    }
    val (_, oneShot, _) = drive(dir, None, 0)
    val (_, trickled, trickledFiles) = drive(s"$tmp/split*", Some(1), 0)
    val (_, compacted, compactedFiles) = drive(s"$tmp/split*", Some(1), 2)
    assert(oneShot.nonEmpty)
    assert(trickled == oneShot,
      "trickled drive stored per-batch partials, not cumulative totals")
    assert(compacted == oneShot, "in-line compaction changed stored payloads")
    assert(compactedFiles < trickledFiles,
      s"compaction did not bound the append log: $compactedFiles vs $trickledFiles live files")
    // a sampled key's n must equal the batch event count — guards
    // against both drives storing identically-wrong values
    val ((exp, loc), payload) = oneShot.head
    val expected = graft.analytics.Tables.events(spark, dir)
      .filter(col("event_type") === exp && col("user_id") === loc.toLong)
      .count()
    assert(payload.contains(s""""n":$expected"""),
      s"stored payload $payload does not carry the cumulative n=$expected for ($exp, $loc)")
  }

  test("streaming retention vacuum: pinned reads survive, live payloads unchanged, history collapses") {
    import java.nio.file.{Files, Paths}
    val tmp = graft.core.TempDirs.create("graft-st22-spec")
    val staging = s"$tmp/staging"
    spark.read.parquet(s"$dir/events.parquet").repartition(4)
      .write.parquet(staging)
    val parts = Files.list(Paths.get(staging)).toArray.map(_.toString)
      .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS")).sorted
    parts.zipWithIndex.foreach { case (p, i) =>
      val d = Paths.get(s"$tmp/split$i")
      Files.createDirectories(d)
      Files.move(Paths.get(p), d.resolve("events.parquet"))
    }
    val src = s"$tmp/split*"
    def payloadMap(basedir: String): Map[(String, String), String] = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("project", "experiment", "location", "network", "obsvar", "layer")
        .orderBy(col("put_time").desc, col("seq").desc)
      spark.read.parquet(s"$basedir/timeseries")
        .withColumn("_rn", org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("_rn") === 1 && col("op") === "put")
        .select("experiment", "location", "json").collect()
        .map(r => ((r.getString(0), r.getString(1)), r.getString(2))).toMap
    }
    // reference drive: same slicing, no vacuum — full history kept
    val plainBase = graft.core.TempDirs.create("graft-st22-plain").toString
    val plainDb = new graft.store.TableStore(spark, plainBase)
    val plainRows = try {
      EventStream.ingestEventsToStore(spark, src, plainDb, Some(1), 0)
      spark.read.parquet(s"$plainBase/timeseries").count()
    } finally plainDb.close()
    // retained drive: marker after batch 2, vacuums mid-stream and at
    // end (the drive itself requires the pinned view stable per vacuum)
    val base = graft.core.TempDirs.create("graft-st22-ret").toString
    val db = new graft.store.TableStore(spark, base)
    try {
      val marker = EventStream.ingestEventsToStoreRetained(
        spark, src, db, Some(1), markAfter = 2, vacuumEvery = 2)
      assert(marker >= 0, "not enough batches to pin a mid-stream marker")
      // the pinned view is still resolvable after every vacuum
      assert(db.liveFrameAsOf("timeseries", marker).exists(_.count() > 0))
      // live payloads are exactly the un-vacuumed drive's
      val got = payloadMap(base)
      assert(got.nonEmpty && got == payloadMap(plainBase),
        "retention vacuum changed live payloads")
      // and the pre-marker history physically collapsed
      val retRows = spark.read.parquet(s"$base/timeseries").count()
      assert(retRows < plainRows,
        s"vacuum did not shrink the log: $retRows vs $plainRows")
    } finally db.close()
  }
}
