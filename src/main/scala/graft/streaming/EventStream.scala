package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming over the events table — the streaming surface
  * the reference lacks entirely (SURVEY.md §2.10), built the
  * Spark-native way: `readStream` → event-time window aggregation with
  * watermark, and `flatMapGroupsWithState` sessionization for custom
  * state.
  *
  * In production the source would be Kafka/files arriving continuously;
  * the same plan runs unchanged — these helpers take a source path so
  * tests drive them with the static parquet testdata via the file
  * source + a memory sink (`processAllAvailable`).
  */
object EventStream {

  /** events schema with the given physical `ts` type — readStream
    * needs the schema declared up front, and the fixture has shipped
    * `ts` as TIMESTAMP(NANOS) (which Spark surfaces as LongType under
    * `nanosAsLong`) AND as `timestamp[us]` isAdjustedToUTC=false
    * (TIMESTAMP_NTZ). A mis-declared type silently corrupts event time
    * (the reader coerces the raw INT64 into whatever was declared), so
    * [[readEvents]] probes the footer via a batch read and declares
    * what is actually on disk, then normalizes. */
  def eventsSchemaWith(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", tsType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** The physical type the events fixture's `ts` column reads as —
    * one footer read, no data scan. When no files exist yet (an
    * arriving-file stream started over an empty directory — schema
    * inference has nothing to read), fall back to TIMESTAMP_NTZ, the
    * current fixture generation: the stream must still be able to
    * START before the first file lands, and a wrong fallback fails
    * loudly on first read (schema mismatch) rather than corrupting. */
  /** Probe results memoized per events dir: the fixture's physical
    * type is stable for the life of a run, so one footer read per
    * DISTINCT dir replaces one per stream build (streamStreamJoin
    * alone builds two readers — the probe showed up in st06's bench).
    * The empty-dir fallback is NOT memoized: a stream started over an
    * empty directory that later receives files re-probes on the next
    * build. */
  private val probedTsTypes =
    new java.util.concurrent.ConcurrentHashMap[String, DataType]()

  def probeEventsTsType(spark: SparkSession, dir: String): DataType = {
    val hit = probedTsTypes.get(dir)
    if (hit != null) return hit
    // probe on a CLONED session: nanosAsLong must be on to read a
    // TIMESTAMP(NANOS) footer at all, but a reader helper must not
    // mutate the caller's session conf as a side effect
    val probe = spark.newSession()
    probe.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try {
      val batch =
        if (new java.io.File(s"$dir/events.parquet").isDirectory)
          probe.read.parquet(s"$dir/events.parquet")
        else probe.read.option("pathGlobFilter", "events.parquet").parquet(dir)
      val t = batch.schema("ts").dataType
      probedTsTypes.put(dir, t)
      t
    } catch {
      case _: org.apache.spark.sql.AnalysisException => TimestampNTZType
    }
  }

  private def readEvents(spark: SparkSession, dir: String,
                         maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val tsType = probeEventsTsType(spark, dir)
    // only the nanos generation needs the legacy conf, and it needs it
    // on the session the STREAM runs on (the parquet reader takes it
    // from session conf, not per-read options) — the current NTZ
    // generation mutates nothing, and the streaming gates all run on
    // bounded-drive clones, so even the nanos-path set stays
    // drive-scoped.
    if (tsType == LongType)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // maxFilesPerTrigger is the production rate-limiting knob: bound
    // per-microbatch input instead of swallowing a backlog in one batch.
    val r = spark.readStream.schema(eventsSchemaWith(tsType))
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n.toString))
    // two physical layouts, both real: a single `events.parquet` FILE
    // (the sf fixtures) vs an `events.parquet/` DIRECTORY of part
    // files (every production table). pathGlobFilter matches leaf
    // files only, so the single-file layout globs down from the parent
    // dir, while the directory layout streams the table dir itself —
    // with latestFirst-compatible file listing either way.
    val stream =
      if (new java.io.File(s"$dir/events.parquet").isDirectory)
        r.parquet(s"$dir/events.parquet")
      else r.option("pathGlobFilter", "events.parquet").parquet(dir)
    graft.analytics.Tables.normalizeEventTs(stream)
  }

  /** documents schema for the file-source stream (an arriving-crawl
    * analogue of the static table). */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Stream the documents table through the file source — same
    * two-layout handling (single fixture file vs production part-file
    * directory) and rate-limit knob as [[readEvents]]. */
  def readDocumentsStream(spark: SparkSession, dir: String,
                          maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(documentsSchema)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n.toString))
    if (new java.io.File(s"$dir/documents.parquet").isDirectory)
      r.parquet(s"$dir/documents.parquet")
    else r.option("pathGlobFilter", "documents.parquet").parquet(dir)
  }

  /** embeddings schema for the file-source stream (an arriving-vector
    * ingest analogue of the static table). */
  val embeddingsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /** Stream the embeddings table through the file source — same
    * two-layout handling and rate-limit knob as [[readEvents]]. */
  def readEmbeddingsStream(spark: SparkSession, dir: String,
                           maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(embeddingsSchema)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n.toString))
    if (new java.io.File(s"$dir/embeddings.parquet").isDirectory)
      r.parquet(s"$dir/embeddings.parquet")
    else r.option("pathGlobFilter", "embeddings.parquet").parquet(dir)
  }

  /** Event-time daily windowed aggregation with a 1-day watermark.
    * Complete output mode so a bounded drive emits every window —
    * making the result comparable with the batch oracle. */
  def dailyCounts(spark: SparkSession, dir: String,
                  maxFilesPerTrigger: Option[Int] = None): DataFrame =
    readEvents(spark, dir, maxFilesPerTrigger)
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           graft.analytics.Det.sumDecR(col("value"), 2).as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
              col("event_type"), col("n_events"), col("sum_value"))

  /** The st20 state frame: (day, event_type) → the MERGEABLE rollup
    * state q36 stores (count + exact decimal sum + min/max — every
    * column commutative, so microbatch slicing can never move the
    * snapshot). This is q36's state table maintained by the stream
    * itself: state size = |days|×|types|, never event-count. The agg
    * IS `Layout.partials` — the same definition the batch gates
    * store, so stream/batch parity cannot drift. */
  def rollupState(spark: SparkSession, dir: String,
                  maxFilesPerTrigger: Option[Int] = None): DataFrame =
    graft.analytics.Layout.partials(readEvents(spark, dir, maxFilesPerTrigger))

  /** The st21 state frame: (day, event_type) → HLL user sketch +
    * count — q39's distinct-count state maintained by the stream
    * itself. The agg IS `Layout.hllPartials` (one definition, the
    * rollupState rule); sketch merge is commutative and associative,
    * so microbatch slicing never moves the snapshot's registers and
    * state stays |days|×|types| sketches, never event-count. */
  def hllState(spark: SparkSession, dir: String,
               maxFilesPerTrigger: Option[Int] = None): DataFrame =
    graft.analytics.Layout.hllPartials(readEvents(spark, dir, maxFilesPerTrigger))

  /** Streaming exact dedup: drop repeated event_ids within the
    * watermark window (`dropDuplicatesWithinWatermark` keeps state only
    * until the watermark passes — bounded state at any scale), then
    * count survivors per event type. */
  def streamingDedup(spark: SparkSession, dir: String): DataFrame =
    readEvents(spark, dir)
      .withWatermark("ts", "1 day")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_unique"),
           graft.analytics.Det.sumDecR(col("value"), 2).as("sum_value"))

  /** Stream-stream interval join: purchases joined to view events of
    * the same user within the preceding `windowMinutes` — watermarks on
    * both sides bound the join state (Spark retains only rows inside
    * the interval + watermark slack, so state is O(rate · window) at
    * any scale). Inner join → append-mode pairs. */
  def streamStreamJoin(spark: SparkSession, dir: String, windowMinutes: Int = 60): DataFrame = {
    val views = readEvents(spark, dir)
      .filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
              col("event_id").as("view_id"))
      .withWatermark("v_ts", "1 hour")
    val purchases = readEvents(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
              col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "1 hour")
    purchases.join(views,
      col("p_user") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr(s"INTERVAL $windowMinutes MINUTES") &&
        col("v_ts") <= col("p_ts"))
  }

  /** Stream-static enrichment: the events stream joined to the
    * customer→nation dimension — the canonical "enrich a stream with a
    * slowly-changing dimension" production shape. The static side is a
    * fixed-size dim table, so it broadcasts: the stream side stays
    * shuffle-free and the join keeps NO streaming state (unlike a
    * stream-stream join) — per-microbatch cost is one hash-map probe
    * per event at any scale. Aggregated per (nation, event_type) in
    * complete mode (bounded key space: dim-sized). */
  def enrichByNation(spark: SparkSession, dir: String): DataFrame = {
    val dim = broadcast(
      spark.read.parquet(s"$dir/customer.parquet")
        .join(spark.read.parquet(s"$dir/nation.parquet"),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey").as("user_id"), col("n_name").as("nation")))
    readEvents(spark, dir)
      .join(dim, "user_id")
      .groupBy(col("nation"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           graft.analytics.Det.sumDecR(col("value"), 2).as("sum_value"))
  }

  /** Batch-fit per-event-type value profile for [[anomalyCounts]]:
    * mean and population σ from exact DECIMAL sums (Σv, Σv²), so the
    * profile — and every downstream z-score compare — is bit-identical
    * across engines, partition counts, and shuffle merge order (the
    * Det pattern; double accumulation would drift in the last ulp and
    * flip threshold-boundary flags between Spark and the oracle). One
    * partial-aggregating pass, |event_type|-bounded output. */
  private[graft] def eventStats(spark: SparkSession, dir: String): DataFrame = {
    val m = col("s1").cast("double") / col("n")
    graft.analytics.Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast("decimal(18,6)")).as("s1"),
           sum((col("value") * col("value")).cast("decimal(28,12)")).as("s2"))
      .select(col("event_type"), m.as("mean"),
        sqrt(greatest(col("s2").cast("double") / col("n") - m * m, lit(0.0))).as("std"))
  }

  /** z-score anomaly rollup shared by the batch twin and the stream:
    * score each event against its type's (mean, σ) profile, flag
    * |z| > `zThreshold`, and roll up per type. Works identically on a
    * batch or streaming `events` frame — the stream side is a
    * stateless broadcast probe per row (no streaming join state) and
    * ONE complete-mode aggregation whose key space is the event-type
    * set; count/sum/max are commutative, so the result is invariant to
    * microbatch slicing (trickle == one-shot == batch, spec-pinned). */
  private[graft] def anomalyRollup(events: DataFrame, stats: DataFrame,
                                   zThreshold: Double): DataFrame =
    events
      .join(broadcast(stats), "event_type")
      .withColumn("z", when(col("std") === 0.0, lit(0.0))
        .otherwise(abs(col("value") - col("mean")) / col("std")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
           sum(when(col("z") > zThreshold, 1L).otherwise(0L)).as("n_anomalies"),
           max(col("z")).as("mz"))
      .select(col("event_type"), col("n_events"), col("n_anomalies"),
              graft.analytics.Det.dround(col("mz"), 4).as("max_abs_z"))

  /** Streaming anomaly monitor — the production health check on an
    * event firehose: per-event-type z-score scoring of arriving values
    * against a batch-fit (mean, σ) profile, rolled up to anomaly
    * counts per type. The profile is static and broadcast (a nightly
    * fit in production); the stream keeps NO per-event state — scoring
    * is a narrow per-row expression and the only stateful operator is
    * the |event_type|-bounded complete-mode rollup, so state is O(1)
    * in stream length at any scale. */
  def anomalyCounts(spark: SparkSession, dir: String,
                    maxFilesPerTrigger: Option[Int] = None,
                    zThreshold: Double = 2.0): DataFrame =
    anomalyRollup(readEvents(spark, dir, maxFilesPerTrigger),
                  eventStats(spark, dir), zThreshold)

  /** Continuous ingestion from the event stream INTO the asset store —
    * the streaming ETL that feeds the reference's database in
    * production. The per-(user, event_type) aggregation runs INSIDE
    * the stream in UPDATE output mode, so each microbatch hands
    * `foreachBatch` the keys whose running stats changed, carrying the
    * CUMULATIVE (n, total) since stream start — never a batch's
    * partial. With the append log's newest-row-wins read semantics the
    * stored asset therefore holds the same totals under ANY microbatch
    * slicing (StreamingSpec pins trickle == one-shot byte-identical
    * payloads). `total` is summed as DECIMAL in the state store, so
    * the json payload is bit-identical regardless of how arrivals were
    * sliced into batches (double addition would drift in the last
    * ulp). Streaming state: one row per live key — key-bounded, no
    * watermark needed because keys are never retired.
    *
    * Every `compactEvery` batches the table is compacted in-line
    * ([[graft.store.TableStore.compact]]), so the append log's
    * live-file count — and with it read amplification — stays bounded
    * however long the stream runs. The drive runs on a bounded-drive
    * clone: state sizing and any reader conf stay drive-scoped. */
  def ingestEventsToStore(spark: SparkSession, dir: String,
                          db: graft.store.TableStore,
                          maxFilesPerTrigger: Option[Int] = None,
                          compactEvery: Int = 8): Unit =
    driveEventIngest(spark, dir, db, maxFilesPerTrigger) { n =>
      if (compactEvery > 0 && n % compactEvery == 0) db.compact("timeseries")
    }

  /** The ONE ingest drive both store-ingest gates run (st06 with
    * periodic full compaction, st22 with retention vacuums): the
    * aggregation, row mapping, and append are a single definition, and
    * `perBatch` receives the 1-based data-batch count AFTER each
    * append for maintenance hooks — serialized with the appends inside
    * foreachBatch, the single-maintainer discipline. */
  private def driveEventIngest(spark: SparkSession, dir: String,
                               db: graft.store.TableStore,
                               maxFilesPerTrigger: Option[Int])
                              (perBatch: Long => Unit): Unit = {
    val s = boundedDriveSession(spark)
    val nBatches = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = readEvents(s, dir, maxFilesPerTrigger)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast("decimal(18,6)")).as("total"))
      .writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = batch.select(
          lit("events").as("project"),
          col("event_type").cast("string").as("experiment"),
          col("user_id").cast("string").as("location"),
          lit("stream").as("network"),
          lit("value").as("obsvar"),
          lit("surface").as("layer"),
          to_json(struct(col("n"), col("total"))).as("json"),
          lit(null).cast("binary").as("blob"))
        db.bulkAppend("timeseries", rows)
        perBatch(nBatches.incrementAndGet())
      }
      .start()
    q.processAllAvailable()
    q.stop()
    db.flushAll()
  }

  /** st22's drive: [[ingestEventsToStore]]'s loop with RETENTION
    * maintenance inline — after `markAfter` data batches a snapshot
    * marker is pinned (and the marker's live view digested), then
    * every `vacuumEvery` batches AND once at end of stream the table
    * is vacuumed with `compactRetain(marker)` while later appends
    * keep landing. Each vacuum `require`s the pinned view digest
    * unchanged — the retention contract (reads at or after the marker
    * are bit-stable across the vacuum) proven under live ingest, not
    * on a quiesced store. The vacuum runs INSIDE `foreachBatch`, so
    * it is serialized with the stream's own appends — the
    * single-maintainer discipline the rewrite swap documents (same as
    * st13's inline IVF compaction). Returns the marker (−1 if the
    * stream had fewer than `markAfter` batches). */
  def ingestEventsToStoreRetained(spark: SparkSession, dir: String,
                                  db: graft.store.TableStore,
                                  maxFilesPerTrigger: Option[Int] = Some(1),
                                  markAfter: Int = 2,
                                  vacuumEvery: Int = 2): Long = {
    val marker = new java.util.concurrent.atomic.AtomicLong(-1L)
    val pinned = new java.util.concurrent.atomic.AtomicReference[Seq[(String, String)]](null)
    // the pinned view, collected sorted: one bounded (≤ users×types)
    // frame read off the same pruned scan every reader uses — never a
    // per-URI point-read loop (the av06 rule)
    def pinnedView(): Seq[(String, String)] =
      db.liveFrameAsOf("timeseries", marker.get()).map { df =>
        df.select(concat_ws("|", col("project"), col("experiment"),
            col("location"), col("network"), col("obsvar"), col("layer")),
            col("json"))
          .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
      }.getOrElse(Seq.empty)
    def vacuum(): Unit = {
      db.compactRetain("timeseries", marker.get())
      require(pinnedView() == pinned.get(),
        "pinned-marker reads moved across the streaming vacuum")
    }
    driveEventIngest(spark, dir, db, maxFilesPerTrigger) { n =>
      if (n == markAfter) {
        marker.set(db.snapshotSeq())
        pinned.set(pinnedView())
      } else if (marker.get() >= 0 && (n - markAfter) % vacuumEvery == 0)
        vacuum()
    }
    if (marker.get() >= 0) vacuum()
    marker.get()
  }

  /** Bounded-drive helper: on a finite source, every result row of an
    * inner stream-stream join or a complete-mode aggregation is emitted
    * by a DATA batch — watermark-advance ("no-data") microbatches only
    * evict state, so on a drive that ends immediately afterwards they
    * are pure overhead (a full batch round across every state-store
    * partition). The query is built and run on a CLONED session
    * (isolated SQLConf) so disabling them cannot leak into
    * timeout-dependent streaming queries started concurrently on the
    * shared session. Queries that DO emit on watermark advance
    * (event-time timeouts, append-mode aggregation) must not use these
    * helpers. */
  private[graft] def boundedDriveSession(spark: SparkSession): SparkSession =
    driveSessions.synchronized {
      val hit = driveSessions.get(spark)
      if (hit != null) hit
      else {
        val s = spark.newSession()
        s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
        // a streaming query's state-store partition count is frozen at
        // start (unlike batch, AQE cannot right-size it later), and every
        // microbatch pays per-partition store open/commit across ALL
        // stateful operators. Size it to the drive's state volume — for
        // these bounded drives that is a few MB, so 8 partitions; a
        // production deployment sizes this to rate × window before start.
        s.conf.set("spark.sql.shuffle.partitions", "8")
        // Spark 4's checkpoint-file checksums (on by default) spin up a
        // 32-thread ChecksumCheckpointFileManager pool PER STARTED QUERY
        // that outlives q.stop() — measured +32 threads per drive
        // (AgingProbe: 124 → 1393 threads over 30 drives), the r11
        // warm-pass "JVM aging". For bounded drives over TEMP checkpoints
        // (deleted at stop) a corruption checksum protects nothing, so
        // turn it off rather than pay an unbounded thread leak.
        s.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
        driveSessions.put(spark, s)
        s
      }
    }

  /** ONE drive clone per parent session, not one per drive: every
    * session that ever starts a streaming query registers a
    * StreamingQueryListenerBus on the shared LiveListenerBus (measured
    * +2 listeners per drive when cloning per drive) and retains its own
    * SessionState — on a long-lived driver running hundreds of drives
    * that is unbounded growth. Memory-sink names are UUID-unique, so
    * concurrent drives coexist on the shared clone; keys are weak so a
    * test suite's session can still be collected (the clone holds no
    * reference back to its parent). */
  private val driveSessions =
    new java.util.WeakHashMap[SparkSession, SparkSession]()

  /** Run an append-mode streaming query to completion over the bounded
    * file source and return the sink table. `mkDf` receives the
    * isolated drive session the query must be built on. */
  def runAppendToCompletion(spark: SparkSession, mkDf: SparkSession => DataFrame,
                            queryName: String): DataFrame = {
    val s = boundedDriveSession(spark)
    val q = mkDf(s).writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    detachSinkTable(s, queryName)
  }

  /** Resolve the memory-sink table EAGERLY (`table()` runs the
    * analyzer, binding the plan to the sink relation itself), then drop
    * the temp view: the snapshot's rows stay alive exactly as long as
    * the returned DataFrame instead of as long as the drive session's
    * catalog — on the shared drive clone an undropped view would pin
    * every drive's snapshot for the life of the driver. */
  private def detachSinkTable(s: SparkSession, queryName: String): DataFrame = {
    val out = s.table(queryName)
    s.catalog.dropTempView(queryName)
    out
  }

  /** Run a streaming aggregation to completion over the bounded file
    * source and return the final table. `mkDf` receives the isolated
    * drive session the query must be built on. */
  def runToCompletion(spark: SparkSession, mkDf: SparkSession => DataFrame,
                      queryName: String): DataFrame = {
    val s = boundedDriveSession(spark)
    val q = mkDf(s).writeStream
      .outputMode(OutputMode.Complete)
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    detachSinkTable(s, queryName)
  }

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class SessionState(start: Long, last: Long, nEvents: Long, total: Double)
  final case class Session(user_id: Long, start_ms: Long, end_ms: Long,
                           n_events: Long, total_value: Double)

  /** Sessionization core over a typed event stream: per-user sessions
    * closed after `gapMinutes` of inactivity — `flatMapGroupsWithState`
    * with event-time timeout, the canonical stateful-streaming shape.
    * Two emission paths, both required on an unbounded stream:
    *  - event-driven: a new event beyond the gap closes the previous
    *    session immediately;
    *  - timeout-driven: `setTimeoutTimestamp(last + gap)` arms an
    *    event-time timeout after every state update, so an idle user's
    *    final session is emitted once the watermark passes its gap
    *    horizon — without it that session would sit in state forever. */
  def sessionizeEvents(events: org.apache.spark.sql.Dataset[Event],
                       gapMinutes: Int = 30): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L

    def fn(userId: Long, events: Iterator[Event],
           state: GroupState[SessionState]): Iterator[Session] = {
      if (state.hasTimedOut) {
        // gap elapsed with no new events: emit the idle session
        // (timeout invocations always have an empty event iterator)
        val out = state.getOption.map(s => Session(userId, s.start, s.last, s.nEvents, s.total))
        state.remove()
        out.iterator
      } else {
        val sorted = events.toSeq.sortBy(_.ts.getTime)
        var sessions = List.empty[Session]
        var cur = state.getOption
        for (e <- sorted) {
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.last <= gapMs =>
              cur = Some(s.copy(last = t, nEvents = s.nEvents + 1, total = s.total + e.value))
            case Some(s) =>
              sessions ::= Session(userId, s.start, s.last, s.nEvents, s.total)
              cur = Some(SessionState(t, t, 1, e.value))
            case None =>
              cur = Some(SessionState(t, t, 1, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          // clamp to watermark+1: a session already expired relative to
          // the current watermark (late data) must still get a valid
          // timeout (setTimeoutTimestamp rejects timestamps ≤ watermark)
          // and then fires on the next batch
          state.setTimeoutTimestamp(math.max(s.last + gapMs, state.getCurrentWatermarkMs() + 1))
        }
        sessions.reverseIterator
      }
    }

    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
      .toDF()
  }

  /** [[sessionizeEvents]] over the events file stream. */
  def sessionize(spark: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    sessionizeEvents(
      readEvents(spark, dir)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[Event],
      gapMinutes)
  }

  /** Batch-mode sessionization with identical semantics (lag-based gap
    * detection + session aggregation) — the oracle-checkable twin of
    * [[sessionize]], and the shape to prefer for backfills. */
  def sessionizeBatch(spark: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame = {
    val gapMs = gapMinutes * 60000L
    // Tables.events handles both fixture generations (nanos-long and
    // timestamp[us]); unix_millis matches the streaming twin's
    // Timestamp.getTime millisecond resolution exactly.
    val events = graft.analytics.Tables.events(spark, dir)
      .withColumn("ts_ms", expr("unix_millis(ts)"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_ms", "event_id")
    events
      .withColumn("prev_ts", lag(col("ts_ms"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull || col("ts_ms") - col("prev_ts") > gapMs, 1).otherwise(0))
      .withColumn("session_id", sum("new_session").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min("ts_ms").as("start_ms"), max("ts_ms").as("end_ms"),
           count(lit(1)).as("n_events"),
           graft.analytics.Det.sumDecR(col("value"), 2).as("total_value"))
      .drop("session_id")
  }

  private val Window = org.apache.spark.sql.expressions.Window
}
