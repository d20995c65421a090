package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.Num._

/** Structured Streaming over the events table: the streaming half of the
  * engine (SURVEY.md §2.10 notes the reference has none — this is the
  * scale-extension surface: watermarked event-time windows + custom
  * session state).
  *
  * Design: `readStream` file source over the events parquet with a pinned
  * schema (ts arrives as TIMESTAMP(NANOS) ⇒ read as long, rebuilt to µs
  * timestamps), watermark on event time, tumbling 1-hour windows. The batch
  * twin is Relational.q23_events_hourly — the streaming aggregation must
  * produce identical totals once all data is processed (asserted in
  * EventsStreamSpec).
  */
object EventsStream {

  /** Pinned on-disk schema of events.parquet with `ts` in the given
    * physical surfacing (the streaming file source needs an explicit
    * schema — it never infers). */
  private def rawSchema(tsType: org.apache.spark.sql.types.DataType): StructType =
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", tsType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))

  /** Streaming source over the events parquet file(s). The on-disk `ts`
    * layout differs across driver testdata generations — TIMESTAMP(NANOS)
    * (surfaced as long under nanosAsLong) vs naive timestamp[us]
    * (TIMESTAMP_NTZ) — so probe the batch footer once and pin the matching
    * streaming schema, normalizing to a session-tz (UTC) TimestampType
    * event-time column either way, exactly like [[graft.Tables.events]]. */
  def source(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val onDisk = graft.Tables.table(spark, dir, "events").schema("ts").dataType
    val raw = spark.readStream
      .schema(rawSchema(onDisk))
      // the file source wants a directory; select just the events table
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    onDisk match {
      case LongType => // nanos-as-long → µs instants
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => // naive µs → session-tz (UTC) instants
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Watermarked tumbling-window aggregation: hourly event counts/values
    * per type. The watermark's guarantees (late data dropped, state
    * evicted) apply in Append/Update mode — the production pattern,
    * exercised by the watermark spec and runIncrementalHourly. runHourly
    * below deliberately runs Complete (watermark inert, all windows kept)
    * because the memory-sink equivalence test wants every window. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(money(col("value"))).cast(DoubleType).as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"),
              col("n_events"), col("total_value"))

  /** Run the streaming query to completion against the (static) test
    * parquet via the memory sink; returns the materialized result.
    * Complete mode ⇒ full recomputation into memory — a TEST harness,
    * not the scale pattern (see hourlyAgg doc). */
  def runHourly(spark: SparkSession, dir: String, queryName: String = "events_hourly"): DataFrame = {
    val q = hourlyAgg(source(spark, dir))
      .writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  // ------------------------------------------- stream-stream interval join
  /** Stream-stream interval join: purchases joined to clicks by the same
    * user within the preceding hour. Both sides carry watermarks and the
    * join condition bounds event-time distance, so Spark can expire join
    * state — the canonical stateful two-stream pattern. Batch twin:
    * Warehouse.q49_interval_join (oracle-checked). */
  def purchaseClickJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
              col("event_id").as("click_id"))
      .withWatermark("click_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
              col("event_id").as("purchase_id"))
      .withWatermark("purchase_ts", "2 hours")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("p_user").as("user_id"), col("purchase_id"),
              col("click_id"), col("purchase_ts"), col("click_ts"))
  }

  /** Run the interval join to completion on the static events table. */
  def runPurchaseClickJoin(spark: SparkSession, dir: String,
                           queryName: String = "events_interval_join"): DataFrame = {
    val q = purchaseClickJoin(source(spark, dir))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  // --------------------------------------- stream-stream LEFT OUTER join
  /** Stream-stream LEFT OUTER: every click, with its purchase within the
    * following hour when one exists, else nulls — the "abandoned click"
    * stream. State TTL is watermark-driven: both sides are watermarked and
    * the join condition bounds event-time distance, so a click's join
    * state expires (and its unmatched row EMITS, with null purchase
    * columns) once the watermark proves no matching purchase can still
    * arrive — bounded state at any input rate, no manual TTL clock.
    * Batch twin: [[batchClickPurchaseLeft]] (matched rows must be
    * identical; unmatched rows appear once the watermark passes them —
    * asserted in EventsStreamSpec). */
  def clickPurchaseLeftJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
              col("event_id").as("click_id"))
      .withWatermark("click_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
              col("event_id").as("purchase_id"))
      .withWatermark("purchase_ts", "2 hours")
    clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"),
      "left_outer")
      .select(col("c_user").as("user_id"), col("click_id"), col("click_ts"),
              col("purchase_id"), col("purchase_ts"))
  }

  /** Run the left-outer join to completion on the static events table. */
  def runClickPurchaseLeft(spark: SparkSession, dir: String,
                           queryName: String = "events_left_join"): DataFrame = {
    val q = clickPurchaseLeftJoin(source(spark, dir))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Batch twin of [[clickPurchaseLeftJoin]] — same projection, same
    * condition, plain left outer over the static table. */
  def batchClickPurchaseLeft(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
              col("event_id").as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
              col("event_id").as("purchase_id"))
    clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"),
      "left_outer")
      .select(col("c_user").as("user_id"), col("click_id"), col("click_ts"),
              col("purchase_id"), col("purchase_ts"))
  }

  // --------------------------------------------- native session_window
  /** Native `session_window` twin of the sessionizers: Spark's built-in
    * gap-based session aggregation (30-min inactivity). Convention note:
    * session_window's window is half-open — an event at exactly
    * last_ts + gap starts a NEW session, where the custom fold
    * ([[foldSession]], `> GapUs`) would extend; `window.end` is
    * last_ts + gap, not last_ts. Works identically over a batch frame and
    * a watermarked stream — EventsStreamSpec asserts the two agree. */
  def sessionWindowAgg(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           sum(money(col("value"))).cast(DoubleType).as("total_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
              col("session_window.end").as("session_end"),
              col("n_events"), col("total_value"))

  /** Streaming run of [[sessionWindowAgg]]: watermarked, Append mode (the
    * production shape — finalized sessions only). */
  def runSessionWindow(spark: SparkSession, dir: String,
                       queryName: String = "events_session_window"): DataFrame = {
    val q = sessionWindowAgg(source(spark, dir).withWatermark("ts", "2 hours"))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Batch run of [[sessionWindowAgg]] over the static events table. */
  def batchSessionWindow(spark: SparkSession, dir: String): DataFrame =
    sessionWindowAgg(graft.Tables.events(spark, dir))

  // ------------------------------------------- incremental aggregate fact
  /** foreachBatch incremental materialization: update-mode re-emissions
    * carry the full cumulative aggregate for their window, so each append
    * is tagged with its batch id and readers take the LATEST batch per
    * window (latest-wins, NOT summing — summing would re-count earlier
    * emissions). Checkpointed replays are no-ops; a replayed append is
    * additionally superseded at read time. At scale the partials are tiny
    * (one row per updated window×type per batch) and periodic compaction
    * keeps only each window's latest row. */
  def runIncrementalHourly(spark: SparkSession, dir: String, outDir: String): Unit = {
    // a restart after a compaction crash must repair the partials dir
    // BEFORE appending (an append would re-create a missing live dir and
    // hide the aside copy from the missing-dir recovery arm)
    StateCompaction.recoverHourlyPartials(outDir)
    val q = source(spark, dir)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(money(col("value"))).as("total_value_d"))
      .writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch
          .select(col("window.start").as("hour"), col("event_type"),
                  col("n_events"), col("total_value_d"))
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(s"$outDir/hourly_partials")
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$outDir/checkpoint")
      .start()
    q.awaitTermination()
  }

  /** Merged view over the incremental partials (latest state per window):
    * update-mode re-emissions are superseded by the highest batch id. */
  def readIncrementalHourly(spark: SparkSession, outDir: String): DataFrame = {
    // self-healing read: only in the two states a crashed swap leaves
    // (live dir missing / aside copy present) — a bare temp alongside an
    // intact live dir may belong to a running compaction and is not ours
    if (StateCompaction.hourlyCrashed(outDir))
      StateCompaction.recoverHourlyPartials(outDir)
    val partials = spark.read.parquet(s"$outDir/hourly_partials")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("hour", "event_type").orderBy(col("batch_id").desc)
    partials
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("hour"), col("event_type"), col("n_events"),
              col("total_value_d").cast("double").as("total_value"))
  }

  // ------------------------------------------------- stateful sessions
  case class Ev(user_id: Long, ts: java.sql.Timestamp, tsMicros: Long, value: Double)
  case class SessionOut(user_id: Long, session_idx: Int, n_events: Long,
                        start_us: Long, end_us: Long, total_value: Double)
  /** Public: the state encoder's generated code must reach the ctor. */
  case class SessState(idx: Int, lastUs: Long, n: Long,
                               startUs: Long, sumValue: Double)

  private val GapUs: Long = 30L * 60 * 1000000
  /** How long a closed-session tombstone (n == 0, below) survives before its
    * cleanup timeout removes it — bounds per-user state while keeping the
    * session counter monotone across session-close timeouts. */
  private val TombstoneTtlUs: Long = 24L * 3600 * 1000000

  /** Shared per-user session fold (single source of truth for the
    * streaming and batch paths). Events must be fed in ascending time
    * order within the call; a cross-batch LATE event (ts < state.lastUs)
    * is merged into the open session without regressing lastUs, so a
    * straggler can never corrupt the gap clock.
    *
    * A state with n == 0 is a TOMBSTONE: the session `idx` was already
    * emitted by an event-time timeout, and only the counter survives so the
    * next session continues at idx + 1 instead of restarting at 1 (which
    * would emit duplicate (user_id, session_idx) keys). */
  private def foldSession(user: Long, st0: SessState, evs: Seq[Ev])
      : (SessState, Seq[SessionOut]) = {
    var st = st0
    val closed = scala.collection.mutable.ArrayBuffer[SessionOut]()
    evs.foreach { e =>
      st match {
        case null =>
          st = SessState(1, e.tsMicros, 1, e.tsMicros, e.value)
        case s if s.n == 0 =>
          // tombstone: previous session already emitted at timeout — start
          // the next one, continuing the numbering, emitting nothing here
          st = SessState(s.idx + 1, e.tsMicros, 1, e.tsMicros, e.value)
        case s if e.tsMicros - s.lastUs > GapUs =>
          closed += SessionOut(user, s.idx, s.n, s.startUs, s.lastUs, s.sumValue)
          st = SessState(s.idx + 1, e.tsMicros, 1, e.tsMicros, e.value)
        case s =>
          st = s.copy(lastUs = math.max(s.lastUs, e.tsMicros), n = s.n + 1,
                      sumValue = s.sumValue + e.value,
                      startUs = math.min(s.startUs, e.tsMicros))
      }
    }
    (st, closed.toSeq)
  }

  /** flatMapGroupsWithState sessionizer: 30-min inactivity gap closes a
    * session (the streaming twin of Warehouse.q25_events_sessionize).
    * Event-time timeout (watermark-driven) flushes the final open session
    * once no more on-time data can arrive — without it, Append mode would
    * hold every user's last session in state forever. Callers must
    * `withWatermark` the underlying frame (see runSessionsStreaming). */
  def sessionize(events: Dataset[Ev]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[Ev], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            if (s.n == 0) {
              // tombstone TTL expired with no new session — drop the counter
              state.remove()
              Iterator.empty
            } else {
              // emit the closed session but KEEP the counter as a tombstone:
              // a user active again later (idle > gap + watermark delay)
              // continues at idx + 1 — same monotone numbering as the batch
              // twin — instead of restarting at 1
              state.update(SessState(s.idx, s.lastUs, 0, s.lastUs, 0.0))
              // timeout must sit above the current watermark (Spark rejects
              // past timestamps); the TTL is measured from session end
              state.setTimeoutTimestamp(math.max(
                s.lastUs / 1000 + TombstoneTtlUs / 1000,
                state.getCurrentWatermarkMs() + 1))
              Iterator.single(SessionOut(user, s.idx, s.n, s.startUs, s.lastUs, s.sumValue))
            }
          } else {
            val evs = it.toSeq.sortBy(e => (e.tsMicros, e.value))
            val (st, closed) = foldSession(user, state.getOption.orNull, evs)
            if (st != null) {
              state.update(st)
              state.setTimeoutTimestamp(st.lastUs / 1000 + GapUs / 1000)
            }
            closed.iterator
          }
      }
  }

  /** Drive the stateful sessionizer as a real stream over the static
    * events parquet (memory sink, run to completion). Sessions still open
    * when the stream ends stay in state (their timeout never fires on a
    * finite input) — mirroring production semantics. */
  def runSessionsStreaming(spark: SparkSession, dir: String,
                           queryName: String = "events_sessions"): DataFrame = {
    import spark.implicits._
    val evs = source(spark, dir)
      .withWatermark("ts", "2 hours")
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("tsMicros"), col("value"))
      .as[Ev]
    val q = sessionize(evs).toDF()
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Batch twin: one pass over the whole table through the SAME fold,
    * open sessions emitted at the end (a finite input has no more data
    * coming). */
  def runSessions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val evs = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("tsMicros"), col("value"))
      .as[Ev]
    import org.apache.spark.sql.Encoders
    evs.groupByKey(_.user_id)
      .flatMapGroups { (user: Long, it: Iterator[Ev]) =>
        val evsSorted = it.toSeq.sortBy(e => (e.tsMicros, e.value))
        val (st, closed) = foldSession(user, null, evsSorted)
        val all = if (st != null)
          closed :+ SessionOut(user, st.idx, st.n, st.startUs, st.lastUs, st.sumValue)
        else closed
        all.iterator
      }(Encoders.product[SessionOut])
      .toDF()
  }
}
