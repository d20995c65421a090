package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Relational, Warehouse}
import graft.streaming.EventsStream

class EventsStreamSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("streaming hourly aggregation matches the batch twin exactly") {
    val streamed = EventsStream.runHourly(spark, sf, "events_hourly_test")
      .select("hour", "event_type", "n_events", "total_value")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val batch = Relational.q23_events_hourly(spark, sf)
      .select("hour", "event_type", "n_events", "total_value")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streamed == batch,
      s"streaming vs batch drift: ${(streamed -- batch).take(3)} / ${(batch -- streamed).take(3)}")
  }

  test("watermark drops late data in append-mode windows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)](spark)
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val agg = EventsStream.hourlyAgg(df)
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("wm_test").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // batch 1: events at 00:10 and 06:00 → watermark advances to 04:00
    mem.addData((t("2024-01-01 00:10:00"), "a", 1.0), (t("2024-01-01 06:00:00"), "a", 1.0))
    q.processAllAvailable()
    // batch 2: late event at 00:20 — behind the 04:00 watermark → dropped
    mem.addData((t("2024-01-01 00:20:00"), "a", 99.0))
    q.processAllAvailable()
    // batch 3: advance far enough to close every window
    mem.addData((t("2024-01-02 00:00:00"), "a", 1.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("wm_test")
      .select("hour", "n_events", "total_value").collect()
      .map(r => r.getTimestamp(0).toString -> ((r.getLong(1), r.getDouble(2)))).toMap
    // the 00:00 window emitted WITHOUT the late 99.0 event
    assert(out.contains("2024-01-01 00:00:00.0"))
    assert(out("2024-01-01 00:00:00.0") == ((1L, 1.0)),
      s"late event leaked into the closed window: $out")
  }

  test("stream-stream interval join matches the batch interval join") {
    val streamed = EventsStream.runPurchaseClickJoin(spark, sf)
      .select("user_id", "purchase_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = Warehouse.q49_interval_join(spark, sf)
      .select("user_id", "purchase_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch,
      s"drift: ${(streamed -- batch).take(3)} / ${(batch -- streamed).take(3)}")
    assert(batch.nonEmpty)
  }

  /** Replay the real events table through a MemoryStream in two ordered
    * batches plus a far-future sentinel (user_id -1, advancing every
    * watermark so all state finalizes), returning the named memory table.
    */
  private def replayEvents(build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                           queryName: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    val mem = MemoryStream[(java.sql.Timestamp, Long, String, Long, Double)](spark)
    val df = mem.toDF().toDF("ts", "user_id", "event_type", "event_id", "value")
    val q = build(df).writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(queryName).start()
    val rows = Tables.events(spark, sf)
      .select("ts", "user_id", "event_type", "event_id", "value")
      .orderBy("ts", "event_id").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getString(2),
                 r.getLong(3), r.getDouble(4)))
    val (h1, h2) = rows.splitAt(rows.length / 2)
    mem.addData(h1.toSeq); q.processAllAvailable()
    mem.addData(h2.toSeq); q.processAllAvailable()
    val far = new java.sql.Timestamp(rows.last._1.getTime + 365L * 24 * 3600 * 1000)
    mem.addData(Seq((far, -1L, "click", -1L, 0.0), (far, -1L, "purchase", -2L, 0.0)))
    q.processAllAvailable()
    // one more nudge: state finalized at watermark W emits in the batch
    // AFTER the one that moved the watermark past W
    mem.addData(Seq((new java.sql.Timestamp(far.getTime + 3600_000), -1L, "click", -3L, 0.0),
                    (new java.sql.Timestamp(far.getTime + 3600_000), -1L, "purchase", -4L, 0.0)))
    q.processAllAvailable()
    q.stop()
    spark.table(queryName).filter(col("user_id") =!= -1L)
  }

  test("stream-stream LEFT OUTER join equals the batch left outer exactly") {
    val streamed = replayEvents(EventsStream.clickPurchaseLeftJoin, "left_join_test")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
                 if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    val batch = EventsStream.batchClickPurchaseLeft(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
                 if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    assert(streamed == batch,
      s"drift: ${(streamed -- batch).take(3)} / ${(batch -- streamed).take(3)}")
    // the interesting rows — clicks with NO purchase in the hour — exist
    // and were emitted by watermark-driven state expiry, not a final flush
    assert(batch.exists(_._3.isEmpty))
  }

  test("native session_window streaming equals the batch session_window exactly") {
    val streamed = replayEvents(
      df => EventsStream.sessionWindowAgg(df.withWatermark("ts", "2 hours")),
      "session_window_test")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
                 r.getLong(3), r.getDouble(4))).toSet
    val batch = EventsStream.batchSessionWindow(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
                 r.getLong(3), r.getDouble(4))).toSet
    assert(streamed == batch,
      s"drift: ${(streamed -- batch).take(3)} / ${(batch -- streamed).take(3)}")
    assert(batch.size > 100)
  }

  test("foreachBatch incremental hourly fact equals the batch aggregate") {
    val out = java.nio.file.Files.createTempDirectory("graft_incr").toString
    EventsStream.runIncrementalHourly(spark, sf, out)
    val incr = EventsStream.readIncrementalHourly(spark, out)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = Relational.q23_events_hourly(spark, sf)
      .select("hour", "event_type", "n_events", "total_value")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(incr == batch,
      s"incremental vs batch drift: ${(incr -- batch).take(3)} / ${(batch -- incr).take(3)}")
    // idempotence: re-running with the same checkpoint adds no new state
    EventsStream.runIncrementalHourly(spark, sf, out)
    val again = EventsStream.readIncrementalHourly(spark, out)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(again == batch)
  }

  test("flatMapGroupsWithState sessionizer emits exactly the gap-closed sessions") {
    val streamed = EventsStream.runSessionsStreaming(spark, sf)
      .select("user_id", "session_idx", "n_events")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val batchAll = EventsStream.runSessions(spark, sf)
      .select("user_id", "session_idx", "n_events")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // contract: every gap-closed session is emitted; final open sessions
    // are emitted only if their event-time timeout fell below the last
    // watermark (it does for most users here); nothing is fabricated
    val lastPerUser = batchAll.groupBy(_._1).view.mapValues(_.maxBy(_._2)).values.toSet
    val gapClosed = batchAll.toSet -- lastPerUser
    assert(gapClosed.subsetOf(streamed),
      s"missing closed sessions: ${(gapClosed -- streamed).take(3)}")
    assert(streamed.subsetOf(batchAll.toSet),
      s"fabricated sessions: ${(streamed -- batchAll.toSet).take(3)}")
    assert(streamed.nonEmpty)
  }

  test("session counter survives event-time timeout (no duplicate session_idx)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    val mem = MemoryStream[(Long, java.sql.Timestamp)](spark)
    val evs = mem.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "1 minute")
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("tsMicros"),
              lit(1.0).as("value"))
      .as[EventsStream.Ev]
    val q = EventsStream.sessionize(evs).toDF()
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess_timeout_test").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: two events → one open session
    mem.addData((1L, t("2024-01-01 00:00:00")), (1L, t("2024-01-01 00:05:00")))
    q.processAllAvailable()
    // unrelated user pushes the watermark far past 00:05 + 30min gap → the
    // user-1 session times out and is emitted (second nudge batch lets the
    // timeout actually fire after the watermark advances)
    mem.addData((99L, t("2024-01-01 02:00:00")))
    q.processAllAvailable()
    mem.addData((99L, t("2024-01-01 02:01:00")))
    q.processAllAvailable()
    // user 1 returns AFTER the timeout — this is the production path the
    // tombstone protects: numbering must continue at 2, not restart at 1
    mem.addData((1L, t("2024-01-01 03:00:00")), (1L, t("2024-01-01 03:10:00")))
    q.processAllAvailable()
    // close the second session the same way
    mem.addData((99L, t("2024-01-01 06:00:00")))
    q.processAllAvailable()
    mem.addData((99L, t("2024-01-01 06:01:00")))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sess_timeout_test").filter(col("user_id") === 1L)
      .select("session_idx", "n_events").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(out == Set((1, 2L), (2, 2L)),
      s"expected monotone session numbering across timeout, got $out")
  }

  test("stateful sessionizer agrees with the SQL sessionization on counts") {
    val typed = EventsStream.runSessions(spark, sf)
    val sql = Warehouse.q25_events_sessionize(spark, sf)
    assert(typed.count() == sql.count())
    val typedEvents = typed.agg(sum("n_events")).head().getLong(0)
    val sqlEvents = sql.agg(sum("n_events")).head().getLong(0)
    assert(typedEvents == sqlEvents)
  }
}
