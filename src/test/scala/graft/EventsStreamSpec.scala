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

  test("stateful sessionizer agrees with the SQL sessionization on counts") {
    val typed = EventsStream.runSessions(spark, sf)
    val sql = Warehouse.q25_events_sessionize(spark, sf)
    assert(typed.count() == sql.count())
    val typedEvents = typed.agg(sum("n_events")).head().getLong(0)
    val sqlEvents = sql.agg(sum("n_events")).head().getLong(0)
    assert(typedEvents == sqlEvents)
  }
}
