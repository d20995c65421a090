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

  /** Pinned on-disk schema of events.parquet (ts: nanos-as-long). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),          // TIMESTAMP(NANOS) read as long
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming source over the events parquet file(s). */
  def source(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(rawSchema)
      // the file source wants a directory; select just the events table
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Watermarked tumbling-window aggregation: hourly event counts/values
    * per type. Late data beyond 2 hours is dropped by the watermark —
    * bounded state at 100 TB/day event volumes. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(money(col("value"))).cast(DoubleType).as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"),
              col("n_events"), col("total_value"))

  /** Run the streaming query to completion against the (static) test
    * parquet via the memory sink; returns the materialized result. */
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

  // ------------------------------------------- incremental aggregate fact
  /** foreachBatch incremental materialization: each micro-batch appends its
    * partial hourly aggregates tagged with the batch id; readers merge
    * partials by summing (counts/sums compose associatively). Without a
    * transactional table format this append-then-merge is the idempotent
    * pattern — a replayed batch id is dropped at read time. At scale the
    * partials are tiny (one row per window×type per batch) and a periodic
    * compaction folds them. */
  def runIncrementalHourly(spark: SparkSession, dir: String, outDir: String): Unit = {
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
  case class Ev(user_id: Long, tsMicros: Long, value: Double)
  case class SessionOut(user_id: Long, session_idx: Int, n_events: Long,
                        start_us: Long, end_us: Long, total_value: Double)
  private case class SessState(idx: Int, lastUs: Long, n: Long,
                               startUs: Long, sumValue: Double)

  private val GapUs: Long = 30L * 60 * 1000000

  /** flatMapGroupsWithState sessionizer: 30-min inactivity gap closes a
    * session (the streaming twin of Warehouse.q25_events_sessionize).
    * Each invocation sorts its batch's events and folds them through the
    * per-user state, emitting closed sessions; the open session stays in
    * state across micro-batches. */
  def sessionize(events: Dataset[Ev]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[Ev], state: GroupState[SessState]) =>
          val evs = it.toSeq.sortBy(e => (e.tsMicros, e.value))
          var st = state.getOption.orNull
          val closed = scala.collection.mutable.ArrayBuffer[SessionOut]()
          evs.foreach { e =>
            st match {
              case null =>
                st = SessState(1, e.tsMicros, 1, e.tsMicros, e.value)
              case s if e.tsMicros - s.lastUs > GapUs =>
                closed += SessionOut(user, s.idx, s.n, s.startUs, s.lastUs, s.sumValue)
                st = SessState(s.idx + 1, e.tsMicros, 1, e.tsMicros, e.value)
              case s =>
                st = s.copy(lastUs = e.tsMicros, n = s.n + 1, sumValue = s.sumValue + e.value)
            }
          }
          if (st != null) state.update(st)
          closed.iterator
      }
  }

  /** Drive the stateful sessionizer over the static events parquet and
    * return closed + still-open sessions (open sessions are flushed from
    * state by a final pass so the batch total matches). */
  def runSessions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val evs = graft.Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("tsMicros"), col("value"))
      .as[Ev]
    // batch mode: one "micro-batch" holds everything; emit open sessions too
    import org.apache.spark.sql.Encoders
    evs.groupByKey(_.user_id)
      .flatMapGroups { (user: Long, it: Iterator[Ev]) =>
        val evsSorted = it.toSeq.sortBy(e => (e.tsMicros, e.value))
        val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
        var st: SessState = null
        evsSorted.foreach { e =>
          st match {
            case null => st = SessState(1, e.tsMicros, 1, e.tsMicros, e.value)
            case s if e.tsMicros - s.lastUs > GapUs =>
              out += SessionOut(user, s.idx, s.n, s.startUs, s.lastUs, s.sumValue)
              st = SessState(s.idx + 1, e.tsMicros, 1, e.tsMicros, e.value)
            case s =>
              st = s.copy(lastUs = e.tsMicros, n = s.n + 1, sumValue = s.sumValue + e.value)
          }
        }
        if (st != null)
          out += SessionOut(user, st.idx, st.n, st.startUs, st.lastUs, st.sumValue)
        out.iterator
      }(Encoders.product[SessionOut])
      .toDF()
  }
}
