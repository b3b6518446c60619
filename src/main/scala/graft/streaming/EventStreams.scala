package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming builders for the S-queries (SURVEY.md §2.2 J/S).
  *
  * Each builder takes an unbounded `events` DataFrame (from `readStream` or
  * `MemoryStream`) and returns the transformed streaming frame; the caller
  * owns the sink. Final (complete) state equals the batch computation in
  * [[graft.operators.EventQueries]] — that equivalence is the oracle gate;
  * late/out-of-order behavior is covered by ScalaTest `MemoryStream` specs.
  */
object EventStreams {

  /** S1 — tumbling 1-hour windows per event_type with a 2-hour watermark. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(unix_micros(col("window.start")).as("ws"), col("event_type"),
              col("n"), col("sum_value"))

  /** S2 — sliding 1-hour window every 15 minutes. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("ws"), col("event_type"), col("n"))

  /** S3 — session windows per user with a 30-minute inactivity gap. */
  def sessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           min(col("ts")).as("t0"), max(col("ts")).as("t1"))
      .select(col("user_id"), unix_micros(col("t0")).as("session_start"),
              unix_micros(col("t1")).as("session_last"), col("n_events"))

  /** S5 — stateful streaming dedup on event_id within the watermark. */
  def dedup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Run a streaming frame to completion against a bounded source and return
    * the final result as a batch DataFrame (memory sink, complete mode).
    * This is how S4 executes a *real* streaming query inside the oracle gate.
    */
  def runToCompletion(spark: SparkSession, streaming: DataFrame,
                      name: String, mode: String = "complete"): DataFrame = {
    val q = streaming.writeStream
      .format("memory").queryName(name).outputMode(mode)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }
}
