package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Structured Streaming twins of the `graft.operators.EventOps` batch
  * queries (SURVEY §2.10 T4). The reference has no streaming — these are
  * north-star extensions: the same logical shapes as the batch operators,
  * expressed so one function serves both execution modes (`window` /
  * `session_window` evaluate identically over batch DataFrames and
  * streaming sources; the watermark only takes effect when the input is a
  * stream).
  *
  * Usage (streaming): `spark.readStream...` → `hourlyAgg(df)` →
  * `writeStream.outputMode("append")` once the watermark closes windows.
  * Usage (batch): `hourlyAgg(Tables.events(spark, dir))` — verified
  * equivalent to the batch EventOps results in StreamingSpec.
  *
  * Scale: both are single-shuffle keyed aggregations; state size is
  * bounded by the watermark horizon (2h of hourly windows / open sessions
  * per user), so a 1000-executor cluster holds state proportional to the
  * key cardinality, not the stream length.
  */
object EventStreams {

  /** Hourly windowed counts + decimal-exact value sums — the streaming twin
    * of EventOps.qWindowHourly (same decimal accumulation so results are
    * order/trigger independent). */
  def hourlyAgg(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast(DoubleType).as("sum_value"))
      .select(col("win.start").as("hour_ts"), col("event_type"), col("n"), col("sum_value"))

  /** Gap-based sessions via `session_window` (30-min gap, matching
    * EventOps.qSessionize's GapUs): one row per (user, session) with its
    * bounds and event count. Batch qSessionize numbers sessions per user;
    * this emits the session intervals themselves — the two agree on
    * session membership (asserted in StreamingSpec). */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes",
      watermarkDelay: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap).as("sess"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sess.start").as("session_start"),
        col("sess.end").as("session_end"), col("n_events"))
}
