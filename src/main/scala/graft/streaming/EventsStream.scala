package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.schema.Schemas

/** Structured-Streaming twin of the events path (SURVEY.md §2.10: T3, T5,
  * T7, T8). The reference implements watermarks, checkpoints, and daily
  * windows by hand over a batch loop; Structured Streaming owns all of that
  * state natively — `withWatermark` is T3, the checkpointLocation offset log
  * is T2, `dropDuplicatesWithinWatermark` is T5, tumbling `window` is T7,
  * `session_window` is T8.
  */
object EventsStream {

  /** Streaming read of an events-shaped parquet directory. Same nanos→micros
    * conversion as the batch loader (Tables.load) — and the same session
    * requirement: `spark.sql.legacy.parquet.nanosAsLong=true` must be set
    * at session build time (see graft.GraftSession); asserted here so
    * external callers get an actionable error.
    */
  def readEvents(spark: SparkSession, dir: String,
                 globFilter: String = "events.parquet"): DataFrame = {
    require(
      spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
        .contains("true"),
      "EventsStream.readEvents requires " +
        "spark.sql.legacy.parquet.nanosAsLong=true on the SparkSession " +
        "builder (see graft.GraftSession)")
    val rawSchema = StructType(Schemas.events.fields.map {
      case StructField("ts", _, n, m) => StructField("ts", LongType, n, m)
      case f => f
    })
    spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", globFilter)
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** T7: tumbling daily engagement counts with a 1-day watermark.
    * `approx_count_distinct` keeps per-window state mergeable and bounded —
    * exact distinct in streaming state grows with cardinality.
    */
  def dailyCounts(events: DataFrame, watermarkDelay: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("load_count"),
        approx_count_distinct(col("user_id")).as("visitors_approx"))
      .select(col("window.start").as("ws"), col("event_type"),
        col("load_count"), col("visitors_approx"))

  /** T8: per-user session windows with a 30-minute inactivity gap. */
  def sessions(events: DataFrame, gap: String = "30 minutes",
               watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))

  /** T5: keyed dedup bounded by the watermark — the streaming analog of the
    * silver job's dropDuplicates(event_key).
    */
  def dedupWithinWatermark(events: DataFrame,
                           watermarkDelay: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")
}
