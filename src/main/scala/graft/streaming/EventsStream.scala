package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
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

  /** Quantile state as a continuously maintained table (the q98 pattern
    * fed by a stream): each micro-batch appends its OWN per-(key, day)
    * partial histograms to `stateDir`; because bucket-count merge is
    * exactly lossless, [[graft.ops.Agg.histQuantile]] over the
    * accumulated rows answers any percentile identically to one batch
    * pass over all events, no matter how the stream was chopped into
    * micro-batches (StreamingSpec asserts the equality). State growth is
    * one row per (key, day, batch) — compact away with a periodic
    * re-aggregation if batch cadence is high; estimates are unaffected
    * at any compaction granularity, merge being lossless.
    *
    * Exactly-once: foreachBatch is at-least-once, and a replayed partial
    * histogram would DOUBLE-COUNT its events — so a batch whose
    * `batch_id` already exists in the state is skipped (one pushed-down
    * probe of the state table per trigger; same recognition pattern as
    * MedallionStream's quarantine sink). `stateDir` is therefore owned
    * by one checkpoint lineage: batch ids restart at 0 under a fresh
    * checkpoint, so never point a new checkpoint at old state.
    */
  def histStateQuery(spark: SparkSession, events: DataFrame,
                     stateDir: String, checkpointDir: String,
                     width: Double = 1.0): StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val replay = graft.sources.Tables.pathExists(spark, stateDir) &&
          !spark.read.parquet(stateDir)
            .filter(col("batch_id") === batchId).isEmpty
        if (!replay)
          graft.ops.Agg.dailyValueHist(batch, width)
            .withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(stateDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
