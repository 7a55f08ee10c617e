package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructType}

import graft.ops.Flatten

/** Streaming twin of the medallion silver path (SURVEY.md §2.10 end-state):
  * the batch pipeline's bronze → normalize → flatten → dedup → fact flow as
  * ONE continuously-running Structured Streaming query. Spark's offset log
  * replaces the hand-rolled page checkpoint (T2), `withWatermark` replaces
  * the max-received_at fold (T3), and `dropDuplicatesWithinWatermark`
  * replaces the downstream event_key dedup (T5) — late re-deliveries inside
  * the watermark are absorbed exactly once.
  *
  * At cluster scale the same query runs with `Trigger.ProcessingTime`
  * against an object-store bronze prefix; `Trigger.AvailableNow` gives the
  * run-to-completion batch-incremental mode (T4) used in tests.
  */
object MedallionStream {

  private val pageSchema = new StructType()
    .add("payload", StringType)
    .add("media_id", StringType)
    .add("dt", StringType)

  /** Continuous silver refresh: returns the running query. Idempotent
    * across restarts via `checkpointDir` (offset log + dedup state).
    */
  def factEventsQuery(spark: SparkSession, bronzeDir: String, factDir: String,
                      checkpointDir: String,
                      watermarkDelay: String = "1 day",
                      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val reader = spark.readStream.schema(pageSchema)
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    val pages = reader
      .option("basePath", bronzeDir)
      .json(s"$bronzeDir/*/*") // media_id=/dt= partition dirs
      .select("payload")
    val flat = Flatten.factEvents(Flatten.normalizePages(pages))
    flat
      .withWatermark("received_at", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_key")
      .writeStream
      .format("parquet")
      .option("path", factDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Companion quarantine stream (T6 parity with the batch path): corrupt
    * pages must not vanish into the offset log — this query routes them to
    * the quarantine table under its OWN checkpoint, so both streams resume
    * independently.
    *
    * Deliberate trade-off: two queries re-read the bronze delta twice per
    * trigger. The single-pass alternative (one query + foreachBatch
    * splitting good/quarantine) cannot keep `dropDuplicatesWithinWatermark`
    * state, which lives in the streaming plan — we pay the second
    * sequential read of the trigger's delta files to keep exactly-once
    * dedup state and independent restartability.
    */
  def quarantineQuery(spark: SparkSession, bronzeDir: String,
                      quarantineDir: String,
                      checkpointDir: String): StreamingQuery = {
    val pages = spark.readStream.schema(pageSchema)
      .option("basePath", bronzeDir)
      .json(s"$bronzeDir/*/*")
      .select("payload")
    val (_, quarantined) = Flatten.normalizePagesWithQuarantine(pages)
    quarantined
      .writeStream
      .format("parquet")
      .option("path", quarantineDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Drain-to-completion helper for the batch-incremental mode: runs the
    * fact stream and the quarantine stream.
    */
  def runOnce(spark: SparkSession, bronzeDir: String, factDir: String,
              checkpointDir: String): DataFrame = {
    val q = factEventsQuery(spark, bronzeDir, factDir, checkpointDir)
    val qq = quarantineQuery(spark, bronzeDir, s"$checkpointDir-quarantine-out",
      s"$checkpointDir-quarantine")
    q.processAllAvailable(); q.stop()
    qq.processAllAvailable(); qq.stop()
    spark.read.parquet(factDir)
  }
}
