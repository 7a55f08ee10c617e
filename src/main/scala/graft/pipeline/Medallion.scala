package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.incr.Incremental
import graft.ops.{Agg, Dedup, Flatten, Upsert}
import graft.schema.Schemas
import graft.sources.{PagedSource, Tables}

/** The reference's full medallion lifecycle (SURVEY.md §3) as one composed
  * Spark pipeline — what EventBridge → Step Functions → Glue bronze → Glue
  * silver → Redshift procedures orchestrate across five AWS services
  * (REF docs/Architecture.PNG), collapsed into sequenced dataflows over a
  * table directory:
  *
  *   bronze:  paged pulls → partitioned JSON pages (media_id=/dt= layout)
  *   silver:  pages → normalize envelopes → flatten → dedup → fact_events;
  *            metadata → dim_media upsert (stage-wins)
  *   gold:    fact_events → daily engagement rollup → composite-key upsert
  *
  * Incremental semantics ride on [[Incremental]]'s watermark state table
  * (the reference's watermarks.json) + [[PagedSource.Checkpoint]] resume.
  */
object Medallion {

  final case class Layout(root: String) {
    val bronzeEvents = s"$root/bronze/events"
    val bronzeMeta = s"$root/bronze/metadata"
    val factEvents = s"$root/silver/fact_events"
    val dimMedia = s"$root/silver/dim_media"
    val dailyAgg = s"$root/gold/media_daily_agg"
    val state = s"$root/control/watermarks"
    val quarantine = s"$root/control/quarantine"
  }

  /** Bronze: persist one pull's page payloads under the reference's
    * media_id=/dt= partition layout (REF wistia_pull_wistia_api.py:117-129).
    */
  def writeBronzePages(spark: SparkSession, layout: Layout, mediaId: String,
                       dt: String, pull: PagedSource.PullResult): Unit = {
    import spark.implicits._
    pull.payloads.toDF("payload")
      .withColumn("media_id", lit(mediaId))
      .withColumn("dt", lit(dt))
      .write.mode("append").partitionBy("media_id", "dt")
      .json(layout.bronzeEvents)
  }

  /** Silver fact path (REF wistia_transform_silver.py:16-67): read bronze
    * pages, normalize the dynamic envelope, flatten to 19 columns, dedup by
    * event_key (deterministic, latest received_at wins), append new rows
    * only (idempotent via the event-time watermark).
    */
  def refreshFactEvents(spark: SparkSession, layout: Layout): DataFrame = {
    val pages = spark.read
      .schema(new org.apache.spark.sql.types.StructType()
        .add("payload", org.apache.spark.sql.types.StringType)
        .add("media_id", org.apache.spark.sql.types.StringType)
        .add("dt", org.apache.spark.sql.types.StringType))
      .option("basePath", layout.bronzeEvents)
      .json(layout.bronzeEvents)
      .select("payload")
    // T6: unparseable pages isolate into the quarantine table; the run
    // proceeds on everything else (the reference's per-media try/except,
    // REF wistia_pull_wistia_api.py:261-267, generalized to per-page).
    val (rows, quarantined) = Flatten.normalizePagesWithQuarantine(pages)
    quarantined.write.mode("append").parquet(layout.quarantine)
    val flat = Flatten.factEvents(rows)
    val deduped = Dedup.firstWins(flat, Seq("event_key"),
      Seq(col("received_at").desc, col("media_id").asc))
    // Write-then-advance: if the job dies between the two, the next run
    // re-delivers (at-least-once) and the event-key dedup absorbs it — the
    // reference makes the same choice by persisting its watermark file only
    // at the end of a successful run (REF wistia_pull_wistia_api.py:267).
    val pinned = Incremental.pinnedState(spark, layout.state)
    Incremental.newRows(deduped, pinned, "media_id", "received_at")
      .write.mode("append").parquet(layout.factEvents)
    Upsert.atomicReplace(spark,
      Incremental.advance(pinned, deduped, "media_id", "received_at"),
      layout.state)
    spark.read.parquet(layout.factEvents)
  }

  /** Silver dim path (REF wistia_transform_silver.py:71-112): metadata JSON
    * → dim projection → stage-wins upsert, atomically swapped (replaces the
    * Redshift staging table + sp_upsert_dim_media).
    */
  def refreshDimMedia(spark: SparkSession, layout: Layout,
                      metadataJsonPath: String): DataFrame = {
    val stage = Flatten.dimMedia(
      Tables.loadJson(spark, metadataJsonPath, Schemas.wistiaMediaRaw,
        multiLine = true))
    val targetExists = new java.io.File(layout.dimMedia).exists()
    val merged = if (targetExists) {
      Upsert.merge(spark.read.schema(Schemas.dimMedia).parquet(layout.dimMedia)
        .localCheckpoint(true), stage, Seq("media_id"))
    } else stage
    Upsert.atomicReplace(spark, merged, layout.dimMedia)
    spark.read.parquet(layout.dimMedia)
  }

  /** Gold: daily engagement rollup upserted on (media_id, dt) — the
    * declared-but-never-built job behind media_daily_agg_stage +
    * sp_upsert_media_daily_agg (REF wistia_redshift_schemas.py:43-52,
    * wistia_stored_procedures.py:49-85). Dynamic partition overwrite
    * rewrites only the days present in the refresh.
    */
  def refreshDailyAgg(spark: SparkSession, layout: Layout): DataFrame = {
    val fact = spark.read.schema(Schemas.factEvents).parquet(layout.factEvents)
    val daily = fact
      .groupBy(col("media_id"), to_date(col("received_at")).as("dt"))
      .agg(
        count(lit(1)).as("load_count"),
        count(when(col("percent_viewed") > 0.0, 1)).as("play_count"),
        sum(Agg.money(col("percent_viewed"))).cast("double").as("sum_viewed"),
        countDistinct(col("visitor_key")).as("visitors"))
      .select(col("media_id"), col("dt"), col("load_count"), col("play_count"),
        (col("play_count").cast("double") / col("load_count")).as("play_rate"),
        col("sum_viewed"), col("visitors"))
    Upsert.overwritePartitions(daily, layout.dailyAgg, Seq("dt"))
    spark.read.parquet(layout.dailyAgg)
  }
}
