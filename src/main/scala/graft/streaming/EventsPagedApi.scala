package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.{PagedSource, PagedStream}

/** The WHOLE reference pipeline — paginated API pull → page normalize →
  * flatten → watermarked dedup → fact parquet (REF
  * glue_jobs/bronze/wistia_pull_wistia_api.py:109-232 →
  * glue_jobs/silver/wistia_transform_silver.py:29-67) — as ONE
  * oracle-checkable unit: a deterministic [[PagedStream.MediaPagedApi]]
  * whose feeds are the `events` table serialized into Wistia-shaped JSON
  * pages, drained end to end through the first-class DataSourceV2 source
  * by [[MedallionStream.factEventsFromApiQuery]].
  *
  * Why the feed content is built with a driver `collect()`: this object
  * plays the REMOTE API SERVER. In this architecture the API client is
  * the driver on purpose (auth, rate limits, and sessions live in one
  * place, exactly like the reference's single-process pull — see
  * [[graft.sources.PagedStream]]'s scaladoc), so every page payload
  * transits the driver REGARDLESS of who fabricates it; the collect
  * models the wire, not a distributed-compute shortcut. Feeds are paced
  * by the same per-trigger page budget as production, and the
  * data-proportional work (parse/flatten/dedup/sink) runs distributed
  * downstream of the source. Size the served slice like an API response
  * volume, not like a table scan.
  */
object EventsPagedApi {

  /** Deterministic multi-feed API over `events` rows: one feed per
    * `event_type` (the reference's one-feed-per-media shape), events
    * ordered by `event_id` within a feed, `pageSize` events per page,
    * each page a `{"data":[...]}` envelope declaring `total`/`per_page`
    * so [[PagedSource.isLastPage]] exercises the declared-total branch
    * (a feed whose size is an exact multiple of `pageSize` never ends
    * on a short page).
    *
    * Serialization is exact-round-trip by construction: `ts` formats to
    * micros ("yyyy-MM-dd HH:mm:ss.SSSSSS", UTC session) and re-parses
    * via `to_timestamp`'s default reader; `value` rides as a JSON
    * number (shortest-repr double, exact both ways).
    */
  def fromEvents(events: DataFrame, pageSize: Int)
      : PagedStream.MediaPagedApi = {
    require(pageSize > 0, s"fromEvents: pageSize must be positive, got $pageSize")
    // a null event_type has no feed to live in; silently dropping the
    // row would diverge from any oracle that keeps it — refuse loudly
    val rows = events.select(
      col("event_type").as("m"),
      col("event_id").as("id"),
      to_json(struct(
        col("event_id").cast("string").as("event_key"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
          .as("received_at"),
        col("value").cast("double").as("percent_viewed"),
        concat(lit("v"), col("user_id")).as("visitor_key"),
        col("event_type").as("media_id"),
        concat(lit("media-"), col("event_type")).as("media_name")))
        .as("j"))
      .collect() // the API-server stand-in: see object scaladoc
    require(!rows.exists(_.isNullAt(0)),
      "fromEvents: events with a NULL event_type have no feed — filter " +
        "them out explicitly (and from the oracle) before serving")
    val feeds: Map[String, (Vector[String], Vector[Long], Long)] =
      rows.groupBy(_.getString(0)).map { case (m, rs) =>
        val ordered = rs.sortBy(_.getLong(1)).map(_.getString(2)).toVector
        val pages = ordered.grouped(pageSize).map(es =>
          s"""{"data":[${es.mkString(",")}],""" +
            s""""total":${ordered.size},"per_page":$pageSize}""").toVector
        val sizes = ordered.grouped(pageSize).map(_.size.toLong).toVector
        (m, (pages, sizes, ordered.size.toLong))
      }
    new PagedStream.MediaPagedApi {
      def mediaIds: Seq[String] = feeds.keys.toSeq.sorted
      def fetch(media: String, page: Long): PagedSource.Page = {
        val (pages, sizes, total) = feeds(media)
        require(page >= 1 && page <= pages.size,
          s"fetch past the end: $media page $page of ${pages.size}")
        PagedSource.Page(pages((page - 1).toInt), sizes((page - 1).toInt),
          total = Some(total), perPage = Some(pageSize.toLong))
      }
    }
  }

  /** One full api→fact drain, returning the populated fact columns:
    * register the [[fromEvents]] feeds, run
    * [[MedallionStream.factEventsFromApiQuery]] under
    * `Trigger.AvailableNow` (the T4 batch-incremental mode — the source
    * drains to pagination completion and the query terminates itself),
    * read the fact back. The watermark delay is the BACKFILL setting —
    * effectively unbounded — because a drain replays history in feed
    * order, not event-time order: a steady-state "1 day" bar would
    * discard genuinely-old events that arrive in a later micro-batch
    * than a newer feed's pages. Dedup state is keyed by `event_key`,
    * bounded by the drained slice. Fact/checkpoint dirs are fresh per
    * call (a drain is one run of the reference job); the registry key is
    * derived from them so concurrent drains never collide.
    */
  def factsViaApi(spark: org.apache.spark.sql.SparkSession,
                  events: DataFrame, pageSize: Int = 50,
                  maxPagesPerTrigger: Int = 4): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-api-fact").toString
    val key = s"events-api-${new java.io.File(root).getName}"
    PagedStream.register(key, fromEvents(events, pageSize))
    try {
      val q = MedallionStream.factEventsFromApiQuery(spark, key,
        s"$root/fact", s"$root/cp", maxPagesPerTrigger,
        watermarkDelay = "36500 days",
        trigger = Some(Trigger.AvailableNow()))
      try require(q.awaitTermination(600000L),
        "factsViaApi: the AvailableNow drain did not terminate")
      // a timed-out (or otherwise failed) drain must not leave a zombie
      // query whose next trigger would hit the unregistered API with a
      // misleading "no MediaPagedApi registered" — stop it before the
      // finally below pulls the registration
      finally if (q.isActive) q.stop()
    } finally PagedStream.unregister(key)
    val factDir = s"$root/fact"
    // an empty served slice commits zero batches and never creates the
    // sink dir — that is an empty result, not a crash (the
    // runOnceSinglePass convention)
    if (graft.sources.Tables.pathExists(spark, factDir))
      spark.read.parquet(factDir).select(
        col("event_key"), col("received_at"), col("percent_viewed"),
        col("visitor_key"), col("media_id"), col("media_name"))
    else {
      import org.apache.spark.sql.types._
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField("event_key", StringType),
          StructField("received_at", TimestampType),
          StructField("percent_viewed", DoubleType),
          StructField("visitor_key", StringType),
          StructField("media_id", StringType),
          StructField("media_name", StringType))))
    }
  }
}
