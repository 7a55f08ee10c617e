package graft.sources

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The [[PagedSource]] control algebra packaged as a FIRST-CLASS
  * Structured Streaming source (DataSourceV2 micro-batch): the
  * reference's bronze pull (REF glue_jobs/bronze/wistia_pull_wistia_api
  * .py:109-232) drivable with `spark.readStream.format(...)`, where
  * Spark's own offset log replaces the hand-rolled control file and the
  * offset IS the reference's checkpoint — `(media, next page)` per
  * media, plus the running `received_at` high-water mark.
  *
  * Semantics carried over 1:1 from [[PagedSource]] (same `pull`, same
  * last-page algebra, same budgets):
  *  - per-trigger page budget (`maxPagesPerTrigger`, T4) and time budget
  *    (`timeBudgetMillis`) bound each micro-batch's admission;
  *  - a media whose pagination is exhausted (short page / total covered)
  *    is COMPLETE and never re-fetched for the stream's lifetime — one
  *    stream models one drain, exactly like one run of the reference
  *    job; the scheduled re-pull with a `received_at` floor stays the
  *    incremental layer's job ([[graft.incr.Incremental]]);
  *  - media listed by the API after the stream started are admitted
  *    from page 1 (the reference re-lists media every run).
  *
  * Exactly-once: `latestOffset` (driver side, admission-controlled)
  * runs the bounded pull and CACHES the fetched payloads keyed by
  * `(media, start page)`; `planInputPartitions` embeds them in the
  * partitions, and a post-crash replay of a planned-but-uncommitted
  * range re-fetches exactly that page range — deterministic because the
  * offset pins both endpoints. `commit` drops cache entries the batch
  * made durable. The API client lives ONLY on the driver (auth, rate
  * limits, sessions stay in one place, as in the reference's
  * single-process pull); executors parse the payloads. The pull is
  * control-plane-sized — budgets apply PER MEDIA per trigger (each
  * incomplete media runs its own bounded [[PagedSource.pull]], the
  * reference's per-feed loop), so one trigger moves up to
  * `incomplete media × maxPagesPerTrigger × page size` through the
  * driver: size `maxPagesPerTrigger` to the media count, or shard the
  * media list across queries, when feeds number in the thousands. The
  * data-proportional work (flatten/dedup/sink) is distributed
  * downstream.
  *
  * Wiring: implementations register an in-JVM [[MediaPagedApi]] under a
  * key (`PagedStream.register`) named by the `apiRegistry` option — the
  * MemoryStream pattern; a production HTTP connector registers its
  * authenticated client at session start (HTTP itself stays a non-goal,
  * SURVEY.md §7).
  */
object PagedStream {
  /** Multi-feed paged API: the reference pulls one feed per media id. */
  trait MediaPagedApi {
    def mediaIds: Seq[String]
    def fetch(media: String, page: Long): PagedSource.Page
  }

  val schema: StructType = new StructType()
    .add("media_id", StringType)
    .add("page", LongType)
    .add("payload", StringType)

  private val registry = new ConcurrentHashMap[String, MediaPagedApi]()

  def register(key: String, api: MediaPagedApi): Unit = registry.put(key, api)
  def unregister(key: String): Unit = registry.remove(key)

  private[sources] def lookup(key: String): MediaPagedApi = {
    val api = registry.get(key)
    require(api != null,
      s"PagedStream: no MediaPagedApi registered under '$key' — call " +
        "PagedStream.register(key, api) before starting the query")
    api
  }

  /** Per-media cursor: next page to fetch, completion, `received_at`
    * high-water mark (the reference checkpoint's two fields, kept per
    * media).
    */
  final case class MediaCursor(nextPage: Long = 1L, complete: Boolean = false,
                               hw: Option[String] = None)

  /** The stream offset: every known media's cursor. JSON is
    * key-sorted so offset equality (which Spark derives from the JSON)
    * is representation-independent.
    */
  final case class PagedOffsets(media: Map[String, MediaCursor])
      extends Offset {
    override def json(): String = {
      import org.json4s.JsonDSL._
      import org.json4s.jackson.JsonMethods
      val fields = media.toSeq.sortBy(_._1).map { case (m, c) =>
        m -> (("next" -> c.nextPage) ~ ("complete" -> c.complete) ~
          ("hw" -> c.hw))
      }
      JsonMethods.compact(JsonMethods.render(
        org.json4s.JObject(fields.toList)))
    }
  }

  private[sources] def parseOffsets(json: String): PagedOffsets = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmt: Formats = DefaultFormats
    val JObject(fields) = JsonMethods.parse(json): @unchecked
    PagedOffsets(fields.map { case JField(m, v) =>
      m -> MediaCursor((v \ "next").extract[Long],
        (v \ "complete").extract[Boolean],
        (v \ "hw").extractOpt[String])
    }.toMap)
  }
}

/** `format("graft.sources.PagedStreamProvider")` entry point. Options:
  * `apiRegistry` (required — key passed to [[PagedStream.register]]),
  * `maxPagesPerTrigger` (default 10), `timeBudgetMillis` (default
  * unbounded), `defaultPerPage` (default 100, the reference's
  * per_page).
  */
class PagedStreamProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedStream.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new PagedStreamTable(new CaseInsensitiveStringMap(properties))
}

private[sources] class PagedStreamTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String =
    s"paged(${options.get("apiRegistry")})"
  override def schema(): StructType = PagedStream.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = PagedStream.schema
        override def toMicroBatchStream(checkpointLocation: String)
            : MicroBatchStream =
          new PagedMicroBatchStream(options)
      }
    }
}

private[sources] class PagedMicroBatchStream(options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {
  import PagedStream._

  /** `Trigger.AvailableNow` drains to PAGINATION COMPLETION: the bounded
    * pull advances each media until its last page, after which
    * [[latestOffset(start:*]] stops moving and the query terminates —
    * Spark's run-until-no-new-offset loop is exactly the drain
    * semantics, so there is nothing to snapshot here. (A feed that
    * grows new pages DURING the drain extends the run — the feed is
    * finite at every probe, so termination holds.) Without this marker
    * Spark would wrap the source and capture a single budget-capped
    * offset up front, stopping after one micro-batch's pages.
    */
  override def prepareForTriggerAvailableNow(): Unit = ()

  private val apiKey = {
    val k = options.get("apiRegistry")
    require(k != null, "PagedStream: option 'apiRegistry' is required")
    k
  }
  private def api: MediaPagedApi = lookup(apiKey)
  private val maxPages =
    Option(options.get("maxPagesPerTrigger")).map(_.toLong).getOrElse(10L)
  private val timeBudget =
    Option(options.get("timeBudgetMillis")).map(_.toLong)
      .getOrElse(Long.MaxValue / 4)
  private val defaultPerPage =
    Option(options.get("defaultPerPage")).map(_.toLong).getOrElse(100L)
  // Driver-side fetch concurrency ACROSS media (round 20, guide §2.6 —
  // overlap independent work): each media's bounded pull is independent
  // (own cursor, own budgets, results keyed by (media, page)), so
  // pulling feeds one after another serialized the whole trigger's
  // admission on round-trip latency × feed count. A bounded pool pulls
  // up to `fetchParallelism` feeds at once; per-media pull semantics,
  // budgets, and the exactly-once cache contract are UNCHANGED, and
  // failures surface in deterministic media order (futures are awaited
  // in the same sorted order the sequential loop used). 1 restores the
  // sequential loop.
  private val fetchParallelism =
    Option(options.get("fetchParallelism")).map(_.toInt).getOrElse(4)

  // payloads fetched by latestOffset, pending commit: (media, startPage)
  private val cache =
    new ConcurrentHashMap[(String, Long), Seq[String]]()

  private def adapter(media: String): PagedSource.PagedApi =
    new PagedSource.PagedApi {
      def fetch(page: Long): PagedSource.Page = api.fetch(media, page)
    }

  override def initialOffset(): Offset =
    PagedOffsets(api.mediaIds.map(_ -> MediaCursor()).toMap)

  override def deserializeOffset(json: String): Offset = parseOffsets(json)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[PagedOffsets]
    // re-list media every trigger: late-listed media start at page 1
    val cursors = (s.media.keySet ++ api.mediaIds).toSeq.map(m =>
      m -> s.media.getOrElse(m, MediaCursor()))
    def pullOne(m: String, c: MediaCursor): (String, MediaCursor) = {
      val res = PagedSource.pull(adapter(m),
        PagedSource.Checkpoint(c.nextPage, c.hw),
        maxPages, timeBudget, defaultPerPage)
      cache.put((m, c.nextPage), res.payloads)
      m -> MediaCursor(c.nextPage + res.payloads.size, res.complete,
        res.checkpoint.lastReceivedAt)
    }
    val (done, todo) = cursors.partition(_._2.complete)
    val pulled =
      if (todo.sizeIs <= 1 || fetchParallelism <= 1)
        todo.map { case (m, c) => pullOne(m, c) }
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(fetchParallelism, todo.size))
        try {
          val futs = todo.map { case (m, c) =>
            pool.submit(new java.util.concurrent.Callable[(String, MediaCursor)] {
              override def call(): (String, MediaCursor) = pullOne(m, c)
            })
          }
          // await in submission (media) order and UNWRAP the executor's
          // ExecutionException so callers keep seeing the transport
          // taxonomy (TransportFailure / HttpStatusFailure), exactly as
          // the sequential loop threw it
          try futs.map { f =>
            try f.get()
            catch {
              case e: java.util.concurrent.ExecutionException =>
                throw e.getCause
            }
          } catch {
            case t: Throwable =>
              // a failed pull must not leave sibling fetches running into
              // a restarted query (double-fetching the remote API):
              // cancel queued AND in-flight work before rethrowing — the
              // ConcurrentHashMap keeps any already-completed cache.put
              // safe, interrupted pulls simply re-run from their cursor
              futs.foreach(_.cancel(true))
              pool.shutdownNow()
              throw t
          }
        } finally pool.shutdown()
      }
    PagedOffsets((done ++ pulled).toMap)
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "PagedStream is admission-controlled; Spark calls latestOffset(start, limit)")

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val s = start.asInstanceOf[PagedOffsets]
    val e = end.asInstanceOf[PagedOffsets]
    e.media.toSeq.sortBy(_._1).flatMap { case (m, ec) =>
      val startPage = s.media.get(m).map(_.nextPage).getOrElse(1L)
      val n = ec.nextPage - startPage
      if (n <= 0) None
      else {
        // served from the latestOffset cache; a post-crash replay of a
        // planned-but-uncommitted range re-fetches exactly [startPage,
        // startPage + n) — the offset pins the range, so the replay is
        // deterministic page-for-page
        val payloads = Option(cache.get((m, startPage))).getOrElse(
          (0L until n).map(i => api.fetch(m, startPage + i).payload))
        Some(PagedInputPartition(m, startPage, payloads.toArray))
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory

  override def commit(end: Offset): Unit = {
    val e = end.asInstanceOf[PagedOffsets]
    cache.keySet().asScala.toSeq.foreach { case key @ (m, startPage) =>
      if (e.media.get(m).exists(_.nextPage > startPage)) cache.remove(key)
    }
  }

  override def stop(): Unit = cache.clear()
}

private[sources] final case class PagedInputPartition(
    media: String, startPage: Long, payloads: Array[String])
  extends InputPartition

private[sources] class PagedReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PagedInputPartition]
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < p.payloads.length }
      override def get(): InternalRow =
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(p.media),
          p.startPage + i,
          UTF8String.fromString(p.payloads(i))))
      override def close(): Unit = ()
    }
  }
}
