package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming twin of [[graft.text.TextDedup.exactDedup]] for continuous
  * corpus ingestion: document batches land in `srcDir`, exact duplicates
  * (by md5 of the text) are dropped ACROSS the whole stream — including
  * across restarts, via the state store under `checkpointDir` — and first
  * occurrences append to `outDir`.
  *
  * State is one 32-char hash per distinct text, kept indefinitely: a
  * duplicate document is a duplicate regardless of arrival time, so no
  * watermark applies. At 100 TB, bound the store by periodically
  * compacting — [[compact]] snapshots the deduped corpus, then
  * [[dedupStreamQueryAfterCompaction]] restarts the stream with EMPTY
  * state (fresh checkpoint): pre-compaction history is consulted through
  * a stateless stream-static anti-join against the snapshot, so the
  * state store only ever holds hashes that arrived since the last
  * compaction. When the dedup horizon IS business-bounded, swap in
  * `dropDuplicatesWithinWatermark` (the [[MedallionStream]] pattern) to
  * make state size proportional to the horizon instead.
  */
object CorpusStream {

  def dedupStreamQuery(spark: SparkSession, srcDir: String, outDir: String,
                       checkpointDir: String, schema: StructType)
      : StreamingQuery =
    spark.readStream.schema(schema).parquet(srcDir)
      .withColumn("text_hash", md5(col("text")))
      .dropDuplicates("text_hash")
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Compaction entry point (the state bound): snapshot the stream's
    * deduped output into `compactedDir` as the new authoritative corpus.
    * The re-dedup on text_hash makes the snapshot idempotent — safe to
    * run against an output that a crashed sink double-wrote.
    *
    * After this, retire the old stream (its checkpoint included) and
    * start [[dedupStreamQueryAfterCompaction]] with a FRESH checkpoint
    * and a fresh delta output dir. The full corpus is then
    * `compactedDir` ∪ delta, and the live state store is bounded by
    * arrivals-since-compaction, not corpus history.
    */
  def compact(spark: SparkSession, dedupedOutDir: String,
              compactedDir: String): Unit =
    spark.read.parquet(dedupedOutDir)
      .dropDuplicates("text_hash")
      .write.mode("overwrite").parquet(compactedDir)

  /** Post-compaction stream: dedup state starts EMPTY (point
    * `checkpointDir` somewhere fresh). History lives in the compacted
    * snapshot and is applied as a stream-static LEFT ANTI join — a
    * stateless per-micro-batch hash join (broadcast or shuffled by size),
    * never rows in the state store. The anti-join sits BELOW
    * dropDuplicates so replayed pre-compaction documents don't even
    * enter the state: state size is exactly the distinct-new-text count
    * since compaction. First occurrences of genuinely new texts append
    * to `deltaOutDir` (NOT the old output — the snapshot already holds
    * pre-compaction survivors, and the corpus is snapshot ∪ delta).
    */
  def dedupStreamQueryAfterCompaction(spark: SparkSession, srcDir: String,
                                      deltaOutDir: String,
                                      checkpointDir: String,
                                      schema: StructType,
                                      compactedDir: String): StreamingQuery = {
    val seen = spark.read.parquet(compactedDir).select(col("text_hash"))
    spark.readStream.schema(schema).parquet(srcDir)
      .withColumn("text_hash", md5(col("text")))
      .join(seen, Seq("text_hash"), "left_anti")
      .dropDuplicates("text_hash")
      .writeStream
      .format("parquet")
      .option("path", deltaOutDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming passage cleaning: every arriving document batch scrubbed
    * against the persisted boilerplate hotlist
    * ([[graft.text.Corpus.writeHotlist]]) before it lands — the streaming
    * twin of [[graft.text.Corpus.scrubAgainstHotlist]], via
    * `foreachBatch` (the scrub's per-doc range aggregation and 1:1 join
    * are batch relational ops, not streaming-plan operators). The
    * hotlist is state built on the maintenance cadence, so each trigger
    * is one delta scan + a broadcast probe; exactly-once lands on the
    * checkpoint's batch replay being deterministic (same batch → same
    * scrub — spans depend only on the frozen hotlist) plus idempotent
    * appends keyed by doc_id downstream if the sink is ever swapped for
    * one without a commit log.
    */
  def scrubStreamQuery(spark: SparkSession, srcDir: String, outDir: String,
                       checkpointDir: String, schema: StructType,
                       hotlistDir: String, n: Int = 3): StreamingQuery =
    spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.text.Corpus.scrubAgainstHotlist(spark, hotlistDir, batch, n)
          .write.mode("append").parquet(outDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** One novelty-gate micro-batch; exposed for tests. Admits the docs
    * whose novel-shingle share clears `tauNum/tauDen` against the
    * at-rest shingle index (`n_novel · tauDen ≥ n_shingles · tauNum` —
    * integer cross-multiply, no float in the decision; a doc with no
    * shingles is rejected: nothing new by definition). Returns the
    * admitted rows of `batch`.
    */
  private[graft] def noveltyGateBatch(spark: SparkSession,
                                      batch: org.apache.spark.sql.DataFrame,
                                      indexDir: String, tauNum: Int,
                                      tauDen: Int)
      : org.apache.spark.sql.DataFrame = {
    val admittedIds = graft.text.Corpus
      .noveltyAgainstIndex(spark, indexDir, batch)
      .filter(col("n_novel") * tauDen >= col("n_shingles") * tauNum)
      .select(col("doc_id"))
    batch.join(admittedIds, Seq("doc_id"), "left_semi")
  }

  /** Streaming novelty gate — the ingest twin of q161's delta-vs-index
    * novelty (the sixth "index IS the state" stream: text dedup, vector,
    * frame, audio, name, now shingle-NOVELTY). Each document batch
    * scores against the persisted shingle index; docs whose novel share
    * clears the gate are ADMITTED and their shingles append through the
    * overlap-safe [[graft.text.Corpus.appendShingleIndex]] — a rejected
    * re-crawl spends nothing, an admitted doc immediately raises the bar
    * for the next arrival of its own content.
    *
    * Replay contract (foreachBatch is at-least-once): the only side
    * effect is the index, and the anti-join append is a structural no-op
    * for already-indexed hashes — a replayed batch converges the index
    * to the same hash set (CorpusStreamSpec's novelty legs pin replay
    * and fresh-checkpoint idempotence). The gate DECISION on a replayed
    * batch is not stable (its own first pass indexed the shingles), so
    * this stream deliberately has no admitted-docs sink; consumers that
    * need the admitted rows should gate in their own foreachBatch via
    * [[noveltyGateBatch]] BEFORE appending, inside one idempotent write.
    * Bootstrap with [[graft.text.Corpus.writeShingleIndex]].
    */
  def noveltyGateQuery(spark: SparkSession, srcDir: String,
                       indexDir: String, checkpointDir: String,
                       schema: StructType, tauNum: Int = 1,
                       tauDen: Int = 2): StreamingQuery =
    spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.text.Corpus.appendShingleIndex(spark, indexDir,
          noveltyGateBatch(spark, batch, indexDir, tauNum, tauDen))
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Drain-to-completion helper (the batch-incremental mode). Returns an
    * empty frame when no batch ever committed (the sink only creates
    * `outDir` on its first write).
    */
  def runOnce(spark: SparkSession, srcDir: String, outDir: String,
              checkpointDir: String, schema: StructType)
      : org.apache.spark.sql.DataFrame = {
    val q = dedupStreamQuery(spark, srcDir, outDir, checkpointDir, schema)
    drain(spark, q, outDir, schema)
  }

  /** [[runOnce]] for the post-compaction stream. */
  def runOnceAfterCompaction(spark: SparkSession, srcDir: String,
                             deltaOutDir: String, checkpointDir: String,
                             schema: StructType, compactedDir: String)
      : org.apache.spark.sql.DataFrame = {
    val q = dedupStreamQueryAfterCompaction(spark, srcDir, deltaOutDir,
      checkpointDir, schema, compactedDir)
    drain(spark, q, deltaOutDir, schema)
  }

  private def drain(spark: SparkSession, q: StreamingQuery, outDir: String,
                    schema: StructType): org.apache.spark.sql.DataFrame = {
    q.processAllAvailable(); q.stop()
    if (graft.sources.Tables.pathExists(spark, outDir))
      spark.read.parquet(outDir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      schema.add("text_hash", org.apache.spark.sql.types.StringType))
  }
}
