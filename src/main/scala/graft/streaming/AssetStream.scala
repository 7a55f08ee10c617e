package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.multimodal.Multimodal

/** Streaming twin of the multimodal near-dup pipeline — the third
  * instance of the "the index IS the dedup state" ingest shape (text:
  * [[CorpusStream]]; vectors: [[VectorStream]]; here: video frame
  * fingerprints). Frame batches land in `srcDir`; each micro-batch is
  * (1) replay-guarded against the persisted frame index, (2) internally
  * deduped (connected components over the batch's own near-dup pairs,
  * min-asset survivor — the [[graft.text.TextDedup.dedupClusters]]
  * machinery, pair generator swapped), (3) deduped against the indexed
  * corpus with corpus precedence, and the survivors' index rows append
  * into the index itself.
  *
  * Exactly-once without a state store, the [[VectorStream]] argument
  * re-keyed: `foreachBatch` is at-least-once, and every step is
  * idempotent against replay —
  *  - a re-delivered asset that SURVIVED last time is dropped whole by
  *    the [[Multimodal.indexedAssets]] guard (bucket-pruned: the check
  *    reads only the batch's own `ab` partition directories, never the
  *    index);
  *  - a re-delivered asset that LOST last time loses again to the same
  *    deterministic pipeline: its in-batch winner is either indexed now
  *    (the corpus-precedence probe drops it) or was itself dropped, in
  *    which case the component re-forms identically from the replayed
  *    batch (the pipeline is a pure function of (batch, index state),
  *    and a replayed trigger appends nothing, so index state is fixed).
  * State store rows: ZERO at any stream length — the bucket-partitioned
  * index directories are the state, bounded by the surviving corpus.
  *
  * Bootstrap with [[Multimodal.writeFrameIndex]] over the seed corpus
  * before starting the stream (same contract as VectorStream's index).
  * An asset's frames must arrive within ONE batch (the ingest contract
  * [[Multimodal.frameIndexRows]] documents — per-asset counts are
  * computed batch-locally).
  */
object AssetStream {

  /** The shared micro-batch gauntlet, parameterized by modality (the
    * in-batch pair generator and the delta-vs-index probe are the ONLY
    * things video and audio disagree on). Order matters, exactly as in
    * VectorStream: the replay guard first (a replayed batch must not
    * pay the pair step), internal dedup before the corpus probe (two
    * in-batch dups cost one probe) — keeping the idempotence-critical
    * ordering in ONE place instead of two hand-mirrored copies
    * (round-11 review finding).
    */
  private def dedupGauntlet(spark: SparkSession, rows: DataFrame,
                            indexDir: String, nBuckets: Int)
      (pairsOf: DataFrame => DataFrame)
      (probe: DataFrame => DataFrame): DataFrame = {
    val r = rows.localCheckpoint()
    val newRows = r
      .join(Multimodal.indexedAssets(spark, indexDir, r, nBuckets),
        Seq("asset_id"), "left_anti")
      .localCheckpoint()
    // in-batch near-dup: pairs → components → min-asset survivor (the
    // transitive chain a~b~c must keep ONE asset, not drop b twice and
    // keep both ends — the same argument as text/vector dedup)
    val losers = graft.text.TextDedup.dedupClusters(
        pairsOf(newRows)
          .select(col("asset_a").as("doc_a"), col("asset_b").as("doc_b")))
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as("asset_id"))
    val internal = newRows.join(losers, Seq("asset_id"), "left_anti")
    // corpus precedence: a batch asset near-dupping an indexed asset is
    // dropped (the index never loses to an arrival)
    val matched = probe(internal)
      .select(col("asset_b").as("asset_id")).distinct()
    internal.join(matched, Seq("asset_id"), "left_anti")
  }

  /** One frame micro-batch through the gauntlet; exposed for tests. */
  private[graft] def dedupBatch(spark: SparkSession, frames: DataFrame,
                                indexDir: String, minOverlap: Double,
                                maxAssetsPerHash: Int,
                                nBuckets: Int): DataFrame =
    dedupGauntlet(spark, Multimodal.frameIndexRows(frames), indexDir,
      nBuckets)(
      Multimodal.videoNearDup(_, minOverlap, maxAssetsPerHash))(
      Multimodal.videoNearDupAgainstIndex(
        Multimodal.readFrameIndex(spark, indexDir), _,
        minOverlap, maxAssetsPerHash))

  /** Start the ingestion stream: parquet frame batches in `srcDir` →
    * deduped index rows appended into `indexDir`. `Trigger.AvailableNow`
    * drains the backlog and stops (the batch-incremental mode every
    * other stream here uses); swap the trigger for continuous ingestion.
    */
  def ingestQuery(spark: SparkSession, srcDir: String, indexDir: String,
                  checkpointDir: String, schema: StructType,
                  minOverlap: Double = 0.5, maxAssetsPerHash: Int = 64,
                  nBuckets: Int = 64): StreamingQuery =
    spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val fresh = dedupBatch(spark, batch.toDF(), indexDir, minOverlap,
          maxAssetsPerHash, nBuckets)
        Multimodal.appendFrameIndex(fresh, indexDir, nBuckets)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** The audio micro-batch gauntlet: same three steps, scoring by
    * [[Multimodal.audioNearDup]]'s time-offset voting instead of frame
    * containment — a batch asset is a dup when some single alignment
    * accumulates `minVotes` matching windows (against the batch or
    * against the indexed corpus). The idempotence argument transfers
    * unchanged: guard first, deterministic pipeline, corpus precedence.
    */
  private[graft] def dedupAudioBatch(spark: SparkSession, windows: DataFrame,
                                     indexDir: String, minVotes: Int,
                                     maxAssetsPerFp: Int,
                                     nBuckets: Int): DataFrame =
    dedupGauntlet(spark, Multimodal.audioIndexRows(windows), indexDir,
      nBuckets)(
      Multimodal.audioNearDup(_, minVotes, maxAssetsPerFp))(
      Multimodal.audioNearDupAgainstIndex(
        Multimodal.readAudioIndex(spark, indexDir), _,
        minVotes, maxAssetsPerFp))

  /** Audio twin of [[ingestQuery]]: sub-fingerprint window batches →
    * deduped [[Multimodal.audioIndexRows]] appended into the
    * bucket-partitioned audio index.
    */
  def ingestAudioQuery(spark: SparkSession, srcDir: String, indexDir: String,
                       checkpointDir: String, schema: StructType,
                       minVotes: Int = 4, maxAssetsPerFp: Int = 64,
                       nBuckets: Int = 64): StreamingQuery =
    spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val fresh = dedupAudioBatch(spark, batch.toDF(), indexDir, minVotes,
          maxAssetsPerFp, nBuckets)
        Multimodal.appendAudioIndex(fresh, indexDir, nBuckets)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
