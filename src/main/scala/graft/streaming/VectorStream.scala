package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.vector.Similarity

/** Streaming twin of the semantic dedup pipeline: continuous vector
  * ingestion against a LIVE [[Similarity.writeIvfIndex]] index. Vector
  * batches land in `srcDir`; each micro-batch is (1) replay-guarded, (2)
  * internally deduped, (3) deduped against the indexed corpus, and the
  * survivors are appended to the index itself — so the index is both the
  * dedup state and the output, exactly the role the at-rest fact table
  * plays in [[MedallionStream]]'s single-pass sink.
  *
  * Exactly-once without a state store: `foreachBatch` is at-least-once,
  * and all three steps are idempotent against replay —
  *  - a re-delivered vec_id is dropped by the [[Similarity.indexedIds]]
  *    guard (frozen centroids put it in the same list every time, so the
  *    check reads only the batch's own assignment lists, never the
  *    index);
  *  - a re-delivered near-dup (new id, old content) is dropped by the
  *    same corpus-precedence probe that drops first-time near-dups.
  * State size is therefore ZERO rows (no dropDuplicates state), at any
  * stream length — the index's list directories are the state, bounded
  * by the corpus itself.
  *
  * The index must exist before the stream starts (bootstrap with
  * [[Similarity.writeIvfIndex]] over a seed corpus — centroid quality
  * comes from the seed; [[Similarity.trainCentroids]] applies). Centroid
  * drift under sustained growth is the standard IVF trade: rebuild when
  * the appended volume dwarfs the seed, then restart the stream with a
  * fresh checkpoint (the replay guard makes the restart safe).
  */
object VectorStream {

  /** One micro-batch through the dedup gauntlet; exposed for tests.
    * Order matters: the replay guard runs FIRST so a replayed batch
    * contributes nothing to the (quadratic-in-batch) internal pair step;
    * internal dedup runs before the index probe so two in-batch dups
    * cost one probe, not two.
    */
  private[graft] def dedupBatch(spark: SparkSession, batch: DataFrame,
                                indexDir: String, threshold: Double,
                                nProbe: Int): DataFrame = {
    // the batch is consumed by three steps — pin it (micro-batch-sized)
    val b = batch.localCheckpoint()
    val newIds = b
      .join(Similarity.indexedIds(spark, indexDir, b), Seq("vec_id"), "left_anti")
      .localCheckpoint()
    // batch-internal dedup: exact all-pairs is CORRECT here because a
    // micro-batch is small by contract (the streaming analogue of the
    // daily-delta bound q83/q93 rely on)
    val internal = Similarity.semanticDedup(newIds,
      Similarity.nearDupPairsExact(newIds, threshold))
    Similarity.dedupDeltaAgainstIvfIndex(spark, indexDir, internal,
      threshold, nProbe)
  }

  /** Start the ingestion stream: parquet vector batches in `srcDir` →
    * deduped appends into `indexDir`. `Trigger.AvailableNow` drains the
    * backlog and stops (the batch-incremental mode every other stream
    * here uses); swap the trigger for continuous ingestion.
    */
  def ingestQuery(spark: SparkSession, srcDir: String, indexDir: String,
                  checkpointDir: String, schema: StructType,
                  threshold: Double, nProbe: Int = 4): StreamingQuery =
    spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val fresh = dedupBatch(spark, batch.toDF(), indexDir, threshold, nProbe)
        Similarity.appendIvfIndex(fresh, indexDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** One monitor row for an intake batch against the index:
    * (n_rows, n_ref_total, psi). The histogram is the q200 batch form
    * ([[Similarity.assignmentDriftAgainstIndex]] — one map-side
    * assignment pass over the batch + a stats-table join, the index
    * never scanned), checkpointed once so its three consumers (the two
    * sums and the PSI) never re-derive it. n_rows is the histogram's
    * own Σ n_cur (no separate count pass — the monitorRow discipline);
    * n_ref_total stamps WHICH corpus the batch was scored against, so
    * a reference that moved between batches (live ingest appends) or
    * between a run and its replay is observable in the series instead
    * of silently folded into the PSI.
    */
  private[graft] def driftMonitorRow(spark: SparkSession, batch: DataFrame,
                                     indexDir: String): DataFrame = {
    val h = Similarity.assignmentDriftAgainstIndex(spark, indexDir, batch)
      .localCheckpoint()
    val n = h.agg(coalesce(sum(col("n_cur")), lit(0L)).as("n_rows"),
      coalesce(sum(col("n_ref")), lit(0L)).as("n_ref_total"))
    graft.ops.Profile.psi(h).crossJoin(broadcast(n))
      .select(col("n_rows"), col("n_ref_total"), col("psi"))
  }

  /** The embedding-drift monitor stream — the vector modality's
    * [[DriftStream.monitorQuery]]: per micro-batch, one
    * (batch_id, n_rows, n_ref_total, psi) row scoring the intake
    * against the LIVE index's list_stats, into a batch_id-partitioned
    * sink through dynamic partition overwrite. Composes with
    * [[ingestQuery]] on the same index: the monitor reads only
    * centroids + stats, so it never contends with ingest's list
    * appends, and scoring intake against "what the retrieval corpus
    * looks like right now" is exactly the freshness production wants.
    * Replay converges bit-exactly when the index is quiescent across
    * the replay; under live ingest the n_ref_total column is the
    * staleness witness (same content ⇒ same reference, by contract of
    * list_stats growing monotonically with appends and shrinking only
    * through deletes).
    */
  def driftMonitorQuery(spark: SparkSession, srcDir: String,
                        indexDir: String, outDir: String,
                        checkpointDir: String,
                        schema: StructType): StreamingQuery =
    spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.ops.Upsert.overwritePartitions(
          driftMonitorRow(spark, batch.toDF(), indexDir)
            .withColumn("batch_id", lit(batchId)),
          outDir, Seq("batch_id"))
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
