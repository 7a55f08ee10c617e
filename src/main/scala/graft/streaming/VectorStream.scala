package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
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
}
