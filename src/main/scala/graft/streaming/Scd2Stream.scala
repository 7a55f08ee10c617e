package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.ops.Upsert

/** Streaming SCD2 maintenance (the dimension-history twin of
  * [[MedallionStream]]'s fact path): change events stream in, and each
  * micro-batch folds into the persisted type-2 history via
  * [[Upsert.scd2ApplyChanges]] — per-trigger work proportional to the
  * batch's affected keys, never the dimension. The history table swaps
  * atomically per trigger ([[Upsert.atomicReplace]] — crash between
  * renames recovers on the next trigger), and interval boundaries are
  * replay-stable, so a restart that re-delivers a batch converges to the
  * same history (n_changes counts deliveries; dedup upstream for
  * exactly-once counts, see scd2ApplyChanges).
  *
  * [[scd2Query]] keeps NO raw log, so it inherits scd2ApplyChanges's
  * exactness bound: a late state-differing event landing strictly inside
  * a ≥3-change run refolds approximately (see [[Upsert.scd2LateConflicts]]
  * for detection). [[scd2ExactQuery]] additionally persists the raw change
  * log and refolds affected keys from real events — exact for every
  * late-event shape, at O(events) storage instead of O(runs).
  */
object Scd2Stream {

  def scd2Query(spark: SparkSession, srcDir: String, historyDir: String,
                checkpointDir: String, schema: StructType, key: String,
                stateCol: String, tsCol: String): StreamingQuery =
    spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val hist =
          if (graft.sources.Tables.pathExists(spark, historyDir))
            spark.read.parquet(historyDir)
          else {
            val empty = Upsert.scd2FromChanges(
              batch.limit(0), Seq(key), stateCol, tsCol)
            empty
          }
        val updated = Upsert.scd2ApplyChanges(hist, batch, key, stateCol, tsCol)
        Upsert.atomicReplace(spark, updated, historyDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Drain-to-completion helper (batch-incremental mode). */
  def runOnce(spark: SparkSession, srcDir: String, historyDir: String,
              checkpointDir: String, schema: StructType, key: String,
              stateCol: String, tsCol: String)
      : org.apache.spark.sql.DataFrame = {
    val q = scd2Query(spark, srcDir, historyDir, checkpointDir, schema,
      key, stateCol, tsCol)
    q.processAllAvailable(); q.stop()
    spark.read.parquet(historyDir)
  }

  /** Exact streaming SCD2: per trigger, affected keys refold from the
    * persisted raw change log via [[Upsert.scd2ApplyChangesExact]], then
    * the batch appends to the log. Crash orderings converge: history
    * written but log not ⇒ the redelivered batch recomputes the same
    * history; log written but checkpoint not ⇒ the redelivered batch is
    * double-counted in n_changes only (boundaries/states replay-stable —
    * same upstream-dedup contract as the lossless-free path).
    *
    * Scale: the log read is pruned to affected keys by the semi-join;
    * bucket/partition `rawLogDir` by the key for planning-time pruning at
    * real table sizes.
    */
  def scd2ExactQuery(spark: SparkSession, srcDir: String, historyDir: String,
                     rawLogDir: String, checkpointDir: String,
                     schema: StructType, key: String, stateCol: String,
                     tsCol: String): StreamingQuery =
    spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val hist =
          if (graft.sources.Tables.pathExists(spark, historyDir))
            spark.read.parquet(historyDir)
          else
            Upsert.scd2FromChanges(batch.limit(0), Seq(key), stateCol, tsCol)
        val log =
          if (graft.sources.Tables.pathExists(spark, rawLogDir))
            spark.read.parquet(rawLogDir)
          else batch.limit(0).select(key, stateCol, tsCol)
        val updated = Upsert.scd2ApplyChangesExact(
          hist, log, batch, key, stateCol, tsCol)
        Upsert.atomicReplace(spark, updated, historyDir)
        batch.select(key, stateCol, tsCol)
          .write.mode("append").parquet(rawLogDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Drain-to-completion helper for [[scd2ExactQuery]]. */
  def runOnceExact(spark: SparkSession, srcDir: String, historyDir: String,
                   rawLogDir: String, checkpointDir: String,
                   schema: StructType, key: String, stateCol: String,
                   tsCol: String): org.apache.spark.sql.DataFrame = {
    val q = scd2ExactQuery(spark, srcDir, historyDir, rawLogDir,
      checkpointDir, schema, key, stateCol, tsCol)
    q.processAllAvailable(); q.stop()
    spark.read.parquet(historyDir)
  }
}
