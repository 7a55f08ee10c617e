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
}
