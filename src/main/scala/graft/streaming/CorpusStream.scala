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
  * watermark applies. At 100 TB, bound the store by sharding the stream
  * on the hash prefix (state partitions by the dedup key already) and by
  * periodically compacting: rewrite the deduped corpus, restart the
  * stream fresh against the delta. When the dedup horizon IS
  * business-bounded, swap in `dropDuplicatesWithinWatermark` (the
  * [[MedallionStream]] pattern) to make state size proportional to the
  * horizon instead.
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

  /** Drain-to-completion helper (the batch-incremental mode). Returns an
    * empty frame when no batch ever committed (the sink only creates
    * `outDir` on its first write).
    */
  def runOnce(spark: SparkSession, srcDir: String, outDir: String,
              checkpointDir: String, schema: StructType)
      : org.apache.spark.sql.DataFrame = {
    val q = dedupStreamQuery(spark, srcDir, outDir, checkpointDir, schema)
    q.processAllAvailable(); q.stop()
    if (graft.sources.Tables.pathExists(spark, outDir))
      spark.read.parquet(outDir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      schema.add("text_hash", org.apache.spark.sql.types.StringType))
  }
}
