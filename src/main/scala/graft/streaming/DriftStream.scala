package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.ops.Profile

/** Streaming PSI drift monitor — [[graft.ops.Profile.driftBuckets]] (q163)
  * run as a long-lived ingest-side gate instead of a batch report. The
  * north-star deployment: a training-data feed watches "did today's
  * intake stop looking like the curated reference" continuously, without
  * ever rescanning the reference.
  *
  * The REFERENCE DISTRIBUTION is persisted maintenance state (the
  * delta-index discipline applied to monitoring): [[writeDriftReference]]
  * stores the reference's bucket histogram as parquet next to a
  * `_DRIFT_META` sidecar carrying the monitored column, bucket count, and
  * the exact percentile edges (Double.toString round-trips bit-exactly).
  * A monitor batch then pays ONE map-side histogram of its own rows
  * (nBuckets−1 literal comparisons, strata-free aggregate) plus a
  * bucket-aligned join against the tiny stored histogram — reference cost
  * is zero per batch, which is what makes the monitor affordable on
  * every micro-batch at 100 TB.
  *
  * Replay contract (foreachBatch is at-least-once): each batch emits ONE
  * monitor row into a `batch_id=`-partitioned sink through dynamic
  * partition overwrite — a replayed batch overwrites its own partition
  * with identical content, so the monitor table converges (spec-pinned).
  * The PSI scalar itself is an ln-sum (engine-internal, the q163/q74
  * discipline); the oracle-checkable artifacts are the integer bucket
  * counts, exposed per-batch via [[driftBatch]].
  */
object DriftStream {

  private val MetaFile = "_DRIFT_META"

  /** Persist the reference histogram + edges for [[monitorQuery]].
    * Rows: (bucket, n_ref); sidecar: valueCol, nBuckets, then one edge
    * per line.
    */
  def writeDriftReference(ref: DataFrame, valueCol: String, dir: String,
                          nBuckets: Int = 10): Unit = {
    require(nBuckets >= 2, s"writeDriftReference: nBuckets >= 2, got $nBuckets")
    val spark = ref.sparkSession
    val edges = Profile.referenceEdges(ref, valueCol, nBuckets)
    Profile.bucketCounts(ref, valueCol, edges, "n_ref")
      .write.mode("overwrite").parquet(dir)
    val p = new org.apache.hadoop.fs.Path(dir, MetaFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(
      (s"$valueCol\n$nBuckets\n" + edges.map(_.toString).mkString("\n") +
        "\n").getBytes("UTF-8"))
    finally out.close()
  }

  private def readMeta(spark: SparkSession,
                       dir: String): (String, Int, Seq[Double]) = {
    val p = new org.apache.hadoop.fs.Path(dir, MetaFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"drift reference at $dir lacks $MetaFile — build it with " +
        "DriftStream.writeDriftReference")
    val in = fs.open(p)
    val lines =
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        "UTF-8").split("\n").map(_.trim).filter(_.nonEmpty)
      finally in.close()
    require(lines.length >= 2,
      s"drift reference at $dir is corrupt: sidecar has only " +
        s"${lines.length} line(s)")
    // fail with the contract's 'corrupt' diagnostic, not a raw
    // NumberFormatException, when the sidecar holds non-numeric content
    def num[T](s: String, parse: String => T, what: String): T =
      try parse(s) catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"drift reference at $dir is corrupt: non-numeric $what '$s'")
      }
    val (valueCol, nBuckets) = (lines(0), num(lines(1), _.toInt, "nBuckets"))
    val edges = lines.drop(2).map(num(_, _.toDouble, "edge")).toSeq
    require(edges.size == nBuckets - 1,
      s"drift reference at $dir is corrupt: ${edges.size} edges for " +
        s"$nBuckets buckets")
    (valueCol, nBuckets, edges)
  }

  /** One batch's aligned (bucket, n_ref, n_cur) counts against the
    * stored reference — the oracle-checkable integers. The batch must
    * carry the reference's monitored column (sidecar-validated).
    */
  private[graft] def driftBatch(spark: SparkSession, batch: DataFrame,
                                refDir: String): DataFrame = {
    val (valueCol, _, edges) = readMeta(spark, refDir)
    require(batch.columns.contains(valueCol),
      s"drift monitor: batch lacks the reference's monitored column " +
        s"'$valueCol' (batch columns: ${batch.columns.mkString(", ")})")
    Profile.joinBuckets(spark.read.parquet(refDir),
      Profile.bucketCounts(batch, valueCol, edges, "n_cur"))
  }

  /** One monitor row for a batch: (n_rows, psi). The batch is scanned
    * ONCE: every row lands in exactly one bucket (nulls in bucket 0), so
    * n_rows is the histogram's own Σ n_cur — no separate count pass,
    * which at "every micro-batch" cadence would double the monitor's
    * scan cost. The nBuckets-row histogram is checkpointed so its two
    * consumers (the sum and the PSI) never re-derive it from the batch.
    */
  private[graft] def monitorRow(spark: SparkSession, batch: DataFrame,
                                refDir: String): DataFrame = {
    val b = driftBatch(spark, batch, refDir).localCheckpoint()
    val n = b.agg(coalesce(sum(col("n_cur")), lit(0L)).as("n_rows"))
    Profile.psi(b).crossJoin(broadcast(n))
      .select(col("n_rows"), col("psi"))
  }

  /** The monitor stream: per micro-batch, one (batch_id, n_rows, psi)
    * row into `outDir`, partitioned by batch_id through dynamic
    * partition overwrite (replay overwrites the same partition with the
    * same content — idempotent). `Trigger.AvailableNow` drains what is
    * present and stops, the repo's batch-incremental streaming mode.
    */
  def monitorQuery(spark: SparkSession, srcDir: String, refDir: String,
                   outDir: String, checkpointDir: String,
                   schema: StructType): StreamingQuery =
    spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.Upsert.overwritePartitions(
          monitorRow(spark, batch, refDir)
            .withColumn("batch_id", lit(batchId)),
          outDir, Seq("batch_id"))
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
