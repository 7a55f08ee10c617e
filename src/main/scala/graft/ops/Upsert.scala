package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Upsert / merge / maintenance operators (SURVEY.md §2.9: U0–U4).
  *
  * The reference merges via a Redshift staging table + stored procedure:
  * DELETE target rows matching stage keys, INSERT all stage rows, TRUNCATE
  * stage (REF redshift/seed_data/wistia_stored_procedures.py:3-42,49-85;
  * driver wiring wistia_transform_silver.py:93-107). In-engine that whole
  * dance is one deterministic dataflow: anti-join + union — stage wins on
  * key collision, exactly the delete+insert semantics.
  */
object Upsert {

  /** U1/U1b: delete+insert merge, stage-wins. `keys` may be composite
    * (`media_id` for dim_media, `(media_id, dt)` for the daily agg).
    *
    * Scale note: both sides shuffle on `keys` for the anti-join; when the
    * stage is an incremental delta (the common case) Catalyst broadcasts it
    * and the target is never shuffled at all — the 100 TB-friendly plan.
    */
  def merge(target: DataFrame, stage: DataFrame, keys: Seq[String]): DataFrame =
    target.join(stage, keys, "left_anti").unionByName(stage)

  /** U1b at rest: merge a delta into a dt-partitioned parquet table by
    * rewriting ONLY the partitions the delta touches
    * (`partitionOverwriteMode=dynamic`) — the Spark-idiomatic form of the
    * composite-key upsert: untouched partitions are never read or written.
    * The caller's delta must contain full replacement content for each
    * touched partition (e.g. the re-aggregated days).
    */
  def overwritePartitions(delta: DataFrame, tablePath: String,
                          partitionCols: Seq[String]): Unit =
    delta.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(tablePath)

  /** Resolve the Hadoop FileSystem of a path's scheme — file://, hdfs://,
    * s3a://, … all go through the same API; `java.io`/`java.nio` would
    * silently see nothing on anything but the local disk.
    */
  private def fsOf(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def renameOrThrow(fs: FileSystem, from: Path, to: Path): Unit =
    if (!fs.rename(from, to))
      throw new java.io.IOException(s"rename failed: $from -> $to")

  /** U1 at rest for unpartitioned dim tables: write-temp-then-swap, through
    * the path's Hadoop FileSystem so the same code runs on file://, hdfs://
    * and s3a://. Readers never observe a HALF-WRITTEN table, but there is an
    * unavoidable instant between the two renames where the canonical path is
    * absent — a true transaction needs a table format (MERGE INTO) or a
    * catalog pointer swap. A crash in that instant leaves the previous
    * content at `<path>.old`, which the next call (or [[recoverIfNeeded]])
    * restores instead of deleting.
    *
    * Scheme caveat: HDFS rename is an atomic namenode op; S3A rename is a
    * copy+delete (O(data), not atomic) — on object stores prefer the
    * partitioned form ([[overwritePartitions]]) or a manifest-pointer
    * layout; this swap remains CORRECT there (crash ⇒ recoverable `.old`),
    * just not instantaneous.
    */
  def atomicReplace(spark: SparkSession, merged: DataFrame, tablePath: String): Unit = {
    recoverIfNeeded(spark, tablePath)
    val tmp = tablePath + ".tmp-" + java.util.UUID.randomUUID().toString.take(8)
    merged.write.mode("overwrite").parquet(tmp)
    val (fs, target) = fsOf(spark, tablePath)
    if (fs.exists(target)) {
      val trash = new Path(tablePath + ".old")
      fs.delete(trash, true)
      renameOrThrow(fs, target, trash)
      renameOrThrow(fs, new Path(tmp), target)
      fs.delete(trash, true)
    } else {
      renameOrThrow(fs, new Path(tmp), target)
    }
  }

  /** Crash recovery: if a previous swap died between its two renames, the
    * canonical path is missing and `.old` holds the only copy — restore it
    * rather than letting the next swap's cleanup destroy it.
    */
  def recoverIfNeeded(spark: SparkSession, tablePath: String): Unit = {
    val (fs, target) = fsOf(spark, tablePath)
    val trash = new Path(tablePath + ".old")
    if (!fs.exists(target) && fs.exists(trash)) {
      renameOrThrow(fs, trash, target)
    }
  }

  /** U4: idempotent table bootstrap — create empty parquet table with the
    * given schema if absent (CREATE TABLE IF NOT EXISTS analog).
    */
  def createIfNotExists(spark: SparkSession, tablePath: String,
                        schema: org.apache.spark.sql.types.StructType): Unit = {
    val (fs, target) = fsOf(spark, tablePath)
    if (!fs.exists(target)) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .write.parquet(tablePath)
    }
  }
}
