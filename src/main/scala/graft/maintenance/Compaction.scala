package graft.maintenance

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{broadcast, col}

import graft.ops.Upsert

/** Small-file compaction (table maintenance the 100 TB posture requires:
  * incremental appends — the fact path writes one file set per run — decay
  * scan performance as row groups shrink; periodic compaction restores
  * them).
  *
  * Partitioned tables compact per partition via dynamic partition
  * overwrite (untouched partitions are never rewritten); unpartitioned
  * tables rewrite through the same write-temp-then-swap used by the dim
  * upsert, so readers never observe a half-compacted table.
  */
object Compaction {

  /** Rough bytes-per-file target → file count per partition. */
  def filesFor(partitionBytes: Long, targetFileBytes: Long): Int =
    math.max(1, math.ceil(partitionBytes.toDouble / targetFileBytes).toInt)

  /** Compact an unpartitioned parquet table to `numFiles` files. */
  def compactTable(spark: SparkSession, tablePath: String, numFiles: Int): Unit = {
    val df = spark.read.parquet(tablePath).repartition(numFiles)
      .localCheckpoint(true) // pin: the swap deletes the files being read
    Upsert.atomicReplace(spark, df, tablePath)
  }

  /** Compact only the named partitions of a dt-partitioned table, each to
    * `numFiles` files, leaving every other partition untouched on disk.
    */
  def compactPartitions(spark: SparkSession, tablePath: String,
                        partitionCol: String, partitions: Seq[String],
                        numFiles: Int): Unit = {
    val delta = spark.read
      .option("basePath", tablePath).parquet(tablePath)
      .filter(col(partitionCol).isin(partitions: _*))
      .repartition(numFiles)
      .localCheckpoint(true)
    Upsert.overwritePartitions(delta, tablePath, Seq(partitionCol))
  }

  /** Compact EVERY partition of a partition-column-keyed table to one
    * file each — the maintenance move the streaming-append indexes need
    * (frame/audio `ab` buckets, fuzzy-name `tb` buckets, IVF `list`
    * dirs): each micro-batch of an ingest stream appends one small file
    * per touched bucket, so a long-lived stream accretes thousands of
    * files per bucket and probe-time scheduling decays (round-11 review
    * finding). One shuffle keyed by the partition column lands each
    * bucket's rows in one task → one output file per bucket, written
    * through dynamic partition overwrite so the swap is per-partition,
    * with the rows pinned in memory first (the overwrite deletes the
    * very files being read).
    *
    * SINGLE-WRITER CONTRACT: a compaction must not race a concurrent
    * `foreachBatch` append into the same dir — dynamic overwrite
    * replaces each partition wholesale, so an append that commits
    * between this read and the overwrite would be silently erased. All
    * ingest streams here run `Trigger.AvailableNow` (drain-and-stop);
    * run compaction between drains, exactly like the other maintenance
    * passes ([[ZOrder]] rewrites, SkipIndex [[graft.maintenance.SkipIndex.write]]).
    * A continuously-triggered deployment must pause the stream for the
    * compaction window. Probe results, replay-guard recognition, and
    * sidecar metadata are all unchanged by compaction
    * (AssetStreamSpec-pinned); sidecars (`_FUZZY_META` etc.) live at the
    * root, which dynamic overwrite never deletes.
    */
  def compactPartitioned(spark: SparkSession, tablePath: String,
                         partitionCol: String): Unit = {
    val df = spark.read.parquet(tablePath)
      .repartition(col(partitionCol))
      .localCheckpoint(true)
    Upsert.overwritePartitions(df, tablePath, Seq(partitionCol))
    // Same-session readers hold a cached file listing for this path; the
    // overwrite just deleted every file it knew. Invalidate here so the
    // next plan re-lists instead of failing with FILE_NOT_EXIST.
    spark.catalog.refreshByPath(tablePath)
  }

  /** The shared bucket-delete algorithm behind
    * [[graft.ops.FuzzyJoin.deleteFromVariantIndex]] and
    * [[graft.multimodal.Multimodal.deleteFromAssetIndex]] (review
    * finding: three hand-rolled copies of a crash-ordering-sensitive
    * sequence; the IVF form keeps its own interleaved pass because it
    * also emits list_stats deltas): doomed keys → affected partitions
    * CONFIRMED from the index's own rows (optionally pre-pruned by
    * `candidates` when the caller derives them from trusted state, e.g.
    * a sidecar-recorded bucket count — never from caller guesswork) →
    * anti-join survivors, checkpointed BEFORE the dynamic overwrite
    * (which deletes the files being read) → emptied partition dirs
    * removed outright (dynamic overwrite alone would resurrect their
    * old rows). Single-writer, like every compaction here.
    */
  def deleteKeysFromBuckets(spark: SparkSession, dir: String,
                            partitionCol: String, keyCol: String,
                            doomedKeys: org.apache.spark.sql.DataFrame,
                            candidates: Option[Array[Int]] = None): Unit = {
    val doomed = doomedKeys.select(col(keyCol)).distinct().localCheckpoint()
    if (candidates.exists(_.isEmpty)) return
    val pre = candidates.fold(spark.read.parquet(dir))(cs =>
      spark.read.parquet(dir)
        .filter(col(partitionCol).isin(cs.map(Integer.valueOf).toIndexedSeq: _*)))
    val affected = pre
      .join(broadcast(doomed), Seq(keyCol), "left_semi")
      .select(col(partitionCol).cast("int").as(partitionCol))
      .distinct().collect().map(_.getInt(0))
    if (affected.isEmpty) return
    val remaining = spark.read.parquet(dir)
      .filter(col(partitionCol).isin(affected.map(Integer.valueOf).toIndexedSeq: _*))
      .join(broadcast(doomed), Seq(keyCol), "left_anti")
      .localCheckpoint()
    Upsert.overwritePartitions(remaining, dir, Seq(partitionCol))
    val kept = remaining.select(col(partitionCol).cast("int"))
      .distinct().collect().map(_.getInt(0)).toSet
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    affected.filterNot(kept).foreach { b =>
      fs.delete(
        new org.apache.hadoop.fs.Path(s"$dir/$partitionCol=$b"), true)
    }
  }

  /** File count for a table or partition dir (the signal a maintenance
    * scheduler watches). Goes through the path's Hadoop FileSystem so the
    * same scheduler logic works on file://, hdfs:// and s3a://.
    */
  def fileCount(spark: SparkSession, path: String): Int = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else {
      val it = fs.listFiles(p, true)
      var n = 0
      while (it.hasNext) {
        if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      }
      n
    }
  }
}
