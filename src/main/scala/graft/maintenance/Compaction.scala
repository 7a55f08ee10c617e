package graft.maintenance

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

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
