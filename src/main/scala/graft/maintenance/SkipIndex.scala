package graft.maintenance

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-file min/max manifest for PLANNING-TIME file skipping — the
  * driver-side complement to parquet's runtime row-group pruning, and
  * the piece that makes [[ZOrder]] layouts pay off at file-count scale:
  * row-group pruning still lists and SCHEDULES a task per file (each
  * task opens the footer just to discover it can skip everything);
  * with 100k+ files the scheduling itself is the cost. A manifest query
  * reads a kilobyte-scale table, prunes the file LIST on the driver,
  * and hands Spark only the overlapping files — the open-table-format
  * data-skipping statistics (Delta/Iceberg min-max) expressed over
  * plain parquet, no format migration, no reader cooperation.
  *
  * Correctness contract: the manifest pre-filter selects a SUPERSET of
  * matching files (closed-interval overlap), and [[scanRanges]] re-applies
  * the predicate to the rows — so a stale-but-superset manifest degrades
  * to reading more files, never to wrong results; a manifest missing
  * newly-appended files WOULD silently drop rows, which is why [[write]]
  * belongs at the same maintenance cadence as the layout rewrite it
  * describes ([[ZOrder.write]] / [[Compaction]]), not ad hoc.
  */
object SkipIndex {

  /** Write the manifest: one row per data file with min/max of each of
    * `cols` — one distributed scan, aggregated by `input_file_name()`
    * (partial+final, |files| × |cols| output rows).
    */
  def write(spark: SparkSession, tableDir: String, manifestDir: String,
            cols: Seq[String]): Unit = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(tableDir)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(manifestDir)
  }

  /** Scan `tableDir` reading ONLY the files whose manifest box overlaps
    * every closed range in `ranges` (col → (lo, hi)), then re-apply the
    * ranges as row filters. The manifest read + driver file list are
    * bounded by the file count — the same object the driver already
    * materializes to plan any scan.
    */
  def scanRanges(spark: SparkSession, tableDir: String, manifestDir: String,
                 ranges: Map[String, (Any, Any)]): DataFrame = {
    val manifest = spark.read.parquet(manifestDir)
    val keep = ranges.foldLeft(manifest) { case (df, (c, (lo, hi))) =>
      // overlap test on closed intervals; files with all-null stats for
      // the column (min/max null) cannot prove non-overlap — keep them
      df.filter(col(s"max_$c").isNull ||
        (col(s"max_$c") >= lit(lo) && col(s"min_$c") <= lit(hi)))
    }
    val files = keep.select(col("file")).collect().map(_.getString(0))
    val base =
      if (files.isEmpty) spark.read.parquet(tableDir).filter(lit(false))
      else spark.read.parquet(files.toSeq: _*)
    ranges.foldLeft(base) { case (df, (c, (lo, hi))) =>
      df.filter(col(c) >= lit(lo) && col(c) <= lit(hi))
    }
  }
}
