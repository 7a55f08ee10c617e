package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.maintenance.ZOrder
import graft.sources.Tables

/** Z-order clustering: layout invariance (same rows back) and the point
  * of the exercise — a two-column predicate skips most row groups on the
  * z-ordered layout and cannot on the append-order layout.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Rows the parquet scan EMITS (after pushed-filter row-group pruning,
    * before Spark's post-scan Filter) — the direct measure of skipping.
    */
  private def scanRows(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "expected a parquet scan in the plan")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("interleave: bit i of column j lands at position i*n+j") {
    val d = Seq((3L, 1L)).toDF("a", "b")
    // a=0b11, b=0b01 -> z = a0<<0 | b0<<1 | a1<<2 | b1<<3 = 1 | 2 | 4 | 0 = 7
    val z = d.select(ZOrder.interleave(Seq(col("a"), col("b")), 2)).as[Long].head()
    assert(z == 7L)
  }

  test("z-ordered read-back is the same table, and 2-D predicates skip row groups") {
    val events = Tables.load(spark, "/root/testdata/sf0.01", "events")
    val plainDir = tmp("graft-z-plain")
    val zDir = tmp("graft-z-ordered")
    // append-order baseline: the ingest layout (event_id order), same
    // file count so the comparison is purely about clustering
    events.repartitionByRange(16, col("event_id"))
      .sortWithinPartitions(col("event_id"))
      .write.mode("overwrite").parquet(plainDir)
    ZOrder.write(events, zDir, Seq("user_id", "ts"), numFiles = 16)

    // layout invariance: identical multiset of rows
    val back = spark.read.parquet(zDir)
    assert(back.count() == events.count())
    assert(back.exceptAll(events).isEmpty &&
      events.exceptAll(back).isEmpty,
      "z-ordered table must contain exactly the original rows")

    // ~1% 2-D slice: 10 of 150 users × 5 of 30 days
    def slice(df: DataFrame) = df.filter(
      col("user_id").between(10, 19) &&
        col("ts").between(lit("2024-01-10").cast("timestamp"),
          lit("2024-01-15").cast("timestamp")))
    val expected = slice(events).count()
    assert(expected > 0, "predicate must select something")
    assert(slice(back).count() == expected)
    val zScan = scanRows(slice(spark.read.parquet(zDir)))
    val plainScan = scanRows(slice(spark.read.parquet(plainDir)))
    // Curve-granularity bound: 16 files = a 4×4 (user × ts) grid, and the
    // ~1.3% query rectangle overlaps exactly 2 quadrants — the z layout
    // must hit that bound (2/16 of the table). The append-order baseline
    // prunes ts only (event_id correlates with ingest time; user_id is
    // unpruned in every file), so z must also strictly beat it.
    assert(zScan <= events.count() / 8,
      s"z-order must read only the overlapping curve quadrants: " +
        s"z=$zScan of ${events.count()}")
    assert(zScan < plainScan,
      s"z-order must beat single-dimension clustering: z=$zScan plain=$plainScan")
  }

  test("skip-index manifest prunes the file list at planning time") {
    val events = Tables.load(spark, "/root/testdata/sf0.01", "events")
    val zDir = tmp("graft-skip-z")
    val mDir = tmp("graft-skip-m")
    ZOrder.write(events, zDir, Seq("user_id", "ts"), numFiles = 16)
    graft.maintenance.SkipIndex.write(spark, zDir, mDir, Seq("user_id", "ts"))
    assert(spark.read.parquet(mDir).count() == 16, "one manifest row per file")

    val ranges = Map[String, (Any, Any)](
      "user_id" -> (10L, 19L),
      "ts" -> (java.sql.Timestamp.valueOf("2024-01-10 00:00:00"),
        java.sql.Timestamp.valueOf("2024-01-15 00:00:00")))
    val out = graft.maintenance.SkipIndex.scanRanges(spark, zDir, mDir, ranges)
    // identical rows to the full-table filter...
    val expected = events.filter(
      col("user_id").between(10, 19) &&
        col("ts").between(lit("2024-01-10").cast("timestamp"),
          lit("2024-01-15").cast("timestamp")))
    assert(out.count() == expected.count() && expected.count() > 0)
    assert(out.exceptAll(expected).isEmpty && expected.exceptAll(out).isEmpty)
    // ...from at most the 2 curve quadrants the rectangle can overlap
    // (exact count varies with sampled range boundaries — 1 when every
    // matching row landed one side of a quadrant boundary)
    val filesRead = out.select(input_file_name()).distinct().count()
    assert(filesRead <= 2,
      s"manifest must hand the scan only the overlapping files, got $filesRead")

    // degenerate ranges: no overlap -> empty result, no error
    val none = graft.maintenance.SkipIndex.scanRanges(spark, zDir, mDir,
      Map("user_id" -> (10000L, 20000L)))
    assert(none.count() == 0)
    // full range -> the whole table back
    val all = graft.maintenance.SkipIndex.scanRanges(spark, zDir, mDir,
      Map("user_id" -> (0L, 10000L)))
    assert(all.count() == events.count())
  }

  test("manifest append indexes only new files and equals a full rebuild") {
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val dir = tmp("graft-skip-append")
    val tDir = s"$dir/table"
    val mDir = s"$dir/manifest"
    val old = events.filter(col("user_id") % 2 === 0)
    val fresh = events.filter(col("user_id") % 2 === 1)
    old.repartition(4).write.parquet(tDir)
    graft.maintenance.SkipIndex.write(spark, tDir, mDir, Seq("user_id"))
    assert(spark.read.parquet(mDir).count() == 4)
    // nothing new -> no-op
    assert(graft.maintenance.SkipIndex.append(
      spark, tDir, mDir, Seq("user_id")) == 0)
    // grow the table; append must index exactly the new files
    fresh.repartition(3).write.mode("append").parquet(tDir)
    assert(graft.maintenance.SkipIndex.append(
      spark, tDir, mDir, Seq("user_id")) == 3)
    val appended = spark.read.parquet(mDir)
    assert(appended.count() == 7)
    // row-set parity with a full rebuild over the grown table
    val m2 = s"$dir/manifest_full"
    graft.maintenance.SkipIndex.write(spark, tDir, m2, Seq("user_id"))
    val full = spark.read.parquet(m2)
    assert(appended.exceptAll(full).isEmpty && full.exceptAll(appended).isEmpty)
    // and scanRanges answers identically through the appended manifest
    val viaAppend = graft.maintenance.SkipIndex.scanRanges(
      spark, tDir, mDir, Map("user_id" -> (3L, 9L)))
    val expected = events.filter(col("user_id").between(3, 9))
    assert(viaAppend.count() == expected.count() && expected.count() > 0)
  }

  test("zero-row part files get manifest rows and append still converges") {
    // An empty part file has no input_file_name() group, so an inner-join
    // manifest would drop it and append() would re-scan it as "fresh" on
    // every maintenance run, never reaching the no-op fixed point.
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val dir = tmp("graft-skip-empty")
    val tDir = s"$dir/table"
    val mDir = s"$dir/manifest"
    events.filter(col("user_id") < 10).repartition(2).write.parquet(tDir)
    // a zero-row data file with the table schema
    events.limit(0).repartition(1).write.mode("append").parquet(tDir)
    val nFiles = new java.io.File(tDir).listFiles()
      .count(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.endsWith(".crc"))
    graft.maintenance.SkipIndex.write(spark, tDir, mDir, Seq("user_id"))
    val manifest = spark.read.parquet(mDir)
    assert(manifest.count() == nFiles,
      s"every listed data file needs a manifest row: ${manifest.count()} vs $nFiles")
    assert(manifest.filter(col("min_user_id").isNull).count() >= 1,
      "the zero-row file's stats are null (always-read)")
    // converged: nothing is fresh, including the empty file
    assert(graft.maintenance.SkipIndex.append(
      spark, tDir, mDir, Seq("user_id")) == 0)
    // and the scan still answers correctly through the null-stats row
    val out = graft.maintenance.SkipIndex.scanRanges(
      spark, tDir, mDir, Map("user_id" -> (0L, 5L)))
    val expect = events.filter(col("user_id") < 10 &&
      col("user_id").between(0, 5))
    assert(out.count() == expect.count() && expect.count() > 0)
  }

  test("manifest IS the file index: 10⁵-file manifest plans without touching pruned files") {
    // A 100k-row manifest in which all but 2 entries point at files that
    // DO NOT EXIST. If planning listed the table dir, stat'ed pruned
    // files, or re-listed a collected path array, the phantom paths would
    // throw FileNotFoundException — completing the scan at all proves
    // pruned files are never touched by any filesystem call, and the
    // driver holds only the surviving FileStatus set.
    val dir = tmp("graft-skip-big")
    val mDir = s"$dir/manifest"
    Seq((1L, 12L)).toDF("event_id", "user_id")
      .coalesce(1).write.parquet(s"$dir/real1")
    Seq((2L, 15L)).toDF("event_id", "user_id")
      .coalesce(1).write.parquet(s"$dir/real2")
    val realStats = Seq("real1", "real2").map { d =>
      val f = new java.io.File(s"$dir/$d").listFiles()
        .filter(f => f.getName.startsWith("part-")).head
      (f.toURI.toString, f.length())
    }
    val phantoms = spark.range(99998).select(
      concat(lit("file:/nonexistent/graft-skip/part-"), col("id"),
        lit(".parquet")).as("file"),
      (col("id") % 100 + 1000L).as("min_user_id"),
      (col("id") % 100 + 1001L).as("max_user_id"),
      lit(1024L).as("bytes"))
    val real = realStats.zipWithIndex.map { case ((uri, len), i) =>
      (uri, 12L + 3 * i, 12L + 3 * i, len)
    }.toDF("file", "min_user_id", "max_user_id", "bytes")
    phantoms.union(real).write.parquet(mDir)
    val schema = spark.read.parquet(s"$dir/real1").schema
    java.nio.file.Files.write(
      java.nio.file.Paths.get(mDir, "_schema.json"),
      schema.json.getBytes("UTF-8"))

    val out = graft.maintenance.SkipIndex.scanRanges(
      spark, s"$dir/real*", mDir, Map("user_id" -> ((10L, 20L))))
    assert(out.select($"event_id").as[Long].collect().toSet == Set(1L, 2L))
    // the planned scan holds exactly the 2 surviving files
    val scans = out.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.map(_.relation.location.inputFiles.length).sum == 2,
      "file index must contain only the manifest-surviving files")
  }

  test("zValue: null and constant columns quantize without error") {
    val d = Seq((1L, Option(5L)), (2L, None), (3L, Option(5L)))
      .toDF("a", "b")
    val zs = d.select(ZOrder.zValue(d, Seq("a", "b"), 8).as("z"))
      .as[Long].collect()
    assert(zs.length == 3 && zs.forall(_ >= 0L))
  }
}
