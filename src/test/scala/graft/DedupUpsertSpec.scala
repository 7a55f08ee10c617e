package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.{Dedup, Upsert}

/** A1/W1 dedup + U1/U1b upsert semantics (REF wistia_transform_silver.py:54;
  * wistia_stored_procedures.py:3-42,49-85).
  */
class DedupUpsertSpec extends SparkSpec {
  import spark.implicits._

  test("firstWins keeps exactly the earliest row per key (W1 determinism)") {
    val df = Seq(
      ("k1", "2025-01-02T00:00:00Z", "late"),
      ("k1", "2025-01-01T00:00:00Z", "early"),
      ("k2", "2025-01-01T00:00:00Z", "only")
    ).toDF("event_key", "received_at", "tag")
    val out = Dedup.firstWins(df, Seq("event_key"), Seq(col("received_at").asc))
    assert(out.count() == 2)
    val k1 = out.filter($"event_key" === "k1").collect().head
    assert(k1.getAs[String]("tag") == "early")
  }

  test("firstWins is idempotent") {
    val df = Seq(("a", 2), ("a", 1), ("b", 3), ("b", 3)).toDF("k", "v")
    val once = Dedup.firstWins(df, Seq("k"), Seq(col("v").asc))
    val twice = Dedup.firstWins(once, Seq("k"), Seq(col("v").asc))
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("firstWinsViaMin equals the window form for all-ascending orders") {
    val df = Seq(
      ("k1", 2, "b"), ("k1", 1, "a"), ("k1", 1, "z"), ("k2", 5, "x"))
      .toDF("k", "n", "s")
    val win = Dedup.firstWins(df, Seq("k"), Seq(col("n").asc, col("s").asc))
      .as[(String, Int, String)].collect().toSet
    val agg = Dedup.firstWinsViaMin(df, Seq("k"), Seq("n", "s"))
      .as[(String, Int, String)].collect().toSet
    assert(agg == win)
    assert(agg == Set(("k1", 1, "a"), ("k2", 5, "x")))
  }

  test("arbitrary dedup keeps one row per key (A1 parity)") {
    val df = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("k", "v")
    assert(Dedup.arbitrary(df, Seq("k")).count() == 2)
  }

  test("merge is stage-wins on collision and appends new keys (U1)") {
    val target = Seq(("m1", "old"), ("m2", "keep")).toDF("media_id", "name")
    val stage = Seq(("m1", "new"), ("m3", "add")).toDF("media_id", "name")
    val out = Upsert.merge(target, stage, Seq("media_id"))
      .as[(String, String)].collect().toMap
    assert(out == Map("m1" -> "new", "m2" -> "keep", "m3" -> "add"))
  }

  test("merge on composite key (U1b)") {
    val target = Seq(("m1", "2025-01-01", 10L), ("m1", "2025-01-02", 20L)).toDF("media_id", "dt", "n")
    val stage = Seq(("m1", "2025-01-02", 99L)).toDF("media_id", "dt", "n")
    val out = Upsert.merge(target, stage, Seq("media_id", "dt"))
      .as[(String, String, Long)].collect().toSet
    assert(out == Set(("m1", "2025-01-01", 10L), ("m1", "2025-01-02", 99L)))
  }

  test("merge behaves as right-biased map union (property, 20 seeded cases)") {
    val kv = Gen.listOf(Gen.zip(Gen.choose(0, 20), Gen.choose(0, 1000)))
    for (i <- 0 until 20) {
      // distinct keys per side, mirroring a keyed table
      val tm = kv.apply(Gen.Parameters.default, Seed(i * 2L)).getOrElse(Nil).toMap
      val sm = kv.apply(Gen.Parameters.default, Seed(i * 2L + 1)).getOrElse(Nil).toMap
      val target = tm.toSeq.toDF("k", "v")
      val stage = sm.toSeq.toDF("k", "v")
      val got = Upsert.merge(target, stage, Seq("k"))
        .as[(Int, Int)].collect().toMap
      assert(got == tm ++ sm, s"seed pair $i")
    }
  }

  test("merge is idempotent: re-applying the same stage changes nothing") {
    val target = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val stage = Seq((2, "B"), (3, "c")).toDF("k", "v")
    val once = Upsert.merge(target, stage, Seq("k"))
    val twice = Upsert.merge(once, stage, Seq("k"))
    assert(once.as[(Int, String)].collect().toSet ==
      twice.as[(Int, String)].collect().toSet)
  }

  test("atomicReplace swaps table content atomically (U1 at rest)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-upsert").toString
    val table = s"$dir/dim"
    Seq((1, "a")).toDF("k", "v").write.parquet(table)
    val merged = Seq((1, "A"), (2, "b")).toDF("k", "v")
    Upsert.atomicReplace(spark, merged, table)
    val out = spark.read.parquet(table).as[(Int, String)].collect().toSet
    assert(out == Set((1, "A"), (2, "b")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(table + ".old")))
  }

  test("atomicReplace runs through the Hadoop FileSystem of the path's scheme") {
    // Explicit file:// URI — java.nio would reject it as a path; the swap
    // must resolve the scheme's FileSystem and rename through it.
    val dir = "file://" +
      java.nio.file.Files.createTempDirectory("graft-fs-swap").toString
    val table = s"$dir/dim"
    Seq((1, "a")).toDF("k", "v").write.parquet(table)
    Upsert.atomicReplace(spark, Seq((1, "A"), (2, "b")).toDF("k", "v"), table)
    assert(spark.read.parquet(table).as[(Int, String)].collect().toSet ==
      Set((1, "A"), (2, "b")))
    val p = new org.apache.hadoop.fs.Path(table + ".old")
    assert(!p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
  }

  test("recoverIfNeeded restores a table stranded at .old by a mid-swap crash") {
    val dir = "file://" +
      java.nio.file.Files.createTempDirectory("graft-fs-recover").toString
    val table = s"$dir/dim"
    Seq((7, "x")).toDF("k", "v").write.parquet(table)
    // Simulate the crash window: canonical renamed away, replacement never
    // landed.
    val p = new org.apache.hadoop.fs.Path(table)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(p, new org.apache.hadoop.fs.Path(table + ".old")))
    Upsert.recoverIfNeeded(spark, table)
    assert(spark.read.parquet(table).as[(Int, String)].collect().toSet ==
      Set((7, "x")))
    // And the next atomicReplace must also self-recover from that state.
    assert(fs.rename(p, new org.apache.hadoop.fs.Path(table + ".old")))
    Upsert.atomicReplace(spark, Seq((8, "y")).toDF("k", "v"), table)
    assert(spark.read.parquet(table).as[(Int, String)].collect().toSet ==
      Set((8, "y")))
  }

  test("createIfNotExists bootstraps once and is idempotent (U4)") {
    val dir = "file://" +
      java.nio.file.Files.createTempDirectory("graft-fs-create").toString
    val table = s"$dir/state"
    val schema = graft.incr.Incremental.stateSchema
    Upsert.createIfNotExists(spark, table, schema)
    assert(spark.read.schema(schema).parquet(table).count() == 0)
    // Second call must not fail or truncate existing content.
    Seq(("s1", java.sql.Timestamp.valueOf("2025-01-01 00:00:00")))
      .toDF("source_key", "high_water").write.mode("append").parquet(table)
    Upsert.createIfNotExists(spark, table, schema)
    assert(spark.read.schema(schema).parquet(table).count() == 1)
  }

  test("overwritePartitions rewrites only touched partitions (U1b at rest)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dpo").toString
    val table = s"$dir/daily"
    Seq(("2025-01-01", 1L), ("2025-01-02", 2L)).toDF("dt", "n")
      .write.partitionBy("dt").parquet(table)
    Upsert.overwritePartitions(
      Seq(("2025-01-02", 99L)).toDF("dt", "n"), table, Seq("dt"))
    val out = spark.read.parquet(table).as[(Long, String)].collect()
      .map { case (n, dt) => (dt, n) }.toSet
    assert(out == Set(("2025-01-01", 1L), ("2025-01-02", 99L)))
  }

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  test("scd2FromChanges: runs collapse, versions chain, open tail (U1 type-2)") {
    // user 1: A A B A — four events, three versions; user 2: one event
    val changes = Seq(
      (1L, "A", ts("2025-01-01 00:00:00"), 1L),
      (1L, "A", ts("2025-01-02 00:00:00"), 2L),
      (1L, "B", ts("2025-01-03 00:00:00"), 3L),
      (1L, "A", ts("2025-01-04 00:00:00"), 4L),
      (2L, "X", ts("2025-01-01 00:00:00"), 5L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val out = Upsert.scd2FromChanges(changes, Seq("user_id"), "event_type",
      "ts", tieCols = Seq("event_id"))
      .as[(Long, Long, String, java.sql.Timestamp, Long, java.sql.Timestamp,
        Option[java.sql.Timestamp], Int)].collect().toSet
    assert(out == Set(
      (1L, 1L, "A", ts("2025-01-01 00:00:00"), 2L, ts("2025-01-02 00:00:00"),
        Some(ts("2025-01-03 00:00:00")), 0),
      (1L, 2L, "B", ts("2025-01-03 00:00:00"), 1L, ts("2025-01-03 00:00:00"),
        Some(ts("2025-01-04 00:00:00")), 0),
      (1L, 3L, "A", ts("2025-01-04 00:00:00"), 1L, ts("2025-01-04 00:00:00"),
        None, 1),
      (2L, 1L, "X", ts("2025-01-01 00:00:00"), 1L, ts("2025-01-01 00:00:00"),
        None, 1)))
  }

  test("scd2FromChanges: same-timestamp flip yields a zero-duration version") {
    val changes = Seq(
      (1L, "A", ts("2025-01-01 00:00:00"), 1L),
      (1L, "B", ts("2025-01-01 00:00:00"), 2L) // same ts, later event_id
    ).toDF("user_id", "event_type", "ts", "event_id")
    val out = Upsert.scd2FromChanges(changes, Seq("user_id"), "event_type",
      "ts", tieCols = Seq("event_id"))
      .orderBy("version")
      .as[(Long, Long, String, java.sql.Timestamp, Long, java.sql.Timestamp,
        Option[java.sql.Timestamp], Int)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, "A", ts("2025-01-01 00:00:00"), 1L, ts("2025-01-01 00:00:00"),
        Some(ts("2025-01-01 00:00:00")), 0),
      (1L, 2L, "B", ts("2025-01-01 00:00:00"), 1L, ts("2025-01-01 00:00:00"),
        None, 1)))
  }

  test("scd2FromChanges plan: 3 linear windows, 2 sorts, sort-free post-agg lead") {
    // The lead-over-runs form: two event-level Window nodes (lag → change
    // flag, running version sum) plus the post-aggregation lead over runs —
    // 3 Window nodes but still only 2 sorts, because the lead's
    // (key, version) ordering is exactly the SortAggregate's output
    // ordering. Two invariants matter at scale and are pinned here:
    //   (a) NO shrinking (UnboundedFollowing) frame anywhere — Spark
    //       re-evaluates those per row, O(changes²) per key;
    //   (b) NO Sort or Exchange between the aggregate and the lead Window
    //       — the lead rides the aggregate's partitioning and ordering.
    val changes = Seq(
      (1L, "A", ts("2025-01-01 00:00:00"), 1L),
      (1L, "B", ts("2025-01-02 00:00:00"), 2L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val p = Upsert.scd2FromChanges(changes, Seq("user_id"), "event_type",
      "ts", tieCols = Seq("event_id"))
      .queryExecution.executedPlan.toString
    val windows = "Window \\[".r.findAllIn(p).size
    val sorts = "Sort \\[".r.findAllIn(p).size
    assert(windows == 3, s"expected 3 Window nodes, got $windows:\n$p")
    assert(sorts == 2, s"expected 2 Sort nodes, got $sorts:\n$p")
    assert(!p.toLowerCase.contains("unboundedfollowing"),
      s"no Window frame may shrink (quadratic re-evaluation):\n$p")
    // (b): the lead Window sits directly on the aggregate — nothing but
    // projections between the topmost Window node and the first aggregate
    // below it.
    val leadIdx = p.indexOf("Window [lead(")
    assert(leadIdx >= 0, s"expected a post-agg lead Window:\n$p")
    val aggIdx = p.indexOf("Aggregate", leadIdx)
    assert(aggIdx > leadIdx, s"expected an aggregate below the lead:\n$p")
    val between = p.substring(leadIdx, aggIdx)
    assert(!between.contains("Sort [") && !between.contains("Exchange"),
      s"the post-agg lead must not introduce a Sort/Exchange:\n$p")
  }

  test("scd2ApplyChanges: incremental fold equals the batch form, late events included") {
    val b1 = Seq(
      (1L, "A", ts("2025-01-01 00:00:00")),
      (1L, "B", ts("2025-01-05 00:00:00")),
      (2L, "X", ts("2025-01-02 00:00:00"))
    ).toDF("user_id", "event_type", "ts")
    // batch 2 carries a LATE event (1, C, Jan 3) that splits 1's first run
    val b2 = Seq(
      (1L, "C", ts("2025-01-03 00:00:00")),
      (2L, "X", ts("2025-01-06 00:00:00")), // same state: extends the run
      (3L, "N", ts("2025-01-04 00:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val h1 = Upsert.scd2FromChanges(b1, Seq("user_id"), "event_type", "ts")
    val inc = Upsert.scd2ApplyChanges(h1, b2, "user_id", "event_type", "ts")
    val full = Upsert.scd2FromChanges(b1.unionByName(b2), Seq("user_id"),
      "event_type", "ts", tieCols = Seq("event_type"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "version", "event_type", "valid_from",
        "n_changes", "last_ts", "valid_to", "is_current")
        .as[(Long, Long, String, java.sql.Timestamp, Long,
          java.sql.Timestamp, Option[java.sql.Timestamp], Int)]
        .collect().toSet
    // no batch event lands strictly inside a >=3-change run, so the
    // no-log fold is in its EXACT regime — last_ts included
    assert(Upsert.scd2LateConflicts(h1, b2, "user_id", "event_type", "ts")
      .isEmpty, "detector must be empty in the exact regime")
    assert(canon(inc) == canon(full),
      "incremental fold must equal the batch recompute over the full log")
    // the late event really split the interval
    assert(canon(inc).exists(r => r._1 == 1L && r._3 == "C"))
  }

  test("scd2ApplyChanges: late event inside a 2-event run is exact (two-point)") {
    // run A holds events at Jan 1 and Jan 3; the late B lands STRICTLY
    // between them. One-point reconstruction (pre-round-8) lost the Jan 3
    // event and ended the history on B; both endpoints are stored, so the
    // refold re-opens A at Jan 3 exactly as the batch fold does.
    val b1 = Seq(
      (1L, "A", ts("2025-01-01 00:00:00")),
      (1L, "A", ts("2025-01-03 00:00:00"))).toDF("user_id", "event_type", "ts")
    val b2 = Seq(
      (1L, "B", ts("2025-01-02 00:00:00"))).toDF("user_id", "event_type", "ts")
    val h1 = Upsert.scd2FromChanges(b1, Seq("user_id"), "event_type", "ts")
    assert(Upsert.scd2LateConflicts(h1, b2, "user_id", "event_type", "ts")
      .isEmpty, "2-event runs are fully reconstructable — no conflict")
    val inc = Upsert.scd2ApplyChanges(h1, b2, "user_id", "event_type", "ts")
    val full = Upsert.scd2FromChanges(b1.unionByName(b2), Seq("user_id"),
      "event_type", "ts")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "version", "event_type", "valid_from",
        "n_changes", "last_ts", "valid_to", "is_current")
        .as[(Long, Long, String, java.sql.Timestamp, Long,
          java.sql.Timestamp, Option[java.sql.Timestamp], Int)]
        .collect().toSet
    assert(canon(inc) == canon(full))
    // current state must be A again (the bug fixed in round 8: one-point
    // reconstruction left B current)
    assert(canon(inc).collect { case r if r._8 == 1 => r._3 } == Set("A"))
  }

  test("scd2LateConflicts detects the inexact case; scd2ApplyChangesExact fixes it") {
    // >=3-change run A(Jan1, Jan3, Jan5); late B at Jan 2 lands strictly
    // inside — the interior Jan 3 event is unrecoverable from history
    // alone, so the no-log fold diverges, the detector flags the row, and
    // the raw-log refold equals the batch fold exactly.
    val b1 = Seq(
      (1L, "A", ts("2025-01-01 00:00:00")),
      (1L, "A", ts("2025-01-03 00:00:00")),
      (1L, "A", ts("2025-01-05 00:00:00"))).toDF("user_id", "event_type", "ts")
    val b2 = Seq(
      (1L, "B", ts("2025-01-02 00:00:00")),
      (2L, "X", ts("2025-01-04 00:00:00"))).toDF("user_id", "event_type", "ts")
    val h1 = Upsert.scd2FromChanges(b1, Seq("user_id"), "event_type", "ts")
    val conflicts = Upsert.scd2LateConflicts(
      h1, b2, "user_id", "event_type", "ts").collect()
    assert(conflicts.length == 1 && conflicts.head.getLong(0) == 1L,
      "exactly the interior state-flip must be flagged")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "version", "event_type", "valid_from",
        "n_changes", "last_ts", "valid_to", "is_current")
        .as[(Long, Long, String, java.sql.Timestamp, Long,
          java.sql.Timestamp, Option[java.sql.Timestamp], Int)]
        .collect().toSet
    val full = Upsert.scd2FromChanges(b1.unionByName(b2), Seq("user_id"),
      "event_type", "ts")
    val exact = Upsert.scd2ApplyChangesExact(
      h1, b1, b2, "user_id", "event_type", "ts")
    assert(canon(exact) == canon(full),
      "raw-log refold must equal the batch fold on the conflicted key")
    // and the documented inexactness is REAL: the no-log fold re-opens A
    // at last_ts (Jan 5) instead of the true interior boundary (Jan 3)
    val inc = Upsert.scd2ApplyChanges(h1, b2, "user_id", "event_type", "ts")
    assert(canon(inc) != canon(full),
      "without the raw log this case is approximate by design")
  }

  test("property: exact incremental chain equals batch fold on random late streams") {
    val rnd = new scala.util.Random(13)
    val all = (0 until 300).map { i =>
      (rnd.nextInt(8).toLong, "S" + rnd.nextInt(3),
        ts(f"2025-01-${1 + rnd.nextInt(27)}%02d 00:00:00"), i.toLong)
    }
    // three shuffled batches — late events across batches guaranteed
    val batches = rnd.shuffle(all).grouped(100).toSeq
      .map(_.toDF("user_id", "event_type", "ts", "event_id"))
    var hist = Upsert.scd2FromChanges(
      batches.head.limit(0), Seq("user_id"), "event_type", "ts",
      tieCols = Seq("event_id"))
    var log = batches.head.limit(0)
    for (b <- batches) {
      hist = Upsert.scd2ApplyChangesExact(hist, log, b, "user_id",
        "event_type", "ts", tieCols = Seq("event_id"))
      log = log.unionByName(b)
      // materialize to keep the plan chain short across iterations
      hist = hist.localCheckpoint(true)
      log = log.localCheckpoint(true)
    }
    val full = Upsert.scd2FromChanges(all.toDF("user_id", "event_type", "ts",
      "event_id"), Seq("user_id"), "event_type", "ts",
      tieCols = Seq("event_id"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "version", "event_type", "valid_from",
        "n_changes", "last_ts", "valid_to", "is_current")
        .as[(Long, Long, String, java.sql.Timestamp, Long,
          java.sql.Timestamp, Option[java.sql.Timestamp], Int)]
        .collect().toSet
    assert(canon(hist) == canon(full),
      "exact chain must reproduce the batch fold, late events and all")
  }

  test("scd2 streaming maintenance: history converges trigger by trigger") {
    val root = java.nio.file.Files.createTempDirectory("graft-scd2s").toString
    val (src, hist, cp) = (s"$root/src", s"$root/hist", s"$root/cp")
    val schema = new org.apache.spark.sql.types.StructType()
      .add("user_id", org.apache.spark.sql.types.LongType)
      .add("event_type", org.apache.spark.sql.types.StringType)
      .add("ts", org.apache.spark.sql.types.TimestampType)
    val b1 = Seq(
      (1L, "A", ts("2025-01-01 00:00:00")),
      (1L, "B", ts("2025-01-05 00:00:00")))
      .toDF("user_id", "event_type", "ts")
    val b2 = Seq(
      (1L, "C", ts("2025-01-03 00:00:00")), // late: splits the A run
      (2L, "X", ts("2025-01-02 00:00:00")))
      .toDF("user_id", "event_type", "ts")
    b1.write.mode("append").parquet(src)
    graft.streaming.Scd2Stream.runOnce(spark, src, hist, cp, schema,
      "user_id", "event_type", "ts")
    b2.write.mode("append").parquet(src)
    val out = graft.streaming.Scd2Stream.runOnce(spark, src, hist, cp, schema,
      "user_id", "event_type", "ts")
    val full = Upsert.scd2FromChanges(b1.unionByName(b2), Seq("user_id"),
      "event_type", "ts", tieCols = Seq("event_type"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "version", "event_type", "valid_from",
        "n_changes", "valid_to", "is_current")
        .as[(Long, Long, String, java.sql.Timestamp, Long,
          Option[java.sql.Timestamp], Int)].collect().toSet
    assert(canon(out) == canon(full),
      "streamed history must equal the batch recompute over all changes")
  }

  test("scd2ExactQuery: raw-log stream is exact through an interior state flip") {
    val root = java.nio.file.Files.createTempDirectory("graft-scd2x").toString
    val (src, hist, rawLog, cp) =
      (s"$root/src", s"$root/hist", s"$root/log", s"$root/cp")
    val schema = new org.apache.spark.sql.types.StructType()
      .add("user_id", org.apache.spark.sql.types.LongType)
      .add("event_type", org.apache.spark.sql.types.StringType)
      .add("ts", org.apache.spark.sql.types.TimestampType)
    // batch 1 builds a 3-event A run; batch 2's late B lands strictly
    // inside it — the no-log stream is documented-approximate here, the
    // raw-log stream must match the batch fold
    val b1 = Seq(
      (1L, "A", ts("2025-01-01 00:00:00")),
      (1L, "A", ts("2025-01-03 00:00:00")),
      (1L, "A", ts("2025-01-05 00:00:00")))
      .toDF("user_id", "event_type", "ts")
    val b2 = Seq(
      (1L, "B", ts("2025-01-02 00:00:00")))
      .toDF("user_id", "event_type", "ts")
    b1.write.mode("append").parquet(src)
    graft.streaming.Scd2Stream.runOnceExact(spark, src, hist, rawLog, cp,
      schema, "user_id", "event_type", "ts")
    b2.write.mode("append").parquet(src)
    val out = graft.streaming.Scd2Stream.runOnceExact(spark, src, hist,
      rawLog, cp, schema, "user_id", "event_type", "ts")
    val full = Upsert.scd2FromChanges(b1.unionByName(b2), Seq("user_id"),
      "event_type", "ts")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "version", "event_type", "valid_from",
        "n_changes", "last_ts", "valid_to", "is_current")
        .as[(Long, Long, String, java.sql.Timestamp, Long,
          java.sql.Timestamp, Option[java.sql.Timestamp], Int)]
        .collect().toSet
    assert(canon(out) == canon(full),
      "exact stream must reproduce the batch fold through the conflict")
  }

  test("property: scd2 invariants hold on random change streams") {
    // deterministic pseudo-random stream: keys x states x minute offsets
    val rnd = new scala.util.Random(7)
    val changes = (0 until 400).map { i =>
      (rnd.nextInt(12).toLong,                       // user_id
        ("S" + rnd.nextInt(4)),                      // event_type
        ts(f"2025-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"),
        i.toLong)                                    // unique tiebreak
    }.toDF("user_id", "event_type", "ts", "event_id")
    val h = Upsert.scd2FromChanges(changes, Seq("user_id"), "event_type",
      "ts", tieCols = Seq("event_id"))
      .as[(Long, Long, String, java.sql.Timestamp, Long, java.sql.Timestamp,
        Option[java.sql.Timestamp], Int)].collect()
    val byKey = h.groupBy(_._1)
    // every event lands in exactly one interval
    assert(h.map(_._5).sum == 400L, "n_changes must partition the events")
    // last event of a run is bracketed by its interval
    h.foreach { r =>
      assert(!r._6.before(r._4), "last_ts must be >= valid_from")
      r._7.foreach(vt => assert(!r._6.after(vt), "last_ts must be <= valid_to"))
    }
    byKey.foreach { case (k, rows) =>
      val sorted = rows.sortBy(_._2).toSeq
      // versions are 1..n contiguous
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq,
        s"key $k versions not contiguous")
      // exactly one open interval, and it is the last version
      assert(sorted.count(_._7.isEmpty) == 1 && sorted.last._7.isEmpty,
        s"key $k open-interval shape broken")
      // intervals chain: valid_to == next valid_from; valid_from monotone
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._7.contains(b._4), s"key $k intervals don't chain")
          assert(!b._4.before(a._4), s"key $k valid_from not monotone")
        case _ =>
      }
      // adjacent versions always change state (runs are maximal)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._3 != b._3, s"key $k run not maximal")
        case _ =>
      }
    }
  }

  test("scd2Merge: unchanged passes, changed closes+opens, vanished closes, new opens") {
    val history = Seq(
      // k1: one closed + one current (will be UNCHANGED)
      ("k1", "v0", ts("2025-01-01 00:00:00"), Some(ts("2025-02-01 00:00:00"))),
      ("k1", "v1", ts("2025-02-01 00:00:00"), None),
      // k2: current, attribute CHANGES in the snapshot
      ("k2", "w1", ts("2025-01-15 00:00:00"), None),
      // k3: current, VANISHES from the snapshot
      ("k3", "x1", ts("2025-01-20 00:00:00"), None)
    ).toDF("k", "attr", "valid_from", "valid_to")
    val snapshot = Seq(
      ("k1", "v1"), ("k2", "w2"), ("k4", "z1")).toDF("k", "attr")
    val asOf = ts("2025-03-01 00:00:00")
    val out = Upsert.scd2Merge(history, snapshot, "k", Seq("attr"), asOf)
      .as[(String, String, java.sql.Timestamp, Option[java.sql.Timestamp])]
      .collect().toSet
    assert(out == Set(
      ("k1", "v0", ts("2025-01-01 00:00:00"), Some(ts("2025-02-01 00:00:00"))),
      ("k1", "v1", ts("2025-02-01 00:00:00"), None),          // unchanged
      ("k2", "w1", ts("2025-01-15 00:00:00"), Some(asOf)),    // closed
      ("k2", "w2", asOf, None),                               // re-opened
      ("k3", "x1", ts("2025-01-20 00:00:00"), Some(asOf)),    // vanished
      ("k4", "z1", asOf, None)))                              // brand new
    // idempotence: merging the same snapshot again changes nothing
    val again = Upsert.scd2Merge(
      Upsert.scd2Merge(history, snapshot, "k", Seq("attr"), asOf),
      snapshot, "k", Seq("attr"), asOf)
      .as[(String, String, java.sql.Timestamp, Option[java.sql.Timestamp])]
      .collect().toSet
    assert(again == out, "re-merging an identical snapshot must be a no-op")
  }

  test("upsertVersioned: pinned versions survive later merges; retire closes them") {
    import graft.sources.VersionedStore
    val root = java.nio.file.Files.createTempDirectory("graft-ttspec").toString
    def state(vs: (String, Int)*) = vs.toDF("k", "x")
    assert(Upsert.upsertVersioned(spark, root, state("a" -> 1, "b" -> 2),
      Seq("k")) == 1L)
    assert(Upsert.upsertVersioned(spark, root, state("b" -> 20, "c" -> 3),
      Seq("k")) == 2L)
    assert(Upsert.upsertVersioned(spark, root, state("a" -> 100),
      Seq("k")) == 3L)
    // every version re-reads exactly as published, head included
    def read(v: Long) = Upsert.readVersion(spark, root, v)
      .as[(String, Int)].collect().toSet
    assert(read(1L) == Set("a" -> 1, "b" -> 2))
    assert(read(2L) == Set("a" -> 1, "b" -> 20, "c" -> 3))
    assert(read(3L) == Set("a" -> 100, "b" -> 20, "c" -> 3))
    // retention: retiring v1 refuses its read, leaves the rest intact
    VersionedStore.retire(spark, root, 1L)
    intercept[IllegalArgumentException] { Upsert.readVersion(spark, root, 1L) }
    assert(read(2L) == Set("a" -> 1, "b" -> 20, "c" -> 3))
    intercept[IllegalArgumentException] { Upsert.readVersion(spark, root, 9L) }
  }

  test("VersionedStore under a same-version race: loser fails loudly, " +
      "live future staging survives the sweep") {
    import graft.sources.VersionedStore
    val root = java.nio.file.Files.createTempDirectory("graft-vsrace").toString
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def touchDir(name: String): Unit =
      fs.mkdirs(new org.apache.hadoop.fs.Path(root, name))
    VersionedStore.publish(spark, root, 1L)(tmp => fs.mkdirs(
      new org.apache.hadoop.fs.Path(tmp)))
    // a dead crashed attempt for an already-published version AND a
    // concurrent writer's LIVE staging for a future version
    touchDir(".tmp-v=1")
    touchDir(".tmp-v=9")
    VersionedStore.publish(spark, root, 2L)(tmp => fs.mkdirs(
      new org.apache.hadoop.fs.Path(tmp)))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, ".tmp-v=1")),
      "dead staging (version <= latest) is swept")
    assert(fs.exists(new org.apache.hadoop.fs.Path(root, ".tmp-v=9")),
      "a live future staging must NOT be swept out from under its writer")
    // same-version race: the other writer lands v=3 between our
    // monotonic check and our rename (injected inside the write
    // callback) — the rename must lose LOUDLY, not nest into the live
    // version dir
    val e = intercept[IllegalStateException] {
      VersionedStore.publish(spark, root, 3L) { tmp =>
        fs.mkdirs(new org.apache.hadoop.fs.Path(tmp))
        touchDir("v=3") // the concurrent winner
      }
    }
    assert(e.getMessage.contains("concurrent publish"))
    assert(VersionedStore.versions(spark, root) == Seq(1L, 2L, 3L))
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(root, "v=3"))
      .forall(!_.getPath.getName.startsWith(".tmp-v=")),
      "the losing rename must not nest staging inside the live version")
    // per-attempt staging (.tmp-v=3.<id>) is deleted eagerly on the
    // lost race, not left for the next publish's sweep
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .forall(!_.getPath.getName.startsWith(".tmp-v=3")),
      "the loser must clean up its own staging")
  }
}
