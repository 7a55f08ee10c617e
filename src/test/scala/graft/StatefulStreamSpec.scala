package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.sources.Tables

/** Custom streaming state via flatMapGroupsWithState (SURVEY.md §2.10 T8
  * extension surface): a per-user running event counter with cumulative
  * value, emitted per micro-batch — the KeyValueGroupedDataset state API the
  * engine exposes for semantics that windowed aggs can't express.
  */
case class UserEvent(user_id: Long, value: Double)
case class UserTotals(user_id: Long, n: Long, total: Double)

class StatefulStreamSpec extends SparkSpec {

  test("flatMapGroupsWithState accumulates per-key state across micro-batches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fmgws").toString
    val src = s"$dir/src"
    val cp = s"$dir/cp"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))

    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("user_id"), col("value"))
    // two input files -> maxFilesPerTrigger=1 forces multiple micro-batches
    // within one query, so the state crossing batches is observable.
    events.limit(200).coalesce(1).write.parquet(s"$src/b1")
    events.limit(700).exceptAll(events.limit(200)).coalesce(1)
      .write.parquet(s"$src/b2")

    def update(userId: Long, rows: Iterator[UserEvent],
               state: GroupState[UserTotals]): Iterator[UserTotals] = {
      val prev = state.getOption.getOrElse(UserTotals(userId, 0L, 0.0))
      var n = prev.n
      var total = prev.total
      rows.foreach { e => n += 1; total += e.value }
      val next = UserTotals(userId, n, total)
      state.update(next)
      Iterator(next)
    }

    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$src/*")
      .as[UserEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(update)
    val q = stream.writeStream.outputMode("update").format("memory")
      .queryName("totals").option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val emitted = spark.table("totals")
    assert(emitted.count() > spark.table("totals")
      .select("user_id").distinct().count(),
      "users spanning micro-batches must emit more than once")
    val latest = emitted.groupBy("user_id").agg(max("n").as("n"))
    val total = latest.agg(sum("n")).as[Long].head()
    assert(total == 700, s"state must accumulate 200 + 500 rows, got $total")
  }

  test("RocksDB state store: the api→fact drain is frame-identical to the " +
      "default provider (the 100 TB state backend)") {
    // HDFSBackedStateStoreProvider keeps every version of streaming state
    // in executor HEAP — at real corpus scale the dedup key space OOMs
    // the executors, and the production answer is Spark's bundled RocksDB
    // provider (native, spills to local disk, bounded memory). This leg
    // pins that the engine's stateful drain (paged pull → watermarked
    // dropDuplicates → fact) produces the IDENTICAL frame under RocksDB,
    // so flipping the provider at scale is a pure config change.
    import spark.implicits._
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .filter(col("event_id") % 10 === 0)
    def drain(): Seq[(String, java.sql.Timestamp, Double, String, String)] =
      graft.streaming.EventsPagedApi
        .factsViaApi(spark, events, pageSize = 50, maxPagesPerTrigger = 4)
        .select(col("event_key"), col("received_at"), col("percent_viewed"),
          col("visitor_key"), col("media_id"))
        .as[(String, java.sql.Timestamp, Double, String, String)]
        .collect().sortBy(_._1).toSeq
    val base = drain()
    assert(base.nonEmpty, "precondition: the slice drains rows")
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state" +
      ".RocksDBStateStoreProvider")
    try {
      val rocks = drain()
      assert(rocks == base,
        "RocksDB-backed drain must be frame-identical to the default")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("sessionsStateful emits exactly the batch session_window set (T8, EventTimeTimeout)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-sess").toString
    val src = s"$root/src"
    val cp = s"$root/cp"
    val out = s"$root/out"
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")

    // Chronological halves -> two micro-batches whose watermark never drops
    // a later row (each file's events are newer than the prior file's
    // watermark); an id-based split would silently lose most of batch 2.
    val midUs = ev.select(unix_micros(col("ts")).as("us"))
      .stat.approxQuantile("us", Array(0.5), 0.0).head.toLong
    ev.filter(unix_micros(col("ts")) < midUs).coalesce(1).write.parquet(s"$src/b1")
    ev.filter(unix_micros(col("ts")) >= midUs).coalesce(1).write.parquet(s"$src/b2")

    def run(): Unit = {
      val stream = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$src/*")
      val q = graft.streaming.EventsStream.sessionsStateful(stream)
        .writeStream.outputMode("append").format("parquet")
        .option("checkpointLocation", cp).option("path", out)
        .trigger(Trigger.AvailableNow()).start()
      q.processAllAvailable(); q.stop()
    }
    run()

    // Two sentinel rounds (user -1) ratchet the watermark past every real
    // session end: round 1 raises the watermark to maxTs+2h only AFTER its
    // batch, so round 2 is what fires the remaining event-time timeouts.
    val maxTs = ev.agg(max("ts")).as[java.sql.Timestamp].head()
    def sentinel(id: Long, hoursAhead: Long): Unit = {
      Seq((id, new java.sql.Timestamp(maxTs.getTime + hoursAhead * 3600 * 1000L),
        -1L, "sentinel", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$src/s$id")
      run()
    }
    sentinel(9000001L, 3)
    sentinel(9000002L, 10)

    val got = spark.read.parquet(out).filter(col("user_id") >= 0)
    val want = ev.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))
    assert(got.count() == want.count(),
      s"every real session must close exactly once: got ${got.count()} vs batch ${want.count()}")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "custom state machine must reproduce session_window exactly")
  }

  test("funnelStateful emits each conversion once, equal to the batch fold") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-sfun").toString
    val src = s"$root/src"
    val cp = s"$root/cp"
    val out = s"$root/out"
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    // chronological halves (the sessionsStateful recipe): each file's
    // events are newer than the prior file's watermark
    val midUs = ev.select(unix_micros(col("ts")).as("us"))
      .stat.approxQuantile("us", Array(0.5), 0.0).head.toLong
    ev.filter(unix_micros(col("ts")) < midUs).coalesce(1).write.parquet(s"$src/b1")
    ev.filter(unix_micros(col("ts")) >= midUs).coalesce(1).write.parquet(s"$src/b2")

    def run(): Unit = {
      val stream = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$src/*")
      val q = graft.streaming.EventsStream.funnelStateful(stream)
        .writeStream.outputMode("append").format("parquet")
        .option("checkpointLocation", cp).option("path", out)
        .trigger(Trigger.AvailableNow()).start()
      q.processAllAvailable(); q.stop()
    }
    run()
    // sentinel rounds ratchet the watermark past every real event so
    // chains whose tail sat inside the watermark window finalize
    val maxTs = ev.agg(max("ts")).as[java.sql.Timestamp].head()
    def sentinel(id: Long, hoursAhead: Long): Unit = {
      Seq((id, new java.sql.Timestamp(maxTs.getTime + hoursAhead * 3600 * 1000L),
        -1L, "sentinel", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$src/s$id")
      run()
    }
    sentinel(9000001L, 3)
    sentinel(9000002L, 10)

    val got = spark.read.parquet(out)
    val want = graft.ops.Joins.funnelConversion(ev,
      Seq("view", "click", "purchase"))
    assert(got.count() == want.count(),
      s"each conversion exactly once: got ${got.count()} vs batch ${want.count()}")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "streaming funnel must reproduce the batch greedy fold exactly")
  }

  test("leaderboard: per-wave batch parity; replay (same-checkpoint and full) idempotent") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-lb").toString
    val src = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val w1 = ev.filter(col("event_id") % 2 === 0)
    val w2 = ev.filter(col("event_id") % 2 === 1)
    w1.coalesce(1).write.parquet(s"$src/w1")
    val k = 10

    // the batch twin: same per-row integer units, same deterministic
    // tie-break — what the snapshot must equal after each wave
    def batchTop(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id").as("key"),
        round(coalesce(col("value"), lit(0.0)) * 10000).cast("long").as("u"))
      .groupBy("key")
      .agg(count(lit(1)).as("n_events"), sum(col("u")).as("units"))
      .orderBy(col("units").desc, col("key").asc).limit(k)
      .select(col("key"), col("n_events"),
        (col("units").cast("double") / 10000).as("engagement"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

    def run(totals: String, out: String, cp: String): Unit = {
      val q = graft.streaming.EventsStream.leaderboardQuery(spark,
        s"$src/*", totals, out, cp, k, globFilter = "*.parquet")
      q.processAllAvailable(); q.stop()
    }
    def snapshot(out: String, batch: Long) = spark.read.parquet(out)
      .filter(col("batch_id") === batch).orderBy(col("rank"))
      .select(col("key"), col("n_events"), col("engagement"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

    val (totals, out, cp) = (s"$root/totals", s"$root/out", s"$root/cp")
    run(totals, out, cp)
    assert(snapshot(out, 0L) === batchTop(w1),
      "wave-1 snapshot must equal the batch top-k over wave 1")
    w2.coalesce(1).write.parquet(s"$src/w2")
    run(totals, out, cp)
    assert(snapshot(out, 1L) === batchTop(ev),
      "wave-2 snapshot must equal the batch top-k over everything")
    // ranks are 1..k with the deterministic tie-break
    assert(spark.read.parquet(out).filter(col("batch_id") === 1L)
      .select("rank").as[Int].collect().sorted.toSeq === (1 to k),
      "snapshot must carry ranks 1..k")

    // same-checkpoint replay: no new files -> totals and snapshots
    // unchanged (absolute-total merge re-writes identical rows)
    val before = spark.read.parquet(totals)
      .collect().map(_.toSeq).toSet
    run(totals, out, cp)
    assert(spark.read.parquet(totals).collect().map(_.toSeq).toSet === before,
      "a no-new-data re-run must not change the totals table")
    assert(snapshot(out, 1L) === batchTop(ev))

    // full replay: fresh checkpoint + fresh state dirs over the same
    // source must rebuild bit-identical integer totals and the same
    // final leaderboard (both waves may land in one batch — compare the
    // LAST snapshot, not batch ids)
    val (t2, o2, c2) = (s"$root/totals2", s"$root/out2", s"$root/cp2")
    run(t2, o2, c2)
    assert(spark.read.parquet(t2).collect().map(_.toSeq).toSet ===
      spark.read.parquet(totals).collect().map(_.toSeq).toSet,
      "full replay must rebuild identical totals")
    val lastBatch = spark.read.parquet(o2)
      .agg(max(col("batch_id").cast("long"))).as[Long].head()
    assert(snapshot(o2, lastBatch) === batchTop(ev),
      "full replay's final leaderboard must equal the batch top-k")
  }
}
