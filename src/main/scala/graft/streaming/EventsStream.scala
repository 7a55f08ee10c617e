package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.LongType

import graft.schema.Schemas
import graft.sources.Tables

/** State row for [[EventsStream.sessionsStateful]]: one user's still-open
  * sessions as (startUs, lastEventUs, nEvents), epoch micros. Bounded by the
  * watermark: a session leaves the state the moment no in-watermark event can
  * extend it, so per-key state is O(open sessions), not O(events).
  */
case class OpenSessions(open: Seq[(Long, Long, Long)])

/** State row for [[EventsStream.funnelStateful]]: the greedy chain built
  * so far from WATERMARK-FINAL events (`chain(j)` = epoch-µs of step j),
  * the buffered not-yet-final step events, and the emitted flag. `done`
  * rows are retained forever by design — removing them would let a
  * post-emission event restart the chain and emit a second, different
  * conversion for the same user (batch parity allows exactly one).
  */
case class FunnelProgress(chain: Seq[Long], pending: Seq[(Long, Int)],
                          done: Boolean)

/** State row for [[EventsStream.leaderboardTotals]]: one entity's running
  * engagement — event count and value in exact integer 10^-4 units (the
  * repo's units discipline: float summation order is partition-dependent,
  * integer totals are order-invariant, which is what makes the full-replay
  * idempotence contract checkable bit-for-bit). State is one row per
  * entity ever seen — bounded by the entity domain (a media catalog, a
  * user base), not by event volume; NoTimeout by design, a cumulative
  * leaderboard's totals never expire.
  */
case class LeaderTotals(key: Long, n_events: Long, units: Long)

/** Structured-Streaming twin of the events path (SURVEY.md §2.10: T3, T5,
  * T7, T8). The reference implements watermarks, checkpoints, and daily
  * windows by hand over a batch loop; Structured Streaming owns all of that
  * state natively — `withWatermark` is T3, the checkpointLocation offset log
  * is T2, `dropDuplicatesWithinWatermark` is T5, tumbling `window` is T7,
  * `session_window` is T8.
  */
object EventsStream {

  /** Streaming read of an events-shaped parquet directory. A streaming
    * source needs its schema fixed up front, so the `ts` physical encoding
    * is detected with ONE batch footer probe of the same path+glob
    * ([[graft.sources.Tables.probeTsEncoding]], cached) and the stream
    * branches exactly like the batch loader: native TimestampType decode
    * for MICROS/MILLIS/INT96, raw-long `div 1000` for TIMESTAMP(NANOS)
    * (which still requires `spark.sql.legacy.parquet.nanosAsLong=true` at
    * session build time — see graft.GraftSession).
    */
  def readEvents(spark: SparkSession, dir: String,
                 globFilter: String = "events.parquet"): DataFrame = {
    // A streaming source dir may be EMPTY at stream definition (producer
    // writes later); the batch probe cannot infer a schema then. Fall
    // back to the native TimestampType schema — the current testdata
    // generation's encoding — rather than failing the stream start; a
    // legacy NANOS directory must carry a seed file for the probe to see
    // (it needed one under the old hard-coded reader too, to exist at
    // all). The fallback is gated on the directory actually being empty
    // of matching files: a probe failure on a POPULATED directory
    // (corrupt footer, mixed-generation encodings, transient listing
    // error) must surface, not silently define the stream at the native
    // unit and mis-decode every legacy file.
    val encoding =
      try Tables.probeTsEncoding(spark, dir, Some(globFilter))
      catch {
        case _: org.apache.spark.sql.AnalysisException
            if !Tables.hasFiles(spark, dir, globFilter) =>
          Tables.NativeTimestamp
      }
    encoding match {
      case Tables.NativeTimestamp =>
        spark.readStream
          .schema(Schemas.events)
          .option("pathGlobFilter", globFilter)
          .parquet(dir)
      case Tables.RawNanos =>
        spark.readStream
          .schema(Tables.eventsRawSchema)
          .option("pathGlobFilter", globFilter)
          .parquet(dir)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    }
  }

  /** T8/J6 stream-stream interval join: the batch funnel
    * ([[graft.ops.Joins.funnelPairs]]) run as a watermarked self-join —
    * literally the same plan builder; only the watermark is added, which
    * survives the builder's aliased selects via column metadata. Both
    * sides derive from ONE streaming source (scanned once per
    * micro-batch), and the two-sided event-time bound in the join
    * condition is what lets Spark expire join state: a buffered fromType
    * row can be dropped once the watermark passes `from_ts + horizon`,
    * a toType row once it passes `to_ts`. Full-replay parity with the
    * batch form is spec-pinned (StreamingSpec).
    */
  def funnelPairsStream(events: DataFrame, fromType: String = "view",
                        toType: String = "purchase",
                        horizon: String = "1 hour",
                        watermarkDelay: String = "1 hour"): DataFrame =
    graft.ops.Joins.funnelPairs(
      events.withWatermark("ts", watermarkDelay), fromType, toType, horizon)

  /** [[funnelPairsStream]] with the batch quarantine applied as a
    * STREAM-STATIC left-anti join — the production bot-guard shape: the
    * quarantine list is maintenance state
    * ([[graft.ops.Joins.funnelQuarantine]] over history, refreshed on a
    * batch cadence), broadcast against each micro-batch BEFORE the
    * stream-stream join, so a quarantined key's events never enter join
    * state at all (the capped guarantee matters MORE in streaming: an
    * unguarded bot key doesn't just straggle, it pins buffered rows for
    * the full horizon in the state store). Computing the cap inside the
    * stream would need a running per-user count that can never expire —
    * unbounded state for a signal the batch side already owns.
    */
  def funnelPairsStreamCapped(events: DataFrame, quarantine: DataFrame,
                              fromType: String = "view",
                              toType: String = "purchase",
                              horizon: String = "1 hour",
                              watermarkDelay: String = "1 hour"): DataFrame =
    funnelPairsStream(
      events.join(broadcast(quarantine.select(col("user_id"))),
        Seq("user_id"), "left_anti"),
      fromType, toType, horizon, watermarkDelay)

  /** T7: tumbling daily engagement counts with a 1-day watermark.
    * `approx_count_distinct` keeps per-window state mergeable and bounded —
    * exact distinct in streaming state grows with cardinality.
    */
  def dailyCounts(events: DataFrame, watermarkDelay: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("load_count"),
        approx_count_distinct(col("user_id")).as("visitors_approx"))
      .select(col("window.start").as("ws"), col("event_type"),
        col("load_count"), col("visitors_approx"))

  /** T8: per-user session windows with a 30-minute inactivity gap. */
  def sessions(events: DataFrame, gap: String = "30 minutes",
               watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))

  /** T8 extension surface: the [[sessions]] semantics rebuilt as a custom
    * state machine on `flatMapGroupsWithState` + `EventTimeTimeout`. Output
    * set is EXACTLY `session_window(ts, gap)` per user (spec-asserted), but
    * unlike the built-in the fold owns the per-session state row, so a user
    * can carry arbitrary payload (last event type, a value decay, an abandon
    * flag) that windowed aggs can't express — this function is the template
    * for that, kept payload-free so the parity contract stays checkable.
    *
    * Mechanics: state holds the open sessions as [start, last+gap) intervals;
    * each invocation merges the batch's events (interval union under the
    * strict `ts < last + gap` linking rule — `ts == last + gap` starts a new
    * session, matching `session_window`), emits every session whose end has
    * passed the watermark, and re-arms an event-time timeout at the earliest
    * surviving end so closure fires even when the key goes quiet. Closure is
    * safe, not just timely: `EventTimeTimeout` drops rows older than the
    * watermark before the fold runs, so a session emitted at `end <= wm` can
    * never be extended by a later row (which must have `ts >= wm >= end` —
    * and `ts == end` starts a new session even in batch).
    *
    * 100 TB posture: one shuffle on user_id; state is per-key open sessions
    * only (watermark-bounded), no event retention; emission is append-mode,
    * so downstream sinks see each closed session exactly once.
    */
  def sessionsStateful(events: DataFrame, gapMinutes: Long = 30,
                       watermarkDelay: String = "1 hour"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def fold(user: Long, rows: Iterator[(Long, java.sql.Timestamp, Long)],
             state: GroupState[OpenSessions]): Iterator[(Long, Long, Long, Long)] = {
      val incoming = rows.map { case (_, _, ts) => (ts, ts, 1L) }.toSeq
      val all = (state.getOption.map(_.open).getOrElse(Seq.empty) ++ incoming)
        .sortBy(s => (s._1, s._2))
      val merged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      for (s <- all) {
        if (merged.nonEmpty && s._1 < merged.last._2 + gapUs) {
          val p = merged.last
          merged(merged.size - 1) = (p._1, math.max(p._2, s._2), p._3 + s._3)
        } else merged += s
      }
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val (closed, open) = merged.toSeq.partition(_._2 + gapUs <= wmUs)
      if (open.isEmpty) state.remove()
      else {
        state.update(OpenSessions(open))
        // Timeout is ms-granular; a 1-ms-early firing just re-arms (the
        // closure test above is exact micros). Must stay > watermark.
        val minEndMs = open.map(s => (s._2 + gapUs) / 1000L).min
        state.setTimeoutTimestamp(math.max(minEndMs, state.getCurrentWatermarkMs() + 1))
      }
      closed.iterator.map(s => (s._1, s._2 + gapUs, user, s._3))
    }

    events
      .withWatermark("ts", watermarkDelay)
      // ts rides along untouched: the analyzer requires the watermarked
      // event-time attribute in the stateful operator's input; the fold
      // reads the exact micros from the third column.
      .select(col("user_id").cast(LongType), col("ts"), unix_micros(col("ts")))
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fold)
      .select(timestamp_micros(col("_1")).as("session_start"),
        timestamp_micros(col("_2")).as("session_end"),
        col("_3").as("user_id"), col("_4").as("n_events"))
  }

  /** Streaming twin of [[graft.ops.Joins.funnelConversion]]: the N-step
    * greedy-earliest conversion chain as a `flatMapGroupsWithState` state
    * machine, emitting each user's conversion row exactly once, equal to
    * the batch fold over the full history (spec-asserted,
    * StatefulStreamSpec).
    *
    * Why the incremental greedy fold is exact: events are folded into the
    * chain only once FINAL (ts below the watermark). Rows surviving the
    * late-data filter at trigger n all carry ts ≥ the previous trigger's
    * watermark, and previously-final events all have ts < it — so final
    * events arrive at the fold in globally non-decreasing event-time
    * batches and the batch-greedy recurrence (t_j = first step-j event
    * after t_{j−1}) extends incrementally. A step-j event that arrives
    * while the chain is shorter than j is discarded SAFELY: t_{j−1}, if
    * it ever materializes, comes from a pending/future event with
    * ts ≥ the current watermark > the discarded ts, which could never
    * have satisfied the strict `> t_{j−1}` anyway. A completed chain
    * sits entirely below the watermark, so no admissible future event
    * can undercut any of its minima — emission is final, and the `done`
    * marker makes replays and post-conversion events no-ops.
    *
    * State per user: pending events for still-unreached steps (watermark-
    * window-bounded, like open sessions) and the chain itself; converted
    * users keep one tombstone row (see [[FunnelProgress]]). An event-time
    * timeout re-arms at the earliest pending row so chains complete even
    * when the user goes quiet.
    */
  def funnelStateful(events: DataFrame,
                     steps: Seq[String] = Seq("view", "click", "purchase"),
                     watermarkDelay: String = "1 hour"): DataFrame = {
    require(steps.nonEmpty, "funnelStateful needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    val k = steps.size
    val stepIdx = steps.zipWithIndex.toMap

    def fold(user: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, Int)],
             state: GroupState[FunnelProgress]): Iterator[(Long, Seq[Long])] = {
      val prev = state.getOption
        .getOrElse(FunnelProgress(Seq.empty, Seq.empty, done = false))
      if (prev.done) {
        rows.foreach(_ => ()) // drain replays/post-conversion events
        return Iterator.empty
      }
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val (fin, pend0) = (prev.pending ++ rows.map(r => (r._3, r._4)))
        .partition(_._1 < wmUs)
      var chain = prev.chain
      for ((ts, j) <- fin.sorted) {
        if (j == chain.size && (j == 0 || chain(j - 1) < ts)) chain = chain :+ ts
      }
      // pending rows for already-reached steps can never improve the
      // chain (greedy keeps minima; their ts exceed every final ts)
      val pend = pend0.filter(_._2 >= chain.size)
      if (chain.size == k) {
        state.update(FunnelProgress(chain, Seq.empty, done = true))
        Iterator.single((user, chain))
      } else {
        state.update(FunnelProgress(chain, pend, done = false))
        if (pend.nonEmpty) {
          val minMs = pend.map(_._1).min / 1000L
          state.setTimeoutTimestamp(
            math.max(minMs + 1, state.getCurrentWatermarkMs() + 1))
        }
        Iterator.empty
      }
    }

    val typed = events
      .withWatermark("ts", watermarkDelay)
      .filter(col("event_type").isin(steps: _*))
      .select(col("user_id").cast(LongType), col("ts"), unix_micros(col("ts")),
        element_at(
          typedLit(stepIdx), col("event_type")).cast("int"))
      .as[(Long, java.sql.Timestamp, Long, Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fold)
    typed.select(col("_1").as("user_id") +:
      steps.indices.map(i =>
        timestamp_micros(col("_2")(i)).as(s"t${i + 1}")): _*)
  }

  /** T5: keyed dedup bounded by the watermark — the streaming analog of the
    * silver job's dropDuplicates(event_key).
    */
  def dedupWithinWatermark(events: DataFrame,
                           watermarkDelay: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** T8 extension — live top-k leaderboard, stage 1: per-entity running
    * engagement totals via `flatMapGroupsWithState` (the docx Business
    * Objective "top videos by engagement" as a CONTINUOUS artifact
    * instead of a batch report; keyed on user_id in the testdata schema,
    * any entity id in production). Each micro-batch folds its rows into
    * the per-key state and emits the key's new ABSOLUTE totals — count
    * and exact integer 10^-4 value units, never deltas. Absolute
    * emission is the idempotence lever: a replayed batch re-emits the
    * same totals, so the downstream merge converges instead of
    * double-counting (at-least-once sink + additive deltas is the
    * classic leaderboard corruption).
    *
    * 100 TB posture: one shuffle on the key; state is one small row per
    * entity ever seen (catalog-bounded, not event-bounded); emission per
    * trigger is only the keys the batch touched.
    */
  def leaderboardTotals(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._

    def fold(key: Long, rows: Iterator[(Long, Long)],
             state: GroupState[LeaderTotals]): Iterator[LeaderTotals] = {
      val prev = state.getOption.getOrElse(LeaderTotals(key, 0L, 0L))
      var n = prev.n_events
      var u = prev.units
      rows.foreach { r => n += 1; u += r._2 }
      val next = LeaderTotals(key, n, u)
      state.update(next)
      Iterator(next)
    }

    events
      .select(col("user_id").cast(LongType),
        round(coalesce(col("value"), lit(0.0)) * 10000).cast(LongType))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(fold)
      .toDF()
  }

  /** T8 extension — live top-k leaderboard, stage 2: the streaming query.
    * Per micro-batch the stage-1 totals are MERGED (delete+insert on the
    * key — [[graft.ops.Upsert.merge]], the reference's upsert protocol)
    * into a persisted totals table, then the top-k snapshot
    * (rank, key, n_events, engagement) — ordered by units desc with the
    * key as the deterministic tie-break, `TakeOrderedAndProject`, never a
    * global sort — lands in `outDir/batch_id=N` through dynamic
    * partition overwrite.
    *
    * Replay contract, both at-least-once modes: a SAME-CHECKPOINT replay
    * re-emits the same absolute totals (the state store versions per
    * batch), so the key-merge rewrites identical rows and the snapshot
    * partition overwrites itself; a FULL replay (fresh checkpoint, fresh
    * dirs, same source) rebuilds bit-identical integer state. Batch
    * parity and both legs are StatefulStreamSpec-pinned. The totals
    * table is entity-domain-sized; the snapshot is k rows per batch.
    */
  def leaderboardQuery(spark: SparkSession, srcDir: String,
                       totalsDir: String, outDir: String,
                       checkpointDir: String, k: Int,
                       globFilter: String = "events.parquet"): StreamingQuery =
    leaderboardTotals(readEvents(spark, srcDir, globFilter))
      .writeStream
      .outputMode("update")
      .foreachBatch { (updates: DataFrame, batchId: Long) =>
        // the merge consumes the batch twice (anti-join + union) and its
        // plan reaches back through the stateful fold to the source scan
        // — materialize once (the dedupClusters consumed-twice
        // discipline) so the state fold and the file read run one time
        // per micro-batch, not two
        val u = updates.localCheckpoint()
        graft.ops.Upsert.recoverIfNeeded(spark, totalsDir)
        graft.ops.Upsert.createIfNotExists(spark, totalsDir, u.schema)
        val merged = graft.ops.Upsert.merge(
          spark.read.parquet(totalsDir), u, Seq("key"))
        graft.ops.Upsert.atomicReplace(spark, merged, totalsDir)
        val snap = graft.ops.TopK.global(spark.read.parquet(totalsDir),
            Seq(col("units").desc, col("key").asc), k)
          .select(
            row_number().over(org.apache.spark.sql.expressions.Window
              .orderBy(col("units").desc, col("key").asc)).as("rank"),
            col("key"), col("n_events"),
            (col("units").cast("double") / 10000).as("engagement"))
          .withColumn("batch_id", lit(batchId))
        graft.ops.Upsert.overwritePartitions(snap, outDir, Seq("batch_id"))
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Shared commit protocol of the sketch-state family (hist / freq /
    * kll / theta): one PARTITION DIRECTORY per micro-batch
    * (`batch_id=N`), staged in a hidden `.tmp-N` dir, published by a
    * directory rename, and SEALED by a `_COMMITTED` marker file created
    * after the rename.
    *
    * Two failure modes of the old per-row append this closes (round-11
    * review findings):
    * - ATOMICITY: `mode("append")` could crash after SOME part files
    *   landed; the batch-id guard then saw the partial rows on replay
    *   and skipped the batch FOREVER — silent partial state. Here rows
    *   land in the tmp dir (invisible to readers), the rename publishes
    *   them, and the marker records that the publish COMPLETED.
    * - GUARD COST: the replay check was a scan of the WHOLE state table
    *   per trigger (grows with stream history); a marker existence test
    *   is O(1) at any history length.
    *
    * The marker is what makes the protocol hold on OBJECT STORES
    * (round-11 advice): S3A/GCS "rename" is a non-atomic copy+delete, so
    * a crash mid-rename can leave a PARTIAL batch_id=N directory — a
    * bare-directory existence guard would then skip the batch forever,
    * the exact silent-partial-state mode the protocol exists to close.
    * The guard therefore tests `batch_id=N/_COMMITTED` (written by a
    * single-file create, atomic on every store), and a guard miss with a
    * partial directory present DELETES and rewrites it. Readers between
    * a mid-rename crash and its replayed repair can observe the partial
    * partition — unavoidable without a reader-side manifest; the repair
    * converges the state, and on HDFS/local (atomic rename) the window
    * does not exist at all.
    *
    * Consumers are unchanged: `spark.read.parquet(stateDir)` discovers
    * `batch_id` as a partition column riding the directory names and
    * ignores the underscore-named marker.
    *
    * A `stateDir` written by the pre-round-11 per-row-append layout
    * (part files at the ROOT, batch_id as a data column) is detected and
    * refused on the first trigger: mixing root files with partition
    * directories breaks Spark's partition discovery, and the old rows
    * carry no directory for the guard to see — migrate by rewriting the
    * old rows into `batch_id=N` directories (one-shot, any N not reused
    * by the new checkpoint) before pointing the stream here.
    */
  private def guardedStateQuery(spark: SparkSession, events: DataFrame,
                                stateDir: String, checkpointDir: String)
      (build: DataFrame => DataFrame): StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val root = new org.apache.hadoop.fs.Path(stateDir)
        val fs = root.getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        if (fs.exists(root)) {
          val loose = fs.listStatus(root).filter(s =>
            s.isFile && !s.getPath.getName.startsWith("_"))
          require(loose.isEmpty,
            s"state dir $stateDir holds loose data files at the root " +
              s"(e.g. ${loose.head.getPath.getName}) — the pre-round-11 " +
              "per-row-append layout. Migrate once by rewriting those " +
              "rows into batch_id=N partition directories (with a " +
              "_COMMITTED marker in each), then restart the stream.")
        }
        val committed =
          new org.apache.hadoop.fs.Path(root, s"batch_id=$batchId")
        val marker =
          new org.apache.hadoop.fs.Path(committed, "_COMMITTED")
        if (!fs.exists(marker)) {
          // no marker + directory present = a crashed non-atomic rename
          // published a partial partition: repair by rewriting it whole
          if (fs.exists(committed)) fs.delete(committed, true)
          val tmp = new org.apache.hadoop.fs.Path(root, s".tmp-$batchId")
          build(batch).write.mode("overwrite").parquet(tmp.toString)
          if (!fs.rename(tmp, committed))
            throw new IllegalStateException(
              s"state commit rename failed: $tmp -> $committed")
          fs.create(marker, true).close()
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Quantile state as a continuously maintained table (the q98 pattern
    * fed by a stream): each micro-batch commits its OWN per-(key, day)
    * partial histograms as a `batch_id=N` partition of `stateDir` (the
    * [[guardedStateQuery]] protocol); because bucket-count merge is
    * exactly lossless, [[graft.ops.Agg.histQuantile]] over the
    * accumulated rows answers any percentile identically to one batch
    * pass over all events, no matter how the stream was chopped into
    * micro-batches (StreamingSpec asserts the equality). State growth is
    * one partition per batch — compact away with a periodic
    * re-aggregation if batch cadence is high; estimates are unaffected
    * at any compaction granularity, merge being lossless. `stateDir` is
    * owned by ONE checkpoint lineage: batch ids restart at 0 under a
    * fresh checkpoint, so never point a new checkpoint at old state.
    */
  def histStateQuery(spark: SparkSession, events: DataFrame,
                     stateDir: String, checkpointDir: String,
                     width: Double = 1.0): StreamingQuery =
    guardedStateQuery(spark, events, stateDir, checkpointDir)(
      graft.ops.Agg.dailyValueHist(_, width))

  /** The frequency twin of [[histStateQuery]]: per-micro-batch
    * heavy-hitters sketch rows ([[graft.ops.Agg.dailyTopSketches]])
    * appended to a parquet state table, batch-id-guarded so a replayed
    * trigger is a no-op instead of double-counting its events. Unlike
    * the histogram (whose merge is lossless at any batch granularity),
    * per-batch sketch partials carry per-batch error — the union's error
    * bound is the SUM of the partials' bounds, so the no-false-negative
    * contract survives replay/compaction but the bound is looser than
    * one sketch over the same events (StreamingSpec pins both: the
    * contract, and that replay does not widen it). Rollup/compaction is
    * the batch consume side, [[graft.ops.Agg.heavyHittersFromState]] —
    * the state table IS the interface between the two engines.
    */
  def freqStateQuery(spark: SparkSession, events: DataFrame,
                     stateDir: String, checkpointDir: String,
                     maxMapSize: Int = 64): StreamingQuery =
    guardedStateQuery(spark, events, stateDir, checkpointDir)(
      graft.ops.Agg.dailyTopSketches(_, maxMapSize))

  /** The quantile twin of [[freqStateQuery]], completing the streaming
    * sketch-state family (HLL: medallion dailySketches; heavy hitters:
    * freqStateQuery; quantiles: here): per-micro-batch KLL daily sketch
    * rows ([[graft.ops.Agg.dailyQuantileSketches]]) appended to a
    * parquet state table, batch-id-guarded so a replayed trigger is a
    * no-op instead of double-counting its events.
    *
    * What replay-stability MEANS here is the bound, not the bytes: KLL
    * compaction is randomized, so the same events re-sketched can yield
    * different (all individually valid) sketch bytes — but the guard
    * ensures each batch's events enter the state EXACTLY once, and the
    * KLL merge guarantee (rank error ≤ ε at fixed k through any merge
    * tree, no per-batch error summation — tighter than the freq-sketch
    * union, whose bounds add) makes every replayed run's rollup hold the
    * same 2ε certificate (StreamingSpec pins exactly that, mirroring
    * SketchSpec's parquet-round-trip leg). Consume side is SHARED with
    * batch: [[graft.ops.Agg.quantileSketchRollup]] reads the state rows
    * directly — the state table is the interface between the engines,
    * same as heavyHittersFromState.
    */
  def kllStateQuery(spark: SparkSession, events: DataFrame,
                    stateDir: String, checkpointDir: String,
                    k: Int = 200): StreamingQuery =
    guardedStateQuery(spark, events, stateDir, checkpointDir)(
      graft.ops.Agg.dailyQuantileSketches(_, k))

  /** Stream-static point-in-time enrichment: the streaming twin of
    * [[graft.ops.Joins.pointInTimeJoin]] — each arriving event joins the
    * SCD2 history version valid at its event time. The history is the
    * STATIC side (maintenance state, rebuilt/appended by the batch SCD2
    * path), so the join carries no stream state at all: Spark re-plans
    * the static side per micro-batch, the equality conjunct keeps it a
    * hash join, and exactly-once delivery is the file sink's commit log,
    * not a state store. Batch-parity is spec-pinned (chopped stream ≡
    * batch pointInTimeJoin over the same probes).
    */
  def pitEnrichQuery(probes: DataFrame, history: DataFrame,
                     keys: Seq[String], tsCol: String,
                     histCols: Seq[String], outDir: String,
                     checkpointDir: String): StreamingQuery =
    graft.ops.Joins.pointInTimeJoin(probes, history, keys, tsCol, histCols)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** The set-algebra member of the streaming sketch-state family (HLL:
    * medallion dailySketches; heavy hitters: [[freqStateQuery]];
    * quantiles: [[kllStateQuery]]; set algebra: here): per-micro-batch
    * theta daily sketch rows appended to a parquet state table behind
    * the same batch-id replay guard.
    *
    * Replay-stability here is the STRONGEST of the family — the bytes,
    * not just a bound: a theta sketch's ordered compact image is a
    * deterministic function of its input key SET (the retained set is
    * "hashes below the k-th smallest" — no randomized compaction like
    * KLL, no map-eviction order like the freq sketch), so a replayed
    * batch re-sketches to the byte-identical rows the guard then skips,
    * and ANY replayed run's state table is byte-equal, not merely
    * bound-equal (StreamingSpec pins state-table equality across a
    * fresh-checkpoint full replay). Consume side is SHARED with batch:
    * [[graft.ops.Agg.typeSetAlgebra]] unions the state rows directly.
    */
  def thetaStateQuery(spark: SparkSession, events: DataFrame,
                      stateDir: String, checkpointDir: String,
                      lgK: Int = graft.functions.ThetaSketch.DefaultLgK)
    : StreamingQuery =
    guardedStateQuery(spark, events, stateDir, checkpointDir)(
      graft.ops.Agg.dailyThetaSketches(_, lgK))

  /** The DETERMINISTIC member of the streaming sketch-state family
    * ([[freqStateQuery]]/[[kllStateQuery]]/[[thetaStateQuery]]): per
    * micro-batch KMV bottom-k daily state rows behind the same batch-id
    * replay guard. The replay contract matches theta's byte-identity
    * class and goes one step further — the state is a PLAIN
    * `array<bigint>` order statistic (no sketch image encoding), so a
    * fresh-checkpoint full replay rebuilds value-identical rows, the
    * consume side is shared with batch ([[graft.ops.Agg.kmvRollup]],
    * whose `kmv_k` guard also rides these state rows), and the rolled-up
    * estimate from chopped streaming state equals the direct batch
    * computation EXACTLY (the lossless bottom-k merge identity —
    * StreamingSpec pins all three legs).
    */
  def kmvStateQuery(spark: SparkSession, events: DataFrame,
                    stateDir: String, checkpointDir: String,
                    k: Int = 256): StreamingQuery =
    guardedStateQuery(spark, events, stateDir, checkpointDir)(
      graft.ops.Agg.dailyKmvSketches(_, k))
}
