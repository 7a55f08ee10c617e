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

  private val LatchFile = "_DRIFT_LATCH"

  /** True iff a refused update has LATCHED this baseline (see
    * [[updateDriftBaseline]]).
    */
  def baselineLatched(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir, LatchFile)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Gated INCREMENTAL baseline update — the third reference posture,
    * between the frozen snapshot ([[writeDriftReference]]) and full
    * replacement ([[rotateDriftReference]]): an in-distribution batch is
    * ABSORBED into the stored histogram (counts add — the lossless,
    * order-free merge; the EDGES stay frozen, so every past and future
    * bucket is the same geometry and the merged histogram is exactly
    * hist(reference ∪ absorbed batches)), while a drifted batch is
    * refused AND the refusal LATCHES the baseline. The latch is the
    * ratchet monitoring needs: without it, an auto-refreshing baseline
    * normalizes a slow drift one under-threshold step at a time, and
    * the batches that arrive AFTER a refusal are a mixture the monitor
    * cannot decompose — so after one refusal the baseline stops
    * absorbing entirely (later in-band batches are still SCORED, just
    * not merged) until an operator rebuilds or rotates a fresh
    * reference, the retrain-by-restart posture everywhere else in this
    * engine (benchmark keys, contamination flags, takedown ledger).
    *
    * Returns true iff the batch was absorbed. The accepted-path rewrite
    * stages the full artifact (merged histogram + the UNCHANGED sidecar)
    * in a temp dir and swaps by rename — a reader never observes a
    * histogram-without-sidecar; a crash between renames leaves `.old`
    * for [[graft.ops.Upsert.recoverIfNeeded]], which runs on entry.
    * Single-writer contract, like every maintenance op here. Per-update
    * cost: one map-side histogram of the batch + an nBuckets-row join —
    * never a reference rescan (the histogram IS the state).
    */
  def updateDriftBaseline(spark: SparkSession, dir: String,
                          batch: DataFrame, maxPsi: Double = 0.25,
                          tag: String = ""): Boolean = {
    graft.ops.Upsert.recoverIfNeeded(spark, dir)
    val aligned = driftBatch(spark, batch, dir).localCheckpoint()
    val psiVal = Profile.psi(aligned).collect()(0).getDouble(0)
    val conf = spark.sparkContext.hadoopConfiguration
    val target = new org.apache.hadoop.fs.Path(dir)
    val fs = target.getFileSystem(conf)
    if (baselineLatched(spark, dir) || psiVal > maxPsi) {
      if (!baselineLatched(spark, dir)) {
        // the ratchet instant: record WHAT refused first (provenance an
        // operator reads before deciding to rotate); later refusals
        // keep the original latch
        val out = fs.create(new org.apache.hadoop.fs.Path(dir, LatchFile),
          false)
        try out.write(s"$tag\n$psiVal\n".getBytes("UTF-8"))
        finally out.close()
      }
      false
    } else {
      val merged = aligned.select(col("bucket"),
        (col("n_ref") + col("n_cur")).as("n_ref"))
      val tmp = dir + ".tmp-" + java.util.UUID.randomUUID().toString.take(8)
      merged.write.parquet(tmp)
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(dir, MetaFile), fs,
        new org.apache.hadoop.fs.Path(tmp, MetaFile), false, conf)
      val trash = new org.apache.hadoop.fs.Path(dir + ".old")
      fs.delete(trash, true)
      if (!fs.rename(target, trash))
        throw new java.io.IOException(s"rename failed: $target -> $trash")
      if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), target))
        throw new java.io.IOException(s"rename failed: $tmp -> $target")
      fs.delete(trash, true)
      true
    }
  }

  // ---- Multi-reference rotation (the production monitoring shape) ----
  //
  // One frozen reference goes stale: production drift monitoring ROTATES
  // references (e.g. weekly re-freezes of the curated corpus) and reads
  // the PSI as a series per reference version — "new intake vs last
  // week" AND "vs the week before" disambiguates intake drift from
  // reference drift. The store is a versioned directory family
  // `root/v=<version>/`, each member a full [[writeDriftReference]]
  // artifact (histogram + sidecar), so every existing single-reference
  // consumer works on a member unchanged.

  /** The versions present in a reference store, ascending — the generic
    * [[graft.sources.VersionedStore.versions]] listing (one definition
    * of the `v=` naming contract, review finding) plus this store's own
    * validation layer: a `v=` dir missing its sidecar is a half-written
    * rotation — refused loudly rather than silently skipped (it would
    * otherwise vanish from the series and from
    * [[latestReferenceVersion]] freshness checks).
    */
  def referenceVersions(spark: SparkSession, rootDir: String): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(rootDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vs = graft.sources.VersionedStore.versions(spark, rootDir)
    vs.foreach(v =>
      require(fs.exists(new org.apache.hadoop.fs.Path(s"$rootDir/v=$v/$MetaFile")),
        s"drift reference store $rootDir: version dir v=$v " +
          s"lacks $MetaFile — a half-written rotation; delete or rebuild it"))
    vs
  }

  /** Latest version in the store, if any. */
  def latestReferenceVersion(spark: SparkSession,
                             rootDir: String): Option[Long] =
    referenceVersions(spark, rootDir).lastOption

  /** Rotate in a new reference: append-only and strictly monotonic —
    * re-publishing an existing version or rotating "backwards" is a
    * deployment error that would silently re-baseline history, so both
    * are refused. The member is a full [[writeDriftReference]] artifact,
    * STAGED under a dot-prefixed temp dir and published by one directory
    * rename (the sketch-state commit discipline): a monitor listing the
    * store mid-rotation either sees the complete new version or none of
    * it, never the histogram-without-sidecar window the in-place write
    * order would expose.
    */
  def rotateDriftReference(ref: DataFrame, valueCol: String,
                           rootDir: String, version: Long,
                           nBuckets: Int = 10): Unit = {
    val spark = ref.sparkSession
    // check against the SIDECAR-VALIDATED listing first (a half-written
    // member must fail the referenceVersions require, not be silently
    // treated as absent by the generic store's name-only listing)
    latestReferenceVersion(spark, rootDir).foreach(latest =>
      require(version > latest,
        s"rotateDriftReference: version $version is not after the " +
          s"store's latest $latest — rotation is append-only monotonic"))
    graft.sources.VersionedStore.publish(spark, rootDir, version)(tmp =>
      writeDriftReference(ref, valueCol, tmp, nBuckets))
    ()
  }

  /** One batch scored against EVERY reference version in the store —
    * the PSI-series counting artifact: (reference_version, bucket,
    * n_ref, n_cur), all-integer, hash-exact. The batch is scanned ONCE
    * for all versions (each row emits one (version, bucket) pair per
    * version via a single explode — the [[graft.ops.Profile
    * .driftBucketsMulti]] discipline applied across versions instead of
    * columns); the reference side is the stored histograms, version-
    * tagged and unioned (nBuckets rows per version — tiny). All
    * versions must monitor the same column (a store mixing columns is
    * corrupt, refused). Empty buckets survive per version (full outer +
    * zero-fill). Feed [[graft.ops.Profile.psi]] per version for the
    * scalar series.
    */
  def driftSeries(spark: SparkSession, batch: DataFrame,
                  rootDir: String): DataFrame = {
    val versions = referenceVersions(spark, rootDir)
    require(versions.nonEmpty,
      s"driftSeries: reference store $rootDir has no versions — rotate " +
        "one in with rotateDriftReference")
    val metas = versions.map(v => v -> readMeta(spark, s"$rootDir/v=$v"))
    val cols = metas.map(_._2._1).distinct
    require(cols.size == 1,
      s"driftSeries: store $rootDir mixes monitored columns " +
        s"${cols.mkString(", ")} — one store monitors one column")
    val valueCol = cols.head
    require(batch.columns.contains(valueCol),
      s"drift monitor: batch lacks the reference's monitored column " +
        s"'$valueCol' (batch columns: ${batch.columns.mkString(", ")})")
    val curHist = batch
      .select(explode(array(metas.map { case (v, (_, _, edges)) =>
        struct(lit(v).as("reference_version"),
          Profile.bucketOf(valueCol, edges).as("bucket")) }: _*)).as("_vb"))
      .groupBy(col("_vb.reference_version").as("reference_version"),
        col("_vb.bucket").as("bucket"))
      .agg(count(lit(1)).as("n_cur"))
    val refHist = versions.map(v =>
        spark.read.parquet(s"$rootDir/v=$v")
          .select(lit(v).as("reference_version"), col("bucket"),
            col("n_ref")))
      .reduce(_.unionByName(_))
    refHist.join(curHist, Seq("reference_version", "bucket"), "full_outer")
      .select(col("reference_version"), col("bucket"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
  }

  /** The rotating monitor stream: per micro-batch, one
    * (batch_id, reference_version, n_rows, psi) row scored against the
    * store's LATEST version at batch time — so a rotation mid-stream
    * switches later batches to the new reference, and the row records
    * WHICH reference scored it (the series key). `minVersion` is the
    * staleness contract: a monitor that silently keeps scoring against
    * an ancient reference blesses drift, so each batch REFUSES to score
    * when the store's latest version is below the floor (fail loudly,
    * the constraint-gate posture). Same replay/idempotence sink contract
    * as [[monitorQuery]] given an unchanged store; a replay after a
    * rotation re-scores against the new latest — the monitor table is a
    * VIEW of the current store, re-derivable by construction.
    */
  def monitorQueryRotating(spark: SparkSession, srcDir: String,
                           refRoot: String, outDir: String,
                           checkpointDir: String, schema: StructType,
                           minVersion: Long = Long.MinValue): StreamingQuery =
    spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val latest = latestReferenceVersion(spark, refRoot).getOrElse(
          throw new IllegalArgumentException(
            s"rotating drift monitor: store $refRoot has no versions"))
        require(latest >= minVersion,
          s"rotating drift monitor: store $refRoot latest version " +
            s"$latest is below the freshness floor $minVersion — " +
            "rotate a new reference in before monitoring")
        graft.ops.Upsert.overwritePartitions(
          monitorRow(spark, batch, s"$refRoot/v=$latest")
            .withColumn("reference_version", lit(latest))
            .withColumn("batch_id", lit(batchId)),
          outDir, Seq("batch_id"))
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  // ---- Persisted-reference exact KS (the q173 pattern, bucket-free) ----
  //
  // PSI's persisted state is a bucket histogram — tiny, but quantized by
  // the frozen edge geometry. The EXACT KS needs the reference's full
  // per-value count table; that IS its sufficient statistic, and as
  // aggregate state (one row per distinct monitored value) it persists
  // once and is never rescanned per batch. The bounded-state alternative
  // when the value domain is huge is [[graft.ops.Profile.ksDriftSketch]]
  // with a persisted KLL sketch row — exact-persisted and
  // sketch-persisted forms of one family.

  private val KsMetaFile = "_KS_META"

  /** Persist the reference side of [[graft.ops.Profile.ksDrift]]: the
    * per-value counts `(v, ca)` (values cast to LONG — the integral
    * discipline) plus a `_KS_META` sidecar carrying the monitored column
    * and the reference row total, so a probe never re-aggregates state
    * for metadata.
    */
  def writeKsReference(ref: DataFrame, valueCol: String, dir: String): Unit = {
    val spark = ref.sparkSession
    Profile.requirePlainName(valueCol, "writeKsReference")
    Profile.requireIntegralColumn(ref, valueCol, "writeKsReference")
    val counts = ref.select(col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("v")).agg(count(lit(1)).as("ca"))
      .localCheckpoint() // one ref scan feeds both the write and the total
    // validate BEFORE the write: the reverse order left a counts table
    // without its sidecar on an empty reference — a partial artifact
    // whose later probes blamed the wrong function (review finding)
    val na = counts.agg(coalesce(sum(col("ca")), lit(0L))).head().getLong(0)
    require(na > 0,
      s"writeKsReference: reference has no non-null $valueCol rows")
    counts.write.mode("overwrite").parquet(dir)
    val p = new org.apache.hadoop.fs.Path(dir, KsMetaFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s"$valueCol\n$na\n".getBytes("UTF-8"))
    finally out.close()
  }

  private def readKsMeta(spark: SparkSession,
                         dir: String): (String, Long) = {
    val p = new org.apache.hadoop.fs.Path(dir, KsMetaFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"KS reference at $dir lacks $KsMetaFile — build it with " +
        "DriftStream.writeKsReference")
    val in = fs.open(p)
    val lines =
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        "UTF-8").split("\n").map(_.trim).filter(_.nonEmpty)
      finally in.close()
    require(lines.length == 2,
      s"KS reference at $dir is corrupt: sidecar has ${lines.length} " +
        "line(s), want 2")
    val na =
      try lines(1).toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"KS reference at $dir is corrupt: non-numeric total '${lines(1)}'")
      }
    (lines(0), na)
  }

  /** One batch's exact KS against the stored reference — output ≡
    * [[graft.ops.Profile.ksDrift]](ref, batch) by construction (the
    * shared `ksSup` tail guarantees the statistic cannot diverge from
    * the one-shot form; q195's green oracle row is the proof). Per
    * batch: one map-side count aggregate of the batch's own values +
    * the stored count table, through the range-partitioned cumulation —
    * the reference is never rescanned.
    */
  def ksBatch(spark: SparkSession, batch: DataFrame,
              refDir: String): DataFrame = {
    val (valueCol, na) = readKsMeta(spark, refDir)
    require(batch.columns.contains(valueCol),
      s"KS monitor: batch lacks the reference's monitored column " +
        s"'$valueCol' (batch columns: ${batch.columns.mkString(", ")})")
    Profile.requireIntegralColumn(batch, valueCol, "ksBatch")
    val refCounts = spark.read.parquet(refDir).withColumn("cb", lit(0L))
    val curCounts = batch.select(col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("v")).agg(count(lit(1)).as("cb"))
      .withColumn("ca", lit(0L))
    val u = refCounts.unionByName(curCounts)
      .groupBy(col("v"))
      .agg(sum(col("ca")).as("ca"), sum(col("cb")).as("cb"))
      .localCheckpoint()
    val nb = u.agg(coalesce(sum(col("cb")), lit(0L))).head().getLong(0)
    require(nb > 0,
      s"KS monitor: batch has no non-null $valueCol rows")
    Profile.ksSup(u, na, nb, numPartitions = 0)
  }

  /** The KS monitor stream: per micro-batch, one
    * (batch_id, n_rows, d_stat) row scored against the persisted
    * reference — the bucket-free twin of [[monitorQuery]], same
    * batch_id-partitioned replay-convergent sink contract.
    */
  def ksMonitorQuery(spark: SparkSession, srcDir: String, refDir: String,
                     outDir: String, checkpointDir: String,
                     schema: StructType): StreamingQuery =
    spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.Upsert.overwritePartitions(
          ksBatch(spark, batch, refDir)
            .select(col("n_cur").as("n_rows"), col("d_stat"))
            .withColumn("batch_id", lit(batchId)),
          outDir, Seq("batch_id"))
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

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
