package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.ops.Profile
import graft.streaming.DriftStream

/** Pins for the streaming PSI monitor: the persisted-reference split must
  * reproduce the batch [[Profile.driftBuckets]]/[[Profile.psi]] numbers
  * exactly, the monitor sink must converge under replay (dynamic
  * partition overwrite by batch_id), and the sidecar contract must fail
  * loudly rather than mis-bucket.
  */
class DriftStreamSpec extends SparkSpec {

  import spark.implicits._

  private val sf0001 = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("persisted-reference driftBatch == one-shot driftBuckets, psi identical") {
    val dir = java.nio.file.Files.createTempDirectory("driftref").toString + "/ref"
    val ref = docs.filter(col("doc_id") % 2 === 0)
    val cur = docs.filter(col("doc_id") % 2 === 1)
    DriftStream.writeDriftReference(ref, "n_chars", dir)
    val split = DriftStream.driftBatch(spark, cur, dir)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val oneShot = Profile.driftBuckets(ref, cur, "n_chars")
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(split == oneShot,
      "stored-reference buckets must equal the batch form's")
    val psiSplit = Profile.psi(DriftStream.driftBatch(spark, cur, dir))
      .collect()(0).getDouble(0)
    val psiBatch = Profile.psi(Profile.driftBuckets(ref, cur, "n_chars"))
      .collect()(0).getDouble(0)
    assert(psiSplit == psiBatch, "psi must be bit-identical through the split")
  }

  test("monitor stream: per-batch rows match the batch form; replay converges") {
    val root = java.nio.file.Files.createTempDirectory("driftmon").toString
    val src = s"$root/src"; val ref = s"$root/ref"; val out = s"$root/out"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    DriftStream.writeDriftReference(
      docs.filter(col("doc_id") % 2 === 0), "n_chars", ref)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("n_chars", LongType)))

    // wave 1: an in-distribution sample; wave 2: a shifted one
    val w1 = docs.filter(col("doc_id") % 4 === 1)
      .select(col("doc_id"), col("n_chars"))
    val w2 = docs.filter(col("doc_id") % 4 === 3)
      .select(col("doc_id"), (col("n_chars") * 3).as("n_chars"))
    w1.coalesce(1).write.parquet(s"$src/w1")
    DriftStream.monitorQuery(spark, s"$src/*", ref, out, s"$root/cp",
      schema).awaitTermination()
    w2.coalesce(1).write.parquet(s"$src/w2")
    DriftStream.monitorQuery(spark, s"$src/*", ref, out, s"$root/cp",
      schema).awaitTermination()

    val rows = spark.read.parquet(out)
      .withColumn("batch_id", col("batch_id").cast("long"))
      .collect().map(r => r.getAs[Long]("batch_id") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Double]("psi")))).toMap
    assert(rows.keySet == Set(0L, 1L), s"one monitor row per batch: $rows")
    // each row must equal the batch-form PSI of its own wave
    def psiOf(cur: org.apache.spark.sql.DataFrame): Double =
      Profile.psi(DriftStream.driftBatch(spark, cur, ref))
        .collect()(0).getDouble(0)
    assert(rows(0L) == ((w1.count(), psiOf(w1))))
    assert(rows(1L) == ((w2.count(), psiOf(w2))))
    // the shifted wave must read as shifted, the in-distribution one not
    assert(rows(1L)._2 > 0.25 && rows(0L)._2 < 0.1,
      s"psi must separate the shifted wave: $rows")

    // replay from a FRESH checkpoint: all files land in batch 0; the
    // monitor table converges to exactly the reprocessed content with no
    // duplicate rows (partition overwrite, not append)
    DriftStream.monitorQuery(spark, s"$src/*", ref, out, s"$root/cp2",
      schema).awaitTermination()
    val replayed = spark.read.parquet(out)
      .withColumn("batch_id", col("batch_id").cast("long")).collect()
    assert(replayed.map(_.getAs[Long]("batch_id")).toSet == Set(0L, 1L),
      "stale higher batches remain but batch 0 is overwritten in place")
    val b0 = replayed.filter(_.getAs[Long]("batch_id") == 0L)
    assert(b0.length == 1, s"replay must not duplicate monitor rows: ${b0.length}")
    val all = w1.unionByName(w2)
    assert(b0(0).getAs[Long]("n_rows") == all.count())
    assert(b0(0).getAs[Double]("psi") == psiOf(all))
  }

  test("persisted-reference ksBatch == one-shot ksDrift; sidecar guards") {
    val root = java.nio.file.Files.createTempDirectory("ksref").toString
    val dir = s"$root/ref"
    val ref = docs.filter(col("doc_id") % 2 === 0)
    val cur = docs.filter(col("doc_id") % 2 === 1)
    DriftStream.writeKsReference(ref, "n_chars", dir)
    val split = DriftStream.ksBatch(spark, cur, dir).collect()(0)
    val one = Profile.ksDrift(ref, cur, "n_chars").collect()(0)
    assert(split.getLong(0) == one.getLong(0) &&
      split.getDouble(1) == one.getDouble(1) &&
      split.getLong(2) == one.getLong(2) &&
      split.getLong(3) == one.getLong(3),
      s"stored-reference KS must equal the one-shot form: $split vs $one")
    // a dir without the sidecar is refused, naming the builder
    val bare = s"$root/bare"
    ref.select(col("n_chars").cast("long").as("v"), lit(1L).as("ca"))
      .limit(5).write.parquet(bare)
    val e = intercept[IllegalArgumentException] {
      DriftStream.ksBatch(spark, cur, bare)
    }
    assert(e.getMessage.contains("_KS_META"))
    // a batch missing the monitored column, and an empty batch, refuse
    intercept[IllegalArgumentException] {
      DriftStream.ksBatch(spark, cur.select(col("doc_id")), dir)
    }
    intercept[IllegalArgumentException] {
      DriftStream.ksBatch(spark, cur.limit(0), dir)
    }
    // an all-null reference cannot be persisted
    intercept[IllegalArgumentException] {
      DriftStream.writeKsReference(
        ref.withColumn("n_chars", lit(null).cast("long")), "n_chars",
        s"$root/nullref")
    }
  }

  test("ks monitor stream: rows match the batch form; replay converges") {
    val root = java.nio.file.Files.createTempDirectory("ksmon").toString
    val src = s"$root/src"; val ref = s"$root/ref"; val out = s"$root/out"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    DriftStream.writeKsReference(
      docs.filter(col("doc_id") % 2 === 0), "n_chars", ref)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("n_chars", LongType)))
    val w1 = docs.filter(col("doc_id") % 4 === 1)
      .select(col("doc_id"), col("n_chars"))
    val w2 = docs.filter(col("doc_id") % 4 === 3)
      .select(col("doc_id"), (col("n_chars") * 3).as("n_chars"))
    w1.coalesce(1).write.parquet(s"$src/w1")
    DriftStream.ksMonitorQuery(spark, s"$src/*", ref, out, s"$root/cp",
      schema).awaitTermination()
    w2.coalesce(1).write.parquet(s"$src/w2")
    DriftStream.ksMonitorQuery(spark, s"$src/*", ref, out, s"$root/cp",
      schema).awaitTermination()
    val rows = spark.read.parquet(out)
      .withColumn("batch_id", col("batch_id").cast("long"))
      .collect().map(r => r.getAs[Long]("batch_id") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Double]("d_stat")))).toMap
    assert(rows.keySet == Set(0L, 1L), s"one monitor row per batch: $rows")
    def dOf(cur: org.apache.spark.sql.DataFrame): Double =
      DriftStream.ksBatch(spark, cur, ref).collect()(0).getDouble(1)
    assert(rows(0L) == ((w1.count(), dOf(w1))))
    assert(rows(1L) == ((w2.count(), dOf(w2))))
    // the tripled wave must read as more drifted than the in-dist one
    assert(rows(1L)._2 > rows(0L)._2,
      s"KS must separate the shifted wave: $rows")
    // replay from a fresh checkpoint: batch 0 overwritten with the
    // full-drain content, no duplicate rows
    DriftStream.ksMonitorQuery(spark, s"$src/*", ref, out, s"$root/cp2",
      schema).awaitTermination()
    val replayed = spark.read.parquet(out)
      .withColumn("batch_id", col("batch_id").cast("long")).collect()
    val b0 = replayed.filter(_.getAs[Long]("batch_id") == 0L)
    assert(b0.length == 1, s"replay must not duplicate rows: ${b0.length}")
    val all = w1.unionByName(w2)
    assert(b0(0).getAs[Long]("n_rows") == all.count())
    assert(b0(0).getAs[Double]("d_stat") == dOf(all))
  }

  test("rotation store: series == per-version driftBuckets; monotonic guard") {
    val root = java.nio.file.Files.createTempDirectory("driftrot").toString + "/store"
    val r1 = docs.filter(col("doc_id") % 4 === 0)
    val r2 = docs.filter(col("doc_id") % 4 === 2)
    val cur = docs.filter(col("doc_id") % 2 === 1)
    // empty store: no versions, series refuses
    assert(DriftStream.referenceVersions(spark, root).isEmpty)
    intercept[IllegalArgumentException] {
      DriftStream.driftSeries(spark, cur, root)
    }
    DriftStream.rotateDriftReference(r1, "n_chars", root, 10L)
    DriftStream.rotateDriftReference(r2, "n_chars", root, 20L)
    assert(DriftStream.referenceVersions(spark, root) === Seq(10L, 20L))
    assert(DriftStream.latestReferenceVersion(spark, root).contains(20L))
    // rotation is append-only monotonic: re-publish and backwards refused
    intercept[IllegalArgumentException] {
      DriftStream.rotateDriftReference(r1, "n_chars", root, 20L)
    }
    intercept[IllegalArgumentException] {
      DriftStream.rotateDriftReference(r1, "n_chars", root, 5L)
    }
    // the one-scan series equals the per-version batch form exactly
    val series = DriftStream.driftSeries(spark, cur, root)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    Seq(10L -> r1, 20L -> r2).foreach { case (v, ref) =>
      val single = Profile.driftBuckets(ref, cur, "n_chars")
        .collect().map(r => (v, r.getInt(0)) ->
          ((r.getLong(1), r.getLong(2)))).toMap
      assert(single.forall { case (k, c) => series.get(k).contains(c) } &&
        series.count(_._1._1 == v) == single.size,
        s"series counts for version $v must equal the single-reference form")
    }
    // a half-written rotation (missing sidecar) fails loudly, not skipped
    val bad = new org.apache.hadoop.fs.Path(root, "v=30")
    val fs = bad.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(bad)
    val e = intercept[IllegalArgumentException] {
      DriftStream.referenceVersions(spark, root)
    }
    assert(e.getMessage.contains("half-written"))
    fs.delete(bad, true)
  }

  test("rotating monitor: version switches mid-stream; stale store refused") {
    val root = java.nio.file.Files.createTempDirectory("driftrotmon").toString
    val store = s"$root/store"; val src = s"$root/src"; val out = s"$root/out"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("n_chars", LongType)))
    DriftStream.rotateDriftReference(
      docs.filter(col("doc_id") % 4 === 0), "n_chars", store, 1L)
    val w1 = docs.filter(col("doc_id") % 4 === 1)
      .select(col("doc_id"), col("n_chars"))
    val w2 = docs.filter(col("doc_id") % 4 === 3)
      .select(col("doc_id"), col("n_chars"))
    w1.coalesce(1).write.parquet(s"$src/w1")
    DriftStream.monitorQueryRotating(spark, s"$src/*", store, out,
      s"$root/cp", schema).awaitTermination()
    // rotate between batches: the next batch must carry the new version
    DriftStream.rotateDriftReference(
      docs.filter(col("doc_id") % 4 === 2), "n_chars", store, 2L)
    w2.coalesce(1).write.parquet(s"$src/w2")
    DriftStream.monitorQueryRotating(spark, s"$src/*", store, out,
      s"$root/cp", schema).awaitTermination()
    val rows = spark.read.parquet(out)
      .select(col("batch_id").cast("long"),
        col("reference_version").cast("long"), col("n_rows").cast("long"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(rows(0L)._1 == 1L && rows(1L)._1 == 2L,
      s"batches must record the reference version that scored them: $rows")
    assert(rows(0L)._2 == w1.count() && rows(1L)._2 == w2.count())
    // each batch's monitor row equals the single-reference batch form
    // against the version that scored it
    val psi2 = Profile.psi(Profile.driftBuckets(
      docs.filter(col("doc_id") % 4 === 2), w2, "n_chars"))
      .collect()(0).getDouble(0)
    val got2 = spark.read.parquet(out)
      .filter(col("batch_id") === 1L).collect()(0).getAs[Double]("psi")
    assert(got2 == psi2, "rotated-version psi must match the batch form")
    // staleness floor: a store whose latest is below minVersion refuses
    val w3 = docs.filter(col("doc_id") % 4 === 0)
      .select(col("doc_id"), col("n_chars"))
    w3.coalesce(1).write.parquet(s"$src/w3")
    val q = DriftStream.monitorQueryRotating(spark, s"$src/*", store, out,
      s"$root/cp", schema, minVersion = 99L)
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    assert(err.getMessage.contains("freshness") ||
      Option(err.getCause).exists(_.getMessage.contains("freshness")),
      s"stale store must refuse to score: ${err.getMessage}")
  }

  test("sidecar contract: missing meta, corrupt meta, missing column fail loudly") {
    val root = java.nio.file.Files.createTempDirectory("driftbad").toString
    val ref = s"$root/ref"
    DriftStream.writeDriftReference(
      docs.filter(col("doc_id") % 2 === 0), "n_chars", ref)
    // missing monitored column
    val e1 = intercept[IllegalArgumentException] {
      DriftStream.driftBatch(spark,
        Seq((1L, "x")).toDF("doc_id", "text"), ref)
    }
    assert(e1.getMessage.contains("n_chars"))
    // bare parquet dir without the sidecar
    val bare = s"$root/bare"
    docs.limit(3).select(col("n_chars")).write.parquet(bare)
    val e2 = intercept[IllegalArgumentException] {
      DriftStream.driftBatch(spark, docs, bare)
    }
    assert(e2.getMessage.contains("_DRIFT_META"))
    // corrupt: edge count disagreeing with nBuckets
    val p = new org.apache.hadoop.fs.Path(ref, "_DRIFT_META")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    out.write("n_chars\n10\n1.0\n2.0\n".getBytes("UTF-8")); out.close()
    val e3 = intercept[IllegalArgumentException] {
      DriftStream.driftBatch(spark, docs, ref)
    }
    assert(e3.getMessage.contains("corrupt"))
    // truncated sidecar (interrupted write): still the diagnostic, not
    // an index exception
    val out2 = fs.create(p, true)
    out2.write("n_chars\n".getBytes("UTF-8")); out2.close()
    val e4 = intercept[IllegalArgumentException] {
      DriftStream.driftBatch(spark, docs, ref)
    }
    assert(e4.getMessage.contains("corrupt"))
    // an empty reference is refused at write time
    val e5 = intercept[IllegalArgumentException] {
      DriftStream.writeDriftReference(docs.filter(col("doc_id") < 0),
        "n_chars", s"$root/empty")
    }
    assert(e5.getMessage.contains("cannot be empty"))
    // non-numeric sidecar content: the 'corrupt' diagnostic, not a raw
    // NumberFormatException
    val out3 = fs.create(p, true)
    out3.write("n_chars\nten\n1.0\n".getBytes("UTF-8")); out3.close()
    val e6 = intercept[IllegalArgumentException] {
      DriftStream.driftBatch(spark, docs, ref)
    }
    assert(e6.getMessage.contains("corrupt"))
    val out4 = fs.create(p, true)
    out4.write("n_chars\n3\n1.0\noops\n".getBytes("UTF-8")); out4.close()
    val e7 = intercept[IllegalArgumentException] {
      DriftStream.driftBatch(spark, docs, ref)
    }
    assert(e7.getMessage.contains("corrupt"))
    // a column name that would corrupt the sidecar (newline) or the
    // percentile expr (quote) is refused at write time
    val e8 = intercept[IllegalArgumentException] {
      DriftStream.writeDriftReference(
        docs.withColumnRenamed("n_chars", "n\nchars"), "n\nchars",
        s"$root/badcol")
    }
    assert(e8.getMessage.contains("must not contain"))
  }

  test("gated incremental baseline: absorb, refuse+latch, ratchet, swap safety") {
    val root = java.nio.file.Files.createTempDirectory("driftbase").toString
    val dir = s"$root/base"
    val s0 = docs.filter(col("doc_id") % 4 === 0)
    DriftStream.writeDriftReference(s0, "n_chars", dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val metaP = new org.apache.hadoop.fs.Path(dir, "_DRIFT_META")
    val fs = metaP.getFileSystem(conf)
    def readFile(p: org.apache.hadoop.fs.Path): String = {
      val in = fs.open(p)
      try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      finally in.close()
    }
    val metaBefore = readFile(metaP)

    // step 1: in-distribution batch ABSORBS — the stored histogram must
    // equal hist(s0 ∪ b1) under s0's FROZEN edges (the lossless merge)
    val b1 = docs.filter(col("doc_id") % 4 === 1)
    assert(DriftStream.updateDriftBaseline(spark, dir, b1, maxPsi = 0.5,
      tag = "b1"), "in-distribution batch must absorb")
    val expect = Profile.driftBuckets(s0, s0.unionByName(b1), "n_chars")
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    val stored = spark.read.parquet(dir)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(stored == expect,
      s"merged histogram must be hist(ref UNION batch): $stored vs $expect")
    // the frozen sidecar survived the staged swap byte-for-byte
    assert(readFile(metaP) == metaBefore,
      "sidecar must survive the accepted-path swap unchanged")
    assert(!DriftStream.baselineLatched(spark, dir))

    // step 2: drifted batch REFUSES and LATCHES; the store is unchanged
    val b2 = docs.filter(col("doc_id") % 4 === 2)
      .withColumn("n_chars", col("n_chars") * 3)
    assert(!DriftStream.updateDriftBaseline(spark, dir, b2, maxPsi = 0.5,
      tag = "b2"), "drifted batch must refuse")
    assert(DriftStream.baselineLatched(spark, dir))
    val afterRefuse = spark.read.parquet(dir)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(afterRefuse == stored, "a refused batch must not touch counts")
    val latchP = new org.apache.hadoop.fs.Path(dir, "_DRIFT_LATCH")
    assert(readFile(latchP).startsWith("b2\n"),
      "latch must record the refusing batch's provenance")

    // step 3: IN-BAND batch refused BY THE LATCH alone — the ratchet.
    // Sanity first: the threshold by itself would accept it.
    val b3 = docs.filter(col("doc_id") % 4 === 3)
    val psi3 = Profile.psi(DriftStream.driftBatch(spark, b3, dir))
      .collect()(0).getDouble(0)
    assert(psi3 <= 0.5, s"fixture drifted: step-3 psi $psi3 not in-band")
    assert(!DriftStream.updateDriftBaseline(spark, dir, b3, maxPsi = 0.5,
      tag = "b3"), "latched baseline must refuse even in-band batches")
    assert(readFile(latchP).startsWith("b2\n"),
      "later refusals must not overwrite the original latch provenance")
    // scoring still works while latched (refuse-to-absorb, not
    // refuse-to-monitor)
    assert(DriftStream.driftBatch(spark, b3, dir).count() > 0)
    // rebuild clears the latch (retrain-by-restart)
    DriftStream.writeDriftReference(s0, "n_chars", dir)
    assert(!DriftStream.baselineLatched(spark, dir),
      "a rebuilt reference must start unlatched")
  }
}
