package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.sources.Tables

/** North-star multimodal plumbing: binary columns, batched decode stub,
  * frame sampling, resize planning.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val assets =
    Multimodal.syntheticAssets(Tables.load(spark, "/root/testdata/sf0.001", "documents"))

  test("syntheticAssets carries a 16-byte binary payload + typed metadata") {
    val r = assets.select(length(col("payload")).as("n"), col("kind")).collect()
    assert(r.forall(_.getAs[Int]("n") == 16))
    assert(r.map(_.getAs[String]("kind")).toSet == Set("image", "audio", "video"))
  }

  test("extractFeatures is deterministic and batch-size independent") {
    val ds = assets.as[Multimodal.Asset]
    val a = Multimodal.extractFeatures(spark, ds, batchSize = 7)
      .collect().map(f => f.asset_id -> f.feature.toSeq).toMap
    val b = Multimodal.extractFeatures(spark, ds, batchSize = 64)
      .collect().map(f => f.asset_id -> f.feature.toSeq).toMap
    assert(a == b, "batch size must not change results")
    assert(a.values.forall(_.length == 8))
  }

  test("decodeBatchStub folds payload bytes deterministically") {
    val asset = Multimodal.Asset(1L, "image", Array[Byte](0, -1, 16), 1, 1, 0L)
    val f = Multimodal.decodeBatchStub(Seq(asset)).head
    assert(f.n_bytes == 3)
    assert(f.feature(0) == 0.0f && f.feature(1) == 255.0f && f.feature(2) == 16.0f)
  }

  test("sampleFrames explodes only video assets at the sample interval") {
    val ds = assets.as[Multimodal.Asset]
    val frames = Multimodal.sampleFrames(spark, ds, everyMs = 1000L)
    val perAsset = frames.groupByKey(_.asset_id).count().collect().toMap
    val vids = ds.filter(_.kind == "video").collect()
    assert(perAsset.keySet == vids.map(_.asset_id).toSet)
    vids.foreach { v =>
      assert(perAsset(v.asset_id) == (v.duration_ms / 1000L) + 1)
    }
  }

  test("resizePlan caps the long side at 224 and preserves aspect ratio") {
    val out = Multimodal.resizePlan(assets).collect()
    out.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (tw, th) = (r.getAs[Int]("target_w"), r.getAs[Int]("target_h"))
      assert(math.max(tw, th) <= 224)
      if (math.max(w, h) <= 224) assert(tw == w && th == h)
    }
  }

  test("pHash near-dup: banded search equals brute-force hamming pairs") {
    val hashes = Multimodal.perceptualHashes(
      spark, assets.as[Multimodal.Asset])
    // exact-dup texts in the documents table give identical payloads →
    // identical hashes, so the pair set is non-trivial at hamming 0
    def pairs(d: Int) = Multimodal.nearDupByPHash(hashes, maxHamming = d)
      .as[(Long, Long, Int)].collect().toSet
    def brute(d: Int) = Multimodal.nearDupByPHashExact(hashes, d)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs(0).nonEmpty, "expected exact-dup assets at hamming 0")
    // pigeonhole completeness + popcount-verified precision, at the
    // boundary (3 = 4 bands − 1) and in the middle
    Seq(0, 2, 3).foreach { d =>
      assert(pairs(d) == brute(d), s"banded != brute at maxHamming=$d")
    }
    // hashes are deterministic across recompute (stable dedup keys)
    val again = Multimodal.perceptualHashes(spark, assets.as[Multimodal.Asset])
      .as[(Long, String, Long)].collect().toSet
    assert(again == hashes.as[(Long, String, Long)].collect().toSet)
  }

  test("videoNearDup: containment overlap, symmetric-free pairs, self-parity") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val fh = Multimodal.frameFingerprints(Multimodal.syntheticVideoFrames(docs))
    val out = Multimodal.videoNearDup(fh, minOverlap = 0.3)
      .collect()
    assert(out.nonEmpty, "corpus near-dup docs must surface video pairs")
    out.foreach { r =>
      val (a, b) = (r.getAs[Long]("asset_a"), r.getAs[Long]("asset_b"))
      val ov = r.getAs[Double]("overlap")
      assert(a < b, "pairs must be canonical (a < b)")
      assert(ov >= 0.3 && ov <= 1.0, s"overlap out of range: $ov")
    }
    // a video duplicated verbatim must match itself with overlap 1.0
    val twin = fh.union(fh.withColumn("asset_id", col("asset_id") + 1000000L))
    val self = Multimodal.videoNearDup(twin, minOverlap = 0.99)
      .filter(col("asset_b") === col("asset_a") + 1000000L)
    assert(self.count() == fh.select("asset_id").distinct().count(),
      "every verbatim twin must self-match at overlap 1.0")
  }

  test("videoNearDup banded path equals brute-force at d in {0,2,3}") {
    // synthetic WIDE (56-bit) frame fingerprints — the real-DCT regime
    // the banded switch exists for. 12 base videos of 20 random frames;
    // video 100+i re-encodes video i with <=2 bits flipped per frame
    // (compression noise); video 200 shares a 10-frame clip with video 0
    // flipped by 3 bits. Seeded RNG: deterministic fixture.
    val rnd = new scala.util.Random(421)
    val mask56 = (1L << 56) - 1
    val base = (0 until 12).map(v =>
      v.toLong -> Array.fill(20)(rnd.nextLong() & mask56))
    def flip(h: Long, nBits: Int, r: scala.util.Random): Long = {
      var out = h
      (0 until nBits).foreach(_ => out ^= 1L << r.nextInt(56))
      out
    }
    val noisy = base.take(6).map { case (v, hs) =>
      (v + 100L) -> hs.map(h => flip(h, rnd.nextInt(3), rnd))
    }
    val clip = Seq(200L -> base.head._2.take(10).map(h => {
      var out = h
      // exactly 3 DISTINCT bit positions → hamming exactly 3
      Seq(3, 17, 42).foreach(b => out ^= 1L << b)
      out
    }))
    val rows = (base ++ noisy ++ clip).flatMap { case (v, hs) =>
      hs.zipWithIndex.map { case (h, i) => (v, i, h) }
    }
    val fh = rows.toDF("asset_id", "frame_index", "fhash")
    Seq(0, 2, 3).foreach { d =>
      val banded = Multimodal.videoNearDup(fh, minOverlap = 0.3,
          maxAssetsPerHash = 64, maxHamming = d)
        .as[(Long, Long, Long, Double)].collect().toSet
      val brute = Multimodal.videoNearDupExact(fh, minOverlap = 0.3,
          maxAssetsPerHash = 64, maxHamming = d)
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(banded == brute, s"banded != brute-force at maxHamming=$d")
      if (d >= 2) assert(banded.exists(p => p._1 < 100 && p._2 < 200 && p._2 >= 100),
        s"noisy re-encodes must surface at d=$d")
      if (d == 3) assert(banded.exists(_._2 == 200L),
        "the 3-bit-flipped clip must surface exactly at d=3")
      else assert(!banded.exists(_._2 == 200L),
        s"hamming-3 clip must NOT surface at d=$d")
    }
    // identity strings cannot be banded — actionable error, not wrong rows
    val strFh = Seq((1L, 0, "aabbccddeeff00")).toDF("asset_id", "frame_index", "fhash")
    val e = intercept[IllegalArgumentException] {
      Multimodal.videoNearDup(strFh, maxHamming = 2)
    }
    assert(e.getMessage.contains("numeric fingerprint"))
    // the stop-hash guard survives the banded path: a hash present in
    // EVERY video is dropped before banding, so it alone creates no pair
    val rnd2 = new scala.util.Random(97)
    val stopRows = (0 until 10).map(v => (v.toLong, 0, 12345L)) ++
      (0 until 10).map(v => (v.toLong, 1, rnd2.nextLong() & mask56))
    val stopOut = Multimodal.videoNearDup(
      stopRows.toDF("asset_id", "frame_index", "fhash"),
      minOverlap = 0.1, maxAssetsPerHash = 4, maxHamming = 2)
    assert(stopOut.count() == 0, "stop-hash must be pruned before banding")
  }

  test("banded delta probe == banded full run restricted to corpus x delta") {
    // the wide-fingerprint regime for the INCREMENTAL path: corpus = 8
    // base videos of random 56-bit frames, delta = noisy re-encodes
    // (<=2 flipped bits per frame) of four of them plus one all-new
    val rnd = new scala.util.Random(1113)
    val mask56 = (1L << 56) - 1
    val base = (0 until 8).map(v =>
      v.toLong -> Array.fill(16)(rnd.nextLong() & mask56))
    val noisy = base.take(4).map { case (v, hs) =>
      (v + 100L) -> hs.map { h =>
        var out = h
        (0 until rnd.nextInt(3)).foreach(_ => out ^= 1L << rnd.nextInt(56))
        out
      }
    } :+ (200L -> Array.fill(16)(rnd.nextLong() & mask56))
    def df(vs: Seq[(Long, Array[Long])]) =
      Multimodal.frameIndexRows(vs.flatMap { case (v, hs) =>
        hs.zipWithIndex.map { case (h, i) => (v, i, h) }
      }.toDF("asset_id", "frame_index", "fhash"))
    val corpus = df(base)
    val delta = df(noisy)
    val noStop = 1 << 20
    Seq(0, 2, 3).foreach { d =>
      val probe = Multimodal.videoNearDupAgainstIndex(corpus, delta,
          minOverlap = 0.3, maxAssetsPerHash = noStop, maxHamming = d)
        .as[(Long, Long, Long, Double)].collect().toSet
      val full = Multimodal.videoNearDup(df(base ++ noisy),
          minOverlap = 0.3, maxAssetsPerHash = noStop, maxHamming = d)
        .as[(Long, Long, Long, Double)].collect()
        .filter(p => p._1 < 100 && p._2 >= 100).toSet
      assert(probe == full,
        s"banded probe != restricted banded full run at maxHamming=$d")
      if (d >= 2) assert(probe.nonEmpty,
        s"noisy re-encodes must surface through the banded probe at d=$d")
    }
    // identity strings cannot be band-probed — actionable error
    val strIdx = Multimodal.frameIndexRows(
      Seq((1L, 0, "aabbccddeeff00")).toDF("asset_id", "frame_index", "fhash"))
    val e = intercept[IllegalArgumentException] {
      Multimodal.videoNearDupAgainstIndex(strIdx, strIdx, maxHamming = 2)
    }
    assert(e.getMessage.contains("numeric fingerprint"))
  }

  test("frame index: append == full build, delta probe == restricted videoNearDup") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def idxRows(pred: org.apache.spark.sql.Column) =
      Multimodal.frameIndexRows(
        Multimodal.frameFingerprints(
          Multimodal.syntheticVideoFrames(docs.filter(pred))))
    // append parity: two batch-wise builds union to exactly the full build
    val full = idxRows(lit(true))
    val batched = idxRows(col("doc_id") % 6 === 2)
      .union(idxRows(col("doc_id") % 6 === 5))
    assert(batched.as[(Long, String, Long)].collect().toSet ==
      full.as[(Long, String, Long)].collect().toSet,
      "index rows must be identical whether built in one pass or appended")
    // and through a real parquet append
    val dir = java.nio.file.Files.createTempDirectory("graft-fidx").toString
    idxRows(col("doc_id") % 6 === 2).write.mode("append").parquet(dir)
    idxRows(col("doc_id") % 6 === 5).write.mode("append").parquet(dir)
    assert(spark.read.parquet(dir).as[(Long, String, Long)].collect().toSet ==
      full.as[(Long, String, Long)].collect().toSet)
    // delta probe == the full videoNearDup answer restricted to
    // corpus×delta pairs. Stop guard disabled on both sides for the
    // comparison: the full run counts hash popularity over corpus+delta,
    // the probe over the corpus index only — algebra identical only when
    // neither prunes (the guard's own behavior is pinned separately).
    val noStop = 1 << 20
    val corpus = idxRows(col("doc_id") % 6 === 2)
    val delta = idxRows(col("doc_id") % 6 === 5)
    val probe = Multimodal.videoNearDupAgainstIndex(corpus, delta,
        minOverlap = 0.3, maxAssetsPerHash = noStop)
      .as[(Long, Long, Long, Double)].collect().toSet
    val fullPairs = Multimodal.videoNearDup(
        Multimodal.frameFingerprints(
          Multimodal.syntheticVideoFrames(docs.filter(col("doc_id") % 3 === 2))),
        minOverlap = 0.3, maxAssetsPerHash = noStop)
      .as[(Long, Long, Long, Double)].collect().toSet
    val restricted = fullPairs.flatMap { case (a, b, n, ov) =>
      // canonical a<b in the full run; the probe reports (corpus, delta)
      if (a % 6 == 2 && b % 6 == 5) Some((a, b, n, ov))
      else if (a % 6 == 5 && b % 6 == 2) Some((b, a, n, ov))
      else None
    }
    assert(probe.nonEmpty, "delta probe must surface corpus×delta near-dups")
    assert(probe == restricted,
      "probe must equal the full-run answer restricted to corpus×delta")
    // the probe plan broadcasts the delta — the corpus index is never
    // shuffled (the 100 TB contract)
    val plan = Multimodal.videoNearDupAgainstIndex(corpus, delta,
      minOverlap = 0.3).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"delta side must broadcast against the index scan:\n${plan.take(800)}")
  }

  test("asset index delete == never-ingested through the ab layout (frame and audio)") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def rowsOf(d: String) = spark.read.parquet(d).drop("ab")
      .as[(Long, String, Long)].collect().toSet
    // frame family: ingest two waves, delete the second
    val fdir = java.nio.file.Files.createTempDirectory("graft-fdel").toString
    def fIdx(pred: org.apache.spark.sql.Column) =
      Multimodal.frameIndexRows(
        Multimodal.frameFingerprints(
          Multimodal.syntheticVideoFrames(docs.filter(pred))))
    Multimodal.writeFrameIndex(
      Multimodal.frameFingerprints(
        Multimodal.syntheticVideoFrames(docs.filter(col("doc_id") % 6 === 2))),
      fdir, nBuckets = 8)
    Multimodal.appendFrameIndex(fIdx(col("doc_id") % 6 === 5), fdir,
      nBuckets = 8)
    Multimodal.deleteFromAssetIndex(spark, fdir,
      docs.filter(col("doc_id") % 6 === 5)
        .select(col("doc_id").as("asset_id")))
    assert(rowsOf(fdir) == fIdx(col("doc_id") % 6 === 2)
      .as[(Long, String, Long)].collect().toSet,
      "frame delete-after-append must equal the never-ingested build")
    // audio family through the SAME implementation
    val adir = java.nio.file.Files.createTempDirectory("graft-adel").toString
    def aIdx(pred: org.apache.spark.sql.Column) =
      Multimodal.audioIndexRows(
        Multimodal.syntheticAudioWindows(docs.filter(pred)))
    Multimodal.appendAudioIndex(aIdx(col("doc_id") % 6 === 1), adir,
      nBuckets = 8)
    Multimodal.appendAudioIndex(aIdx(col("doc_id") % 6 === 4), adir,
      nBuckets = 8)
    Multimodal.deleteFromAssetIndex(spark, adir,
      docs.filter(col("doc_id") % 6 === 4)
        .select(col("doc_id").as("asset_id")))
    val want = aIdx(col("doc_id") % 6 === 1)
    assert(spark.read.parquet(adir).drop("ab").collect().toSet ==
      want.collect().toSet,
      "audio delete-after-append must equal the never-ingested build")
    // a no-hit delete is a physical no-op
    val stamps = new java.io.File(adir).listFiles().map(f =>
      f.getName -> f.lastModified()).toMap
    Multimodal.deleteFromAssetIndex(spark, adir,
      Seq(999999L).toDF("asset_id"))
    assert(new java.io.File(adir).listFiles().map(f =>
      f.getName -> f.lastModified()).toMap == stamps)
  }

  test("audio index: append == full build, delta probe votes match the batch form") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def idxRows(pred: org.apache.spark.sql.Column) =
      Multimodal.audioIndexRows(
        Multimodal.syntheticAudioWindows(docs.filter(pred)))
    // append parity through a real parquet append
    val full = idxRows(lit(true))
    val dir = java.nio.file.Files.createTempDirectory("graft-aidx").toString
    idxRows(col("doc_id") % 6 === 1).write.mode("append").parquet(dir)
    idxRows(col("doc_id") % 6 === 4).write.mode("append").parquet(dir)
    assert(spark.read.parquet(dir).as[(Long, Long, String, Long)].collect().toSet ==
      full.as[(Long, Long, String, Long)].collect().toSet,
      "index rows must be identical whether built in one pass or appended")
    // probe semantics on the deterministic shifted-copy fixture, BOTH id
    // orders (the probe reports (corpus, delta) with dt = w_corpus - w_delta,
    // unlike the batch form's canonical a < b):
    //   corpus asset 1 = windows 0..9; delta asset 2 = same content +7
    def rows(asset: Long, shift: Long) =
      (0 until 10).map(w => (asset, w.toLong + shift, s"f$w"))
    def idx(rs: Seq[(Long, Long, String)]) =
      Multimodal.audioIndexRows(rs.toDF("asset_id", "window_index", "fp"))
    val probeLowCorpus = Multimodal.audioNearDupAgainstIndex(
        idx(rows(1L, 0)), idx(rows(2L, 7)), minVotes = 2)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(probeLowCorpus == Set((1L, 2L, 10L, -7L, 10L)),
      s"expected the shifted copy at dt=-7, got $probeLowCorpus")
    // flipped roles: the SAME content with corpus id 2, delta id 1 —
    // dt mirrors because dt is always corpus-minus-delta
    val probeHighCorpus = Multimodal.audioNearDupAgainstIndex(
        idx(rows(2L, 7)), idx(rows(1L, 0)), minVotes = 2)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(probeHighCorpus == Set((2L, 1L, 10L, 7L, 10L)),
      s"expected the mirrored alignment at dt=+7, got $probeHighCorpus")
    // real-corpus restricted parity on the order-free fields: the probe's
    // (pair, best_votes, n_matched) must equal the batch audioNearDup
    // answer restricted to corpus x delta (stop guard disabled both sides;
    // best_dt is checked by the synthetic legs above — its sign follows
    // pair orientation, which the batch form canonicalizes differently)
    val noStop = 1 << 20
    val probe = Multimodal.audioNearDupAgainstIndex(
        idxRows(col("doc_id") % 6 === 1), idxRows(col("doc_id") % 6 === 4),
        minVotes = 2, maxAssetsPerFp = noStop)
      .collect().map(r => (r.getAs[Long]("asset_a"), r.getAs[Long]("asset_b"),
        r.getAs[Long]("best_votes"), r.getAs[Long]("n_matched"))).toSet
    val fullBatch = Multimodal.audioNearDup(
        Multimodal.syntheticAudioWindows(docs),
        minVotes = 2, maxAssetsPerFp = noStop)
      .collect().map(r => (r.getAs[Long]("asset_a"), r.getAs[Long]("asset_b"),
        r.getAs[Long]("best_votes"), r.getAs[Long]("n_matched"))).toSet
    val restricted = fullBatch.flatMap { case (a, b, v, n) =>
      if (a % 6 == 1 && b % 6 == 4) Some((a, b, v, n))
      else if (a % 6 == 4 && b % 6 == 1) Some((b, a, v, n))
      else None
    }
    assert(probe.nonEmpty, "delta probe must surface corpus x delta matches")
    assert(probe == restricted,
      "probe must equal the batch answer restricted to corpus x delta")
  }

  test("audioNearDup: offset voting finds shifted copies, not scattered noise") {
    // asset 1: windows 0..9 with unique fingerprints f0..f9;
    // asset 2: the same content shifted +7 windows (a delayed copy);
    // asset 3: shares two of asset 1's fingerprints but at INCONSISTENT
    //          offsets — matches exist, no single dt accumulates 2 votes.
    val fps = (
      (0 until 10).map(w => (1L, w.toLong, s"f$w")) ++
      (0 until 10).map(w => (2L, w.toLong + 7L, s"f$w")) ++
      Seq((3L, 0L, "f5"), (3L, 9L, "f6"))
    ).toDF("asset_id", "window_index", "fp")
    val out = Multimodal.audioNearDup(fps, minVotes = 2)
      .collect().map(r => (r.getAs[Long]("asset_a"), r.getAs[Long]("asset_b"),
        r.getAs[Long]("best_votes"), r.getAs[Long]("best_dt"),
        r.getAs[Long]("n_matched"))).toSet
    // (1,2): all 10 windows vote dt = -7 → best_votes 10, alignment -7.
    // (2,3): same inconsistency as (1,3), shifted — also excluded.
    assert(out == Set((1L, 2L, 10L, -7L, 10L)),
      s"expected exactly the shifted copy at dt=-7, got $out")
    // the scattered matches were seen but never concentrated
    val all = Multimodal.audioNearDup(fps, minVotes = 1)
      .collect().map(r => (r.getAs[Long]("asset_a"), r.getAs[Long]("asset_b"),
        r.getAs[Long]("best_votes"))).toSet
    assert(all.contains((1L, 3L, 1L)) && all.contains((2L, 3L, 1L)),
      s"scattered matches must cap at 1 vote per dt, got $all")
    // real-corpus smoke: the sf0.001 audio class yields a nonempty,
    // canonical (a < b) pair set at the q123 setting
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val corpus = Multimodal.audioNearDup(
      Multimodal.syntheticAudioWindows(docs), minVotes = 2).collect()
    assert(corpus.forall(r =>
      r.getAs[Long]("asset_a") < r.getAs[Long]("asset_b")))
  }

  test("packed argmax bound is LOUD: epoch-scale window indices raise") {
    // |dt| >= 2^31 would silently corrupt the packed (votes, -dt) order
    // (r19 ADVICE) — the guard must raise instead. Epoch-microsecond
    // window indices are the realistic violation.
    val big = 3_000_000_000L // > 2^31
    val fps = Seq((1L, 0L, "f0"), (1L, 1L, "f1"),
      (2L, big, "f0"), (2L, big + 1L, "f1"))
      .toDF("asset_id", "window_index", "fp")
    val e = intercept[Exception] {
      Multimodal.audioNearDup(fps, minVotes = 1).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("packed argmax")),
      s"expected the bestAlignment bound message, got: ${msgs(e)}")
    // windows renumbered per asset (the documented fix) pass and align
    val ok = Multimodal.audioNearDup(
      Seq((1L, 0L, "f0"), (1L, 1L, "f1"), (2L, 5L, "f0"), (2L, 6L, "f1"))
        .toDF("asset_id", "window_index", "fp"), minVotes = 2)
      .collect()
    assert(ok.length == 1 && ok(0).getAs[Long]("best_dt") == -5L)
  }

  test("audioNearDup banded path equals brute-force at d in {0,1,2,3}") {
    // synthetic NUMERIC 32-bit sub-fingerprints — the real spectral-
    // landmark regime the banded switch exists for. 10 base tracks of 16
    // random windows; track 100+i re-records track i with <=2 bits
    // flipped per window (capture noise); track 200 is a 10-window clip
    // of track 0 shifted +5 with exactly 3 bits flipped per window.
    val rnd = new scala.util.Random(733)
    val mask32 = (1L << 32) - 1
    val base = (0 until 10).map(t =>
      t.toLong -> Array.fill(16)(rnd.nextLong() & mask32))
    def flip(h: Long, nBits: Int, r: scala.util.Random): Long = {
      var out = h
      (0 until nBits).foreach(_ => out ^= 1L << r.nextInt(32))
      out
    }
    val noisy = base.take(5).map { case (t, ws) =>
      (t + 100L) -> ws.map(w => flip(w, rnd.nextInt(3), rnd))
    }
    val clip = Seq(200L -> base.head._2.take(10).map { w =>
      var out = w
      Seq(2, 13, 29).foreach(b => out ^= 1L << b) // hamming exactly 3
      out
    })
    val rows = (base ++ noisy).flatMap { case (t, ws) =>
      ws.zipWithIndex.map { case (w, i) => (t, i.toLong, w) }
    } ++ clip.flatMap { case (t, ws) =>
      ws.zipWithIndex.map { case (w, i) => (t, i.toLong + 5L, w) }
    }
    val fps = rows.toDF("asset_id", "window_index", "fp")
    Seq(0, 1, 2, 3).foreach { d =>
      val banded = Multimodal.audioNearDup(fps, minVotes = 4,
          maxAssetsPerFp = 64, maxHamming = d)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val brute = Multimodal.audioNearDupExact(fps, minVotes = 4,
          maxAssetsPerFp = 64, maxHamming = d)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(banded == brute, s"banded != brute-force at maxHamming=$d")
      if (d >= 2) assert(banded.exists(p => p._1 < 100 && p._2 >= 100 && p._2 < 200),
        s"noisy re-records must surface at d=$d")
      if (d == 3) assert(banded.contains((0L, 200L, 10L, -5L, 10L)),
        s"the 3-bit-flipped shifted clip must align at dt=-5, got $banded")
      else assert(!banded.exists(_._2 == 200L),
        s"hamming-3 clip must NOT surface at d=$d")
    }
    // identity matching LOSES the noisy votes the banded path recovers —
    // the measured justification for the switch (vs relying on offset
    // voting to absorb bit flips: it cannot, every corrupted window's
    // vote is gone at identity)
    val identity = Multimodal.audioNearDup(fps, minVotes = 4,
      maxAssetsPerFp = 64, maxHamming = 0)
    assert(!identity.collect().exists(r => r.getAs[Long]("asset_b") == 200L),
      "identity matching must miss the every-window-corrupted clip")
    // identity strings cannot be banded — actionable error, not wrong rows
    val strFps = Seq((1L, 0L, "aabbccdd")).toDF("asset_id", "window_index", "fp")
    val e = intercept[IllegalArgumentException] {
      Multimodal.audioNearDup(strFps, maxHamming = 2)
    }
    assert(e.getMessage.contains("numeric 32-bit"))
    // the stop-fp guard survives the banded path: a fingerprint present
    // in EVERY track dies on exact-value popularity before banding
    val rnd2 = new scala.util.Random(51)
    val stopRows = (0 until 10).map(t => (t.toLong, 0L, 99999L)) ++
      (0 until 10).map(t => (t.toLong, 1L, rnd2.nextLong() & mask32))
    val stopOut = Multimodal.audioNearDup(
      stopRows.toDF("asset_id", "window_index", "fp"),
      minVotes = 1, maxAssetsPerFp = 4, maxHamming = 2)
    assert(stopOut.count() == 0, "stop-fp must be pruned before banding")
  }

  test("audio banded delta probe == banded batch run restricted to corpus x delta") {
    val rnd = new scala.util.Random(911)
    val mask32 = (1L << 32) - 1
    val base = (0 until 8).map(t =>
      t.toLong -> Array.fill(12)(rnd.nextLong() & mask32))
    val noisy = base.take(4).map { case (t, ws) =>
      (t + 100L) -> ws.map { w =>
        var out = w
        (0 until rnd.nextInt(3)).foreach(_ => out ^= 1L << rnd.nextInt(32))
        out
      }
    } :+ (200L -> Array.fill(12)(rnd.nextLong() & mask32))
    def wdf(vs: Seq[(Long, Array[Long])]) = vs.flatMap { case (t, ws) =>
      ws.zipWithIndex.map { case (w, i) => (t, i.toLong, w) }
    }.toDF("asset_id", "window_index", "fp")
    val noStop = 1 << 20
    Seq(0, 1, 2, 3).foreach { d =>
      val probe = Multimodal.audioNearDupAgainstIndex(
          Multimodal.audioIndexRows(wdf(base)),
          Multimodal.audioIndexRows(wdf(noisy)),
          minVotes = 4, maxAssetsPerFp = noStop, maxHamming = d)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val full = Multimodal.audioNearDup(wdf(base ++ noisy),
          minVotes = 4, maxAssetsPerFp = noStop, maxHamming = d)
        .as[(Long, Long, Long, Long, Long)].collect()
        .filter(p => p._1 < 100 && p._2 >= 100).toSet
      assert(probe == full,
        s"banded probe != restricted banded batch run at maxHamming=$d")
      if (d >= 2) assert(probe.nonEmpty,
        s"noisy re-records must surface through the banded probe at d=$d")
    }
  }

  test("metadata-only query prunes the payload column from the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mm").toString
    assets.write.parquet(s"$dir/assets")
    val metaOnly = spark.read.parquet(s"$dir/assets")
      .select("asset_id", "width", "height")
    val scan = metaOnly.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema: struct<asset_id:bigint,width:int,height:int>"),
      s"payload must not be read:\n$scan")
  }
}
