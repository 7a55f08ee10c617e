package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing (north star).
  *
  * Design: media payloads are opaque BINARY columns with a typed metadata
  * struct alongside. Decode / feature-extraction / resize / frame-sampling
  * run as BATCHED per-partition transforms over typed Datasets — the Scala
  * analog of `mapInPandas`: the expensive library call receives a batch of
  * payloads, not one row at a time, and partitioning controls batch
  * locality. The actual codec call is STUBBED (this container ships no
  * image/audio libraries) with a deterministic fake — the Spark-side
  * contract (schema, encoders, batch shape, partition sizing) is real and
  * tested, and swapping the stub for a JNI/ONNX call changes one function.
  *
  * Scale notes: payloads dominate I/O, so (1) metadata-only queries must
  * never read the payload column — parquet column pruning does this for
  * free as long as payloads live in their OWN column, never inside a
  * struct with hot fields; (2) `maxRecordsPerBatch`-style batching bounds
  * executor memory: batches of `batchSize` rows regardless of partition
  * size; (3) frame sampling EXPLODES rows — sample before shuffle, not
  * after.
  */
object Multimodal {

  /** One media asset row. `payload` is the opaque encoded bytes. */
  final case class Asset(asset_id: Long, kind: String, payload: Array[Byte],
                         width: Int, height: Int, duration_ms: Long)

  /** Decoded/extracted features for one asset. */
  final case class AssetFeatures(asset_id: Long, kind: String, n_bytes: Int,
                                 feature: Array[Float])

  /** One sampled video frame (pre-decode pointer, not pixels). */
  final case class Frame(asset_id: Long, frame_index: Int, offset_ms: Long)

  /** Deterministic synthetic assets derived from the documents table —
    * payload bytes from the text (stand-in for real encoded media).
    */
  def syntheticAssets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      unhex(md5(col("text"))).as("payload"),
      (col("doc_id") % 640 + 1).cast("int").as("width"),
      (col("doc_id") % 480 + 1).cast("int").as("height"),
      (col("n_chars") * 100).as("duration_ms"))

  /** STUB — stands in for a real codec (libjpeg/ffmpeg/...). Deterministic:
    * "features" are a fixed-length byte-sum fold of the payload. The values
    * are SMALL INTEGERS held in floats (exact up to 2^24), deliberately:
    * every downstream step — centering, the lsh_bucket ×1000 quantization —
    * stays exact integer arithmetic, so the DuckDB oracle reproduces the
    * pHash pipeline bit-for-bit with no float-rounding hazard. Replace the
    * body with the real library call; the batching around it stays.
    */
  private[graft] def decodeBatchStub(batch: Seq[Asset]): Seq[AssetFeatures] =
    batch.map { a =>
      val dim = 8
      val acc = new Array[Float](dim)
      var i = 0
      while (i < a.payload.length) {
        acc(i % dim) += (a.payload(i) & 0xff)
        i += 1
      }
      AssetFeatures(a.asset_id, a.kind, a.payload.length, acc)
    }

  /** Batched per-partition decode+feature-extract (the mapInPandas shape).
    * Each partition is processed in `batchSize`-row groups so the stubbed
    * codec sees bounded batches — the memory contract a real inference
    * library needs.
    */
  def extractFeatures(spark: SparkSession, assets: Dataset[Asset],
                      batchSize: Int = 64): Dataset[AssetFeatures] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap(batch => decodeBatchStub(batch))
    }
  }

  /** Frame sampling for video assets: one row per sampled frame at
    * `everyMs` intervals — row explosion BEFORE any shuffle, metadata only
    * (decode happens downstream on the sampled subset).
    */
  def sampleFrames(spark: SparkSession, assets: Dataset[Asset],
                   everyMs: Long = 1000L): Dataset[Frame] = {
    import spark.implicits._
    assets.filter(_.kind == "video").flatMap { a =>
      val n = ((a.duration_ms / everyMs) + 1).toInt
      (0 until n).iterator.map(i => Frame(a.asset_id, i, i * everyMs))
    }
  }

  /** 56-bit perceptual hash per asset: sign quantization of the CENTERED
    * decoded-feature vector over deterministic hyperplanes (the codegen'd
    * [[graft.functions.LshBucket]] walk) — the pHash analog: a real
    * deployment thresholds DCT coefficients of the decoded image, which
    * is exactly a sign quantization of a signed feature vector. Centering
    * is load-bearing, not cosmetic: the stub features are sums of
    * non-negative bytes (all assets live in the positive orthant, mean
    * pairwise cosine ≈ 0.9), and sign bits of uncentered vectors agree
    * ~90% across UNRELATED assets — every banded bucket then holds a
    * constant fraction of the corpus and the bucket join degenerates
    * toward all-pairs (measured: 9.5 s at sf0.1). Subtracting the
    * per-dim expectation (255 for the 16-byte/8-dim byte-sum fold — two
    * uniform bytes of mean 127.5 each) makes unrelated bits fair coins,
    * which is what gives banding its selectivity. A real DCT pHash gets
    * this for free (AC coefficients are zero-mean); any replacement
    * decode stub must preserve it.
    */
  def perceptualHashes(spark: SparkSession, assets: Dataset[Asset],
                       batchSize: Int = 64): DataFrame =
    extractFeatures(spark, assets, batchSize).toDF()
      .select(col("asset_id"), col("kind"),
        graft.functions.LshBucketMath.lshBucketCol(
          transform(col("feature"), x => (x - lit(255.0f)).cast("float")),
          bits = 56, dims = 8, planeOffset = 0).as("phash"))

  /** Image near-duplicates by banded hamming search over [[perceptualHashes]]
    * — the A8 dedup recipe on the image modality: split each 56-bit hash
    * into 4 bands of 14 bits; two hashes within hamming distance ≤ 3
    * differ in at most 3 bits, so by pigeonhole at least one band is
    * IDENTICAL and the pair surfaces from a plain equi-join on (band,
    * value) — never an all-pairs scan (cost Σ_bucket n², the LSH bound).
    * Every candidate is then verified with the exact popcount, so
    * precision is 1.0 by construction and completeness is the pigeonhole
    * theorem (spec-asserted against [[nearDupByPHashExact]]). Band width
    * is the selectivity knob: 14-bit bands put unrelated (centered,
    * fair-coin-bit) pairs in the same bucket with p ≈ 6·10⁻⁵, so
    * candidate volume stays ~corpus-linear at 100 TB; byte bands (7×8,
    * hamming ≤ 6) measured 12× slower at sf0.1 for the same truth set.
    */
  /** The 4×14-bit band decomposition of a 56-bit fingerprint column —
    * the ONE definition of the banded-LSH selectivity knob
    * (pigeonhole-complete for hamming ≤ 3). Shared by the pHash,
    * video-batch, and video-delta matchers so a band-width change can
    * never diverge them (round-11 review finding).
    */
  private def bandStructs(hashCol: String): org.apache.spark.sql.Column =
    array((0 until PhashBandCount).map(i =>
      struct(lit(i).as("band"), phashBandValue(col(hashCol), i).as("bv"))): _*)

  /** One definition of the fixed 4×14-bit pHash band geometry —
    * [[bandStructs]] (key emission) and [[firstMatchingPhashBand]]
    * (exchange-free dedup) must never disagree on widths/offsets, the
    * same single-definition rule [[audioBandGeometry]] enforces for the
    * audio family (round-18 ADVICE).
    */
  private val PhashBandCount = 4
  private val PhashBandBits = 14

  private def phashBandValue(c: org.apache.spark.sql.Column,
                             i: Int): org.apache.spark.sql.Column =
    shiftright(c, i * PhashBandBits)
      .bitwiseAND(lit((1L << PhashBandBits) - 1L))

  /** Image/video twin of the audio-family [[firstMatchingBand]], over the
    * fixed 4×14-bit pHash geometry of [[bandStructs]]: the index of the
    * FIRST band where two hashes agree. Keeping only
    * `band === firstMatchingPhashBand(a, b)` emits each (row_a, row_b)
    * candidate exactly once — a row-wise predicate in codegen instead of
    * a candidate-volume distinct exchange. Exact for distinct input rows
    * (one phash per asset on the image path; the video paths' inputs are
    * distinct (asset, fhash) by construction, and their count_distinct
    * aggregates are duplicate-invariant besides).
    */
  private def firstMatchingPhashBand(
      hA: org.apache.spark.sql.Column,
      hB: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until PhashBandCount).reverse.foldLeft(lit(-1)) { (els, i) =>
      when(phashBandValue(hA, i) === phashBandValue(hB, i), lit(i))
        .otherwise(els)
    }

  def nearDupByPHash(hashes: DataFrame, maxHamming: Int = 2): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"banded search over 4 bands guarantees hamming <= 3, got $maxHamming")
    // dedup the per-asset input first (one row per asset — tiny): the
    // exchange-free band dedup below is exact for distinct input rows
    val keyed = hashes.select(col("asset_id"), col("phash")).distinct()
      .select(col("asset_id"), col("phash"),
        explode(bandStructs("phash")).as("b"))
      .select(col("asset_id"), col("phash"), col("b.band").as("band"),
        col("b.bv").as("bv"))
    keyed.select(col("band"), col("bv"), col("asset_id").as("asset_a"),
        col("phash").as("ph_a"))
      .join(keyed.select(col("band"), col("bv"),
        col("asset_id").as("asset_b"), col("phash").as("ph_b")),
        Seq("band", "bv"))
      .filter(col("asset_a") < col("asset_b"))
      // popcount first: chance band collisions (the bulk of the
      // candidate volume) die in codegen before the dedup
      .withColumn("hamming",
        bit_count(col("ph_a").bitwiseXOR(col("ph_b"))))
      .filter(col("hamming") <= maxHamming)
      // exchange-free band dedup (see [[firstMatchingPhashBand]]): one
      // row per matching pair, no candidate-sized distinct exchange
      .filter(col("band") === firstMatchingPhashBand(col("ph_a"),
        col("ph_b")))
      .select(col("asset_a"), col("asset_b"), col("hamming"))
  }

  /** Brute-force hamming pairs — the spec oracle for [[nearDupByPHash]];
    * all-pairs by construction, never point it at a real corpus.
    */
  private[graft] def nearDupByPHashExact(hashes: DataFrame,
                                         maxHamming: Int): DataFrame =
    hashes.select(col("asset_id").as("asset_a"), col("phash").as("ph_a"))
      .crossJoin(hashes.select(col("asset_id").as("asset_b"),
        col("phash").as("ph_b")))
      .filter(col("asset_a") < col("asset_b"))
      .withColumn("hamming",
        bit_count(col("ph_a").bitwiseXOR(col("ph_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("asset_a"), col("asset_b"), col("hamming"))

  // -------------------------------------------------------------------------
  // Video near-dup: frame-level hashes composed into per-video-pair overlap
  // -------------------------------------------------------------------------

  /** Synthetic video FRAMES from the documents table: frame i of video
    * doc d (doc_id % 3 = 2) is the md5 of the word 5-gram starting at
    * token i. This is the honest stand-in for decoded frames: a video is
    * a SEQUENCE of mostly-locally-similar content windows, and near-dup
    * texts (which the corpus really contains) share most of their
    * shingles — exactly the shared-subsequence structure
    * [[videoNearDup]] exists to detect, including partial (clip) overlap
    * and shifted alignment. A real deployment replaces this with
    * decode + per-frame DCT; everything downstream is unchanged.
    */
  def syntheticVideoFrames(docs: DataFrame, gram: Int = 5,
                           everyMs: Long = 1000L): DataFrame =
    graft.text.TextDedup
      .shinglesWithPos(docs.filter(col("doc_id") % 3 === 2), gram)
      .select(col("doc_id").as("asset_id"),
        (col("pos") - 1).as("frame_index"),
        ((col("pos") - 1) * everyMs).as("offset_ms"),
        md5(col("shingle")).as("fhex"))

  /** Per-frame IDENTITY fingerprints over any (asset_id, frame_index,
    * fhex) frame table — the input [[videoNearDup]] composes into
    * per-video-pair overlap: the first `hexChars` chars of the frame's
    * content hash (14 → 56 bits, collision-negligible at corpus scale).
    *
    * Identity, deliberately NOT the 8-dim LSH sign bucket: frame MATCHING
    * needs a selective join key, and the sign quantization of the 8-dim
    * stub fold carries ~15 effective bits (measured at sf0.001: 8292
    * distinct frame contents → 306 distinct buckets — every bucket then
    * holds ~27 unrelated frames and the inverted-index join degenerates
    * toward all-pairs). Tolerant matching belongs where the hash has
    * real dimensionality: [[nearDupByPHash]]'s banded-hamming recipe
    * drops in here unchanged if the stub is replaced by a ≥64-dim frame
    * DCT. Scale shape: one codegen'd projection per frame row, in the
    * same stage as the frame explosion upstream — 100 TB of video
    * becomes (frames × 7 bytes of key) before anything wide runs.
    */
  def frameFingerprints(frames: DataFrame, hexChars: Int = 14): DataFrame =
    frames.select(col("asset_id"), col("frame_index"),
      substring(col("fhex"), 1, hexChars).as("fhash"))

  /** Video near-duplicates: compose [[frameHashes]] into per-pair overlap —
    * two videos are near-dups when ≥ `minOverlap` of the shorter video's
    * distinct frame hashes also appear in the other (containment, the
    * right asymmetry for clip-of-a-longer-video detection).
    *
    * Scale shape: an INVERTED-INDEX equi-join on the 8-byte frame hash —
    * cost Σ_hash n², never all-pairs over videos. Two guards keep that
    * bound honest at 100 TB: (1) per-video hashes are DISTINCT first
    * (a static logo frame repeated 10⁴ times contributes once, not 10⁸
    * join rows); (2) hashes shared by > `maxAssetsPerHash` videos are
    * dropped as stop-hashes before the join (black/blank frames are the
    * video analog of stopwords — the hot-key lesson from the funnel
    * pair-join, here capped by construction, and any pair they'd surface
    * is found by its discriminative frames anyway).
    */
  def videoNearDup(frameHashes: DataFrame, minOverlap: Double = 0.5,
                   maxAssetsPerHash: Int = 64, maxHamming: Int = 0): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"banded frame matching over 4 bands guarantees hamming <= 3, got $maxHamming")
    if (maxHamming > 0) {
      val ft = frameHashes.schema("fhash").dataType
      require(ft == org.apache.spark.sql.types.LongType,
        s"tolerant (hamming <= $maxHamming) frame matching needs a wide " +
          "numeric fingerprint (a 56-bit LongType, e.g. a per-frame DCT " +
          s"pHash) — got $ft; identity string fingerprints carry no bit " +
          "geometry to band over, use maxHamming = 0 for them")
    }
    // The distinct (video, hash) set feeds FIVE consumers (per-asset
    // counts, the stop-hash scan, both self-join sides via the pruned
    // view) — materialize it once or the whole upstream frame pipeline
    // recomputes per consumer (measured 5× the work at sf0.1).
    val distinctFh = frameHashes.select(col("asset_id"), col("fhash"))
      .distinct().localCheckpoint()
    val perAsset = distinctFh.groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n_hashes"))
    val stopHashes = distinctFh.groupBy(col("fhash"))
      .agg(count(lit(1)).as("n_assets"))
      .filter(col("n_assets") > maxAssetsPerHash)
      .select(col("fhash"))
    val pruned = distinctFh.join(stopHashes, Seq("fhash"), "left_anti")
    // Frame-match relation, then per-pair containment. Identity path:
    // one equi-join on the hash, n_matched = |A ∩ B|. Banded path (a
    // real >= 64-bit frame DCT): the q119 recipe — 4 bands of 14 bits,
    // pigeonhole-complete for hamming <= 3, exact popcount verify — and
    // n_matched generalizes to least(covered_a, covered_b), the count of
    // distinct hashes on each side with a tolerant match, which reduces
    // EXACTLY to |A ∩ B| at maxHamming = 0 (every matched pair is
    // (h, h)) and stays within [0, least(n_a, n_b)] at any d. The
    // stop-hash guard applies BEFORE banding, on exact-hash popularity:
    // a black frame is hot as a value, and dropping it there also keeps
    // it out of every band bucket.
    val matched =
      if (maxHamming == 0)
        pruned.select(col("fhash"), col("asset_id").as("asset_a"))
          .join(pruned.select(col("fhash"), col("asset_id").as("asset_b")),
            Seq("fhash"))
          .filter(col("asset_a") < col("asset_b"))
          .groupBy(col("asset_a"), col("asset_b"))
          .agg(count(lit(1)).as("n_matched"))
      else {
        val keyed = pruned
          .select(col("asset_id"), col("fhash"),
            explode(bandStructs("fhash")).as("b"))
          .select(col("asset_id"), col("fhash"), col("b.band").as("band"),
            col("b.bv").as("bv"))
        keyed.select(col("band"), col("bv"), col("asset_id").as("asset_a"),
            col("fhash").as("ph_a"))
          .join(keyed.select(col("band"), col("bv"),
            col("asset_id").as("asset_b"), col("fhash").as("ph_b")),
            Seq("band", "bv"))
          .filter(col("asset_a") < col("asset_b"))
          // popcount first — failed candidates die in codegen
          .filter(bit_count(col("ph_a").bitwiseXOR(col("ph_b"))) <= maxHamming)
          // exchange-free band dedup: inputs are distinct (asset, fhash)
          // and the count_distinct aggregate is duplicate-invariant
          // besides, so dropping the candidate-sized distinct exchange
          // is doubly safe (see [[firstMatchingPhashBand]])
          .filter(col("band") === firstMatchingPhashBand(col("ph_a"),
            col("ph_b")))
          .groupBy(col("asset_a"), col("asset_b"))
          .agg(least(count_distinct(col("ph_a")),
            count_distinct(col("ph_b"))).as("n_matched"))
      }
    matched
      .join(perAsset.select(col("asset_id").as("asset_a"),
        col("n_hashes").as("n_a")), Seq("asset_a"))
      .join(perAsset.select(col("asset_id").as("asset_b"),
        col("n_hashes").as("n_b")), Seq("asset_b"))
      .withColumn("overlap",
        col("n_matched").cast("double") /
          least(col("n_a"), col("n_b")).cast("double"))
      .filter(col("overlap") >= minOverlap)
      .select(col("asset_a"), col("asset_b"), col("n_matched"),
        col("overlap"))
  }

  /** Brute-force twin of the banded [[videoNearDup]] path — all-pairs
    * over distinct (asset, hash) rows; the spec oracle for the
    * pigeonhole-completeness claim at d <= 3. Never point it at a real
    * corpus.
    */
  private[graft] def videoNearDupExact(frameHashes: DataFrame,
                                       minOverlap: Double,
                                       maxAssetsPerHash: Int,
                                       maxHamming: Int): DataFrame = {
    val distinctFh = frameHashes.select(col("asset_id"), col("fhash"))
      .distinct().localCheckpoint()
    val perAsset = distinctFh.groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n_hashes"))
    val stopHashes = distinctFh.groupBy(col("fhash"))
      .agg(count(lit(1)).as("n_assets"))
      .filter(col("n_assets") > maxAssetsPerHash)
      .select(col("fhash"))
    val pruned = distinctFh.join(stopHashes, Seq("fhash"), "left_anti")
    pruned.select(col("asset_id").as("asset_a"), col("fhash").as("ph_a"))
      .crossJoin(pruned.select(col("asset_id").as("asset_b"),
        col("fhash").as("ph_b")))
      .filter(col("asset_a") < col("asset_b"))
      .filter(bit_count(col("ph_a").bitwiseXOR(col("ph_b"))) <= maxHamming)
      .groupBy(col("asset_a"), col("asset_b"))
      .agg(least(count_distinct(col("ph_a")),
        count_distinct(col("ph_b"))).as("n_matched"))
      .join(perAsset.select(col("asset_id").as("asset_a"),
        col("n_hashes").as("n_a")), Seq("asset_a"))
      .join(perAsset.select(col("asset_id").as("asset_b"),
        col("n_hashes").as("n_b")), Seq("asset_b"))
      .withColumn("overlap",
        col("n_matched").cast("double") /
          least(col("n_a"), col("n_b")).cast("double"))
      .filter(col("overlap") >= minOverlap)
      .select(col("asset_a"), col("asset_b"), col("n_matched"),
        col("overlap"))
  }

  // -------------------------------------------------------------------------
  // Incremental multimodal near-dup: persisted fingerprint index + delta probe
  // -------------------------------------------------------------------------

  /** Index rows for the PERSISTED multimodal fingerprint inverted index —
    * the third instance of the engine's incremental-dedup pattern (text:
    * signatureIndex/q83; vectors: IVF delta/q93; here: frames). One row
    * per distinct (asset, fhash) with the asset's distinct-hash count
    * denormalized on, so the delta probe never re-aggregates the corpus:
    * `n_hashes` rides the matched row out of the join.
    *
    * Appendable by construction: every column depends ONLY on the asset's
    * own frames, so index rows built batch-by-batch (each asset's frames
    * arriving in exactly one batch — the ingest contract) are identical
    * to a single full build, and maintenance is a parquet `append`, never
    * a rebuild (append ≡ full-build spec-pinned in MultimodalSpec).
    */
  def frameIndexRows(frameFingerprints: DataFrame): DataFrame =
    frameFingerprints.select(col("asset_id"), col("fhash")).distinct()
      .withColumn("n_hashes", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("asset_id"))))

  /** At-rest form of the frame index for the STREAMING ingest path
    * ([[graft.streaming.AssetStream]]): [[frameIndexRows]] partitioned by
    * `ab = pmod(asset_id, nBuckets)`. The bucket column exists for ONE
    * consumer — the per-batch replay guard, whose "is this asset already
    * indexed" anti-join then reads only the batch's own bucket
    * directories via partition pruning instead of scanning the full
    * index's asset column every trigger (the [[graft.vector.Similarity]]
    * `indexedIds` discipline, re-keyed from centroid lists to id
    * buckets). The fhash-keyed dedup probe ignores the column entirely.
    */
  def writeFrameIndex(frameFingerprints: DataFrame, dir: String,
                      nBuckets: Int = 64): Unit =
    frameIndexRows(frameFingerprints)
      .withColumn("ab", pmod(col("asset_id"), lit(nBuckets)).cast("int"))
      .write.partitionBy("ab").mode("overwrite").parquet(dir)

  /** Append pre-built index rows (a batch's [[frameIndexRows]]) into the
    * partitioned index — same append ≡ full-build contract as the flat
    * form; `nBuckets` must match the bootstrap write.
    */
  def appendFrameIndex(indexRows: DataFrame, dir: String,
                       nBuckets: Int = 64): Unit =
    indexRows
      .withColumn("ab", pmod(col("asset_id"), lit(nBuckets)).cast("int"))
      .write.partitionBy("ab").mode("append").parquet(dir)

  /** The index without its layout column — what the dedup probe reads. */
  def readFrameIndex(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir).drop("ab")

  /** Asset ids from the index that could collide with `assets` — reads
    * ONLY the buckets the incoming assets hash into (PartitionFilters,
    * plan-pinned): the candidate bucket list is bounded by `nBuckets`
    * (collect-safe by construction), so the replay-guard read is bounded
    * by batch spread, not index size. Works over any `ab`-partitioned
    * index (frame or audio — only `asset_id` is read).
    */
  def indexedAssets(spark: SparkSession, dir: String, assets: DataFrame,
                    nBuckets: Int = 64): DataFrame = {
    val buckets = assets
      .select(pmod(col("asset_id"), lit(nBuckets)).cast("int").as("ab"))
      .distinct().collect().map(_.getInt(0))
    spark.read.parquet(dir)
      .filter(col("ab").isin(buckets.map(Integer.valueOf).toIndexedSeq: _*))
      .select(col("asset_id")).distinct()
  }

  /** Audio twins of the partitioned frame-index writers — same `ab`
    * bucket layout over [[audioIndexRows]], same one-consumer rationale
    * (the streaming replay guard), same append ≡ full-build contract.
    */
  def writeAudioIndex(windows: DataFrame, dir: String,
                      nBuckets: Int = 64): Unit =
    audioIndexRows(windows)
      .withColumn("ab", pmod(col("asset_id"), lit(nBuckets)).cast("int"))
      .write.partitionBy("ab").mode("overwrite").parquet(dir)

  def appendAudioIndex(indexRows: DataFrame, dir: String,
                       nBuckets: Int = 64): Unit =
    indexRows
      .withColumn("ab", pmod(col("asset_id"), lit(nBuckets)).cast("int"))
      .write.partitionBy("ab").mode("append").parquet(dir)

  /** The DELETE half of the `ab`-partitioned asset indexes (frame AND
    * audio — only `asset_id` and the layout column are touched, so one
    * implementation serves both): takedown of an asset rewrites only its
    * one `ab` bucket. Affected buckets are discovered from the INDEX'S
    * OWN ROWS (one column-pruned semi-join — the
    * [[graft.vector.Similarity.deleteFromIvfIndex]] discipline), never
    * from a caller-recomputed hash: an erasure API that trusted a
    * caller-supplied nBuckets would silently delete NOTHING when it
    * disagreed with the index's write-time bucket count (review
    * finding). Emptied bucket dirs are removed outright.
    * Delete-after-append ≡ never-ingested is MultimodalSpec-pinned and
    * certified through the q203 probe oracle. Single-writer, like every
    * compaction here.
    */
  def deleteFromAssetIndex(spark: SparkSession, dir: String,
                           ids: DataFrame): Unit =
    graft.maintenance.Compaction.deleteKeysFromBuckets(spark, dir,
      "ab", "asset_id", ids)


  def readAudioIndex(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir).drop("ab")

  /** Which NEW video assets near-duplicate something already in the
    * corpus — without re-pairing the corpus (the daily-delta question at
    * 100 TB, where yesterday's answer for the corpus itself is already
    * on disk). `index` is the persisted [[frameIndexRows]] of the
    * accumulated corpus; `delta` is the same transform over the new
    * batch. Output: (asset_a = corpus asset, asset_b = delta asset,
    * n_matched, overlap) at containment overlap >= `minOverlap`, the
    * [[videoNearDup]] algebra restricted to corpus×delta.
    *
    * Scale shape: the corpus index is SCANNED once and never shuffled —
    * the delta is broadcast (a day's intake vs the accumulated corpus),
    * so hash matching is map-side against each index partition, and the
    * single aggregate after the join shuffles only the matched pairs.
    * Both per-asset counts arrive denormalized on the joined rows
    * (n_hashes from the index side, the delta's own n_hashes broadcast
    * with it), so no side is re-aggregated. The stop-hash guard is
    * corpus-popularity over the index (one map-side-combined aggregate
    * whose output — hashes in > `maxAssetsPerHash` assets — is
    * broadcast-small); at full scale that list would be ensured
    * alongside the index as maintenance state rather than recomputed per
    * probe. Delta-internal pairs are a separate (far smaller)
    * [[videoNearDup]] run over the batch alone, exactly like the text
    * twin.
    */
  def videoNearDupAgainstIndex(index: DataFrame, delta: DataFrame,
                               minOverlap: Double = 0.5,
                               maxAssetsPerHash: Int = 64,
                               maxHamming: Int = 0): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"banded frame matching over 4 bands guarantees hamming <= 3, got $maxHamming")
    if (maxHamming > 0) {
      val ft = index.schema("fhash").dataType
      require(ft == org.apache.spark.sql.types.LongType,
        s"tolerant (hamming <= $maxHamming) probing needs a wide numeric " +
          s"fingerprint (56-bit LongType) — got $ft; use maxHamming = 0 " +
          "for identity string fingerprints")
    }
    val stopHashes = index.groupBy(col("fhash"))
      .agg(count(lit(1)).as("n_assets"))
      .filter(col("n_assets") > maxAssetsPerHash)
      .select(col("fhash"))
    val prunedIdx = index.join(broadcast(stopHashes), Seq("fhash"), "left_anti")
    // Matched (corpus row × delta row) relation. Identity: one broadcast
    // equi-join on the hash. Banded (wide DCT fingerprints): the same
    // q119 recipe as the batch form — both sides explode into 4×14-bit
    // bands (the broadcast stays delta-sized ×4), candidates from band
    // equality, exact popcount verify, distinct per (hash_a, pair) so a
    // two-band agreement counts once. The stop-hash guard still fires
    // BEFORE banding, on exact corpus-hash popularity.
    val matched =
      if (maxHamming == 0) {
        val probe = broadcast(delta.select(col("fhash"),
          col("asset_id").as("asset_b"), col("n_hashes").as("n_b")))
        prunedIdx
          .join(probe, Seq("fhash"))
          .filter(col("asset_id") =!= col("asset_b"))
          .groupBy(col("asset_id").as("asset_a"), col("asset_b"),
            col("n_hashes").as("n_a"), col("n_b"))
          .agg(count(lit(1)).as("n_matched"))
      } else {
        def banded(df: DataFrame, idCol: String, hashOut: String,
                   nOut: String) = {
          df.select(col("asset_id").as(idCol), col("fhash").as(hashOut),
              col("n_hashes").as(nOut),
              explode(bandStructs("fhash")).as("b"))
            .select(col(idCol), col(hashOut), col(nOut),
              col("b.band").as("band"), col("b.bv").as("bv"))
        }
        banded(prunedIdx, "asset_a", "ph_a", "n_a")
          .join(broadcast(banded(delta, "asset_b", "ph_b", "n_b")),
            Seq("band", "bv"))
          .filter(col("asset_a") =!= col("asset_b"))
          // popcount first — failed candidates die in codegen
          .filter(bit_count(col("ph_a").bitwiseXOR(col("ph_b"))) <= maxHamming)
          // exchange-free band dedup (see [[firstMatchingPhashBand]]);
          // the count_distinct aggregate is duplicate-invariant besides
          .filter(col("band") === firstMatchingPhashBand(col("ph_a"),
            col("ph_b")))
          .groupBy(col("asset_a"), col("asset_b"), col("n_a"), col("n_b"))
          .agg(least(count_distinct(col("ph_a")),
            count_distinct(col("ph_b"))).as("n_matched"))
      }
    matched
      .withColumn("overlap",
        col("n_matched").cast("double") /
          least(col("n_a"), col("n_b")).cast("double"))
      .filter(col("overlap") >= minOverlap)
      .select(col("asset_a"), col("asset_b"), col("n_matched"),
        col("overlap"))
  }

  // -------------------------------------------------------------------------
  // Audio near-dup: sub-fingerprint inverted index + time-offset voting
  // -------------------------------------------------------------------------

  /** Synthetic sliding-window sub-fingerprints for AUDIO assets — the
    * landmark-style scheme (Wang 2003): one compact fingerprint per
    * content window, matched later through an inverted index with
    * time-offset voting. The spectral-peak extraction is STUBBED as the
    * md5 of the word 3-gram at window position w of audio doc d
    * (doc_id % 3 = 1), truncated to 8 hex chars (32 bits — real
    * deployments use 32-bit spectral landmarks too). Like
    * [[syntheticVideoFrames]], shingle windows give the stub REAL
    * overlap-and-shift structure: a near-dup text with an inserted
    * prefix shifts every shared window by a constant, which is exactly
    * the one-hot dt histogram [[audioNearDup]]'s voting detects. Swap
    * the stub for an FFT peak pairer and the index/voting is unchanged.
    */
  def syntheticAudioWindows(docs: DataFrame, gram: Int = 3): DataFrame =
    graft.text.TextDedup
      .shinglesWithPos(docs.filter(col("doc_id") % 3 === 1), gram)
      .select(col("doc_id").as("asset_id"),
        (col("pos") - 1).as("window_index"),
        substring(md5(col("shingle")), 1, 8).as("fp"))

  /** Audio near-duplicates from [[audioFingerprints]]: pairs of assets
    * whose fingerprint matches CONCENTRATE at one time offset. Matching
    * windows vote for their offset `dt = window_a − window_b`; a true
    * copy (possibly clipped/shifted) piles its votes on a single dt,
    * while chance collisions scatter — so the score is the best single
    * offset's votes (`best_votes`), not the raw match count, and a pair
    * qualifies at `best_votes >= minVotes`.
    *
    * Scale shape: identical to [[videoNearDup]] — inverted-index
    * equi-join on the 32-bit fingerprint with a stop-fingerprint guard
    * (> `maxAssetsPerFp` assets ⇒ dropped: silence windows are audio's
    * stopwords), then a two-level aggregate (votes per (pair, dt), max
    * per pair) that shuffles once on the pair key.
    *
    * `maxHamming > 0` (needs a NUMERIC 32-bit fp) switches window
    * matching to the width-aware banded recipe — real spectral landmarks
    * tolerate single-bit flips that identity matching silently loses as
    * votes, exactly as the video path's round-11 switch: maxHamming + 1
    * bands evenly partitioning 32 bits (d=1 → 2×16), pigeonhole-complete
    * by construction, exact popcount verify (banded ≡ brute-force
    * spec-pinned at d ∈ {0, 1, 2, 3}).
    */
  def audioNearDup(fingerprints: DataFrame, minVotes: Int = 4,
                   maxAssetsPerFp: Int = 64, maxHamming: Int = 0): DataFrame = {
    requireTolerantAudioFp(fingerprints, maxHamming)
    // Same sharing shape as [[videoNearDup]]: materialize the distinct
    // window set once for its four consumers.
    val distinctFp = fingerprints
      .select(col("asset_id"), col("window_index"), col("fp")).distinct()
      .localCheckpoint()
    val stopFps = distinctFp.groupBy(col("fp"))
      .agg(countDistinct(col("asset_id")).as("n_assets"))
      .filter(col("n_assets") > maxAssetsPerFp)
      .select(col("fp"))
    val pruned = distinctFp.join(stopFps, Seq("fp"), "left_anti")
    val matched =
      if (maxHamming == 0)
        pruned.select(col("fp"), col("asset_id").as("asset_a"),
            col("window_index").as("w_a"))
          .join(pruned.select(col("fp"), col("asset_id").as("asset_b"),
            col("window_index").as("w_b")), Seq("fp"))
          .filter(col("asset_a") < col("asset_b"))
          .select(col("asset_a"), col("w_a"), col("asset_b"), col("w_b"))
      else {
        // Tolerant path — the q119 band algebra at 32 bits with the
        // minimal complete band count: maxHamming + 1 bands (d=1 → 2×16;
        // banded ≡ brute-force spec-pinned at d ∈ {0, 1, 2, 3}), exact
        // popcount verify per candidate. The stop-fp guard applies BEFORE banding, on
        // exact-value popularity — silence is hot as a VALUE, and
        // dropping it there keeps it out of every band bucket too.
        val keyed = pruned
          .select(col("asset_id"), col("window_index"), col("fp"),
            explode(audioBandStructs("fp", maxHamming)).as("b"))
          .select(col("asset_id"), col("window_index"), col("fp"),
            col("b.band").as("band"), col("b.bv").as("bv"))
        keyed.select(col("band"), col("bv"), col("asset_id").as("asset_a"),
            col("window_index").as("w_a"), col("fp").as("fp_a"))
          .join(keyed.select(col("band"), col("bv"),
            col("asset_id").as("asset_b"), col("window_index").as("w_b"),
            col("fp").as("fp_b")), Seq("band", "bv"))
          .filter(col("asset_a") < col("asset_b"))
          // popcount first — failed candidates never reach the dedup
          .filter(bit_count(col("fp_a").bitwiseXOR(col("fp_b")))
            <= maxHamming)
          // exchange-free band dedup: a pair meets once per agreeing
          // band; keeping only the FIRST agreeing band emits it exactly
          // once with a row-wise predicate (set-identical to the old
          // candidate-sized `.distinct()`, which dominated the plan at
          // dense-candidate scale — BASELINE.md round-18)
          .filter(col("band") === firstMatchingBand(col("fp_a"),
            col("fp_b"), maxHamming))
          .select(col("asset_a"), col("w_a"), col("asset_b"), col("w_b"))
      }
    bestAlignment(matched, minVotes)
  }

  /** 32-bit audio sub-fingerprints banded WIDTH-AWARE: `maxHamming + 1`
    * bands partitioning the 32 bits as evenly as possible (d=1 → 2×16,
    * d=2 → 3×(11,11,10), d=3 → 4×8). d flips at most d bits, so by
    * pigeonhole at least one of the d+1 bands is untouched — the minimal
    * band count that stays complete, and the one that keeps band keys
    * WIDE: an 8-bit key has 256 values (candidate volume ~ n²/256 per
    * band, quadratic); a 16-bit key has 65,536 (measured 180× fewer
    * candidates at sf0.1 for the d=1 queries). One definition shared by
    * the batch and delta tolerant matchers so a geometry change can
    * never diverge them.
    */
  /** One definition of the 32-bit band geometry for the audio family —
    * [[audioBandStructs]] (key emission) and [[firstMatchingBand]]
    * (exchange-free dedup) must never disagree on widths/offsets.
    */
  private def audioBandGeometry(maxHamming: Int): (Seq[Int], Seq[Int]) = {
    val nBands = maxHamming + 1
    val widths = Seq.tabulate(nBands)(i => 32 / nBands +
      (if (i < 32 % nBands) 1 else 0))
    (widths, widths.scanLeft(0)(_ + _))
  }

  private def audioBandStructs(fpCol: String,
                               maxHamming: Int): org.apache.spark.sql.Column = {
    val (widths, offsets) = audioBandGeometry(maxHamming)
    array(widths.indices.map(i =>
      struct(lit(i).as("band"),
        shiftright(col(fpCol), offsets(i))
          .bitwiseAND(lit((1L << widths(i)) - 1L)).as("bv"))): _*)
  }

  /** The index of the FIRST band where two fingerprints agree — the
    * exchange-free replacement for the candidate `.distinct()`: a pair
    * of (asset, window) rows meets once per agreeing band, so keeping
    * only `band === firstMatchingBand(fp_a, fp_b)` emits each pair
    * EXACTLY once with a row-wise predicate instead of a corpus-of-
    * candidates-sized distinct exchange. Measured at the 50k-doc
    * fixture (q151): the distinct was the dominant stage — the dense
    * shared-vocabulary n-grams put ~10⁷ surviving candidates through
    * it (BASELINE.md round-18). Rows reaching the popcount filter
    * matched in some band, so the CASE always resolves for them.
    */
  private def firstMatchingBand(fpA: org.apache.spark.sql.Column,
                                fpB: org.apache.spark.sql.Column,
                                maxHamming: Int): org.apache.spark.sql.Column = {
    val (widths, offsets) = audioBandGeometry(maxHamming)
    def bv(c: org.apache.spark.sql.Column, i: Int) =
      shiftright(c, offsets(i)).bitwiseAND(lit((1L << widths(i)) - 1L))
    widths.indices.reverse.foldLeft(lit(-1)) { (els, i) =>
      when(bv(fpA, i) === bv(fpB, i), lit(i)).otherwise(els)
    }
  }

  private def requireTolerantAudioFp(df: DataFrame, maxHamming: Int): Unit = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"banded audio matching partitions 32 bits into maxHamming + 1 " +
        s"bands; beyond 3 the bands get too narrow to select, " +
        s"got $maxHamming")
    if (maxHamming > 0) {
      val ft = df.schema("fp").dataType
      require(ft == org.apache.spark.sql.types.LongType ||
          ft == org.apache.spark.sql.types.IntegerType,
        s"tolerant (hamming <= $maxHamming) audio matching needs a " +
          "numeric 32-bit sub-fingerprint (e.g. conv(hex, 16, 10)) — " +
          s"got $ft; identity string fingerprints carry no bit geometry " +
          "to band over, use maxHamming = 0 for them")
    }
  }

  /** The two-level vote aggregate every audio matcher shares: matched
    * window pairs (asset_a, w_a, asset_b, w_b) → votes per (pair, dt =
    * w_a − w_b) → the best single alignment per pair. best_dt reports
    * the winning alignment (b's timeline shifted by best_dt windows
    * lines up with a's — what a clip-merge consumer needs); vote ties
    * break to the SMALLEST dt so the result is deterministic: max over
    * (votes, -dt) lexicographically. One definition for the identity,
    * banded, and delta-probe paths — the scoring rule cannot diverge
    * between them.
    */
  private def bestAlignment(matched: DataFrame, minVotes: Int): DataFrame =
    matched
      .groupBy(col("asset_a"), col("asset_b"),
        (col("w_a") - col("w_b")).as("dt"))
      .agg(count(lit(1)).as("votes"))
      // Packing precondition made LOUD (r19 ADVICE): the BIGINT argmax
      // below is the lexicographic (votes, -dt) order only while
      // votes < 2³¹ and |dt| < 2³¹. votes is bounded by a pair's
      // matched-window count, but dt comes straight from caller-supplied
      // window indices — indices derived from epoch timestamps would
      // overflow SILENTLY into a corrupted best_dt, so a violation
      // raises here instead (renumber windows per asset, e.g.
      // row_number over the capture order). assert_true returns NULL on
      // pass, so the filter keeps every row and cannot be pruned; cost
      // is one codegen'd comparison per (pair, dt) row, post-aggregate,
      // and the aggregate pair still plans as HashAggregate.
      .filter(assert_true(
        abs(col("dt")) < lit(2147483648L) &&
          col("votes") < lit(2147483648L),
        concat(lit("bestAlignment: packed argmax needs |dt| < 2^31 and " +
          "votes < 2^31; got dt="), col("dt"),
          lit(" votes="), col("votes"),
          lit(" — window indices must be small per-asset ordinals, " +
            "not epoch-derived timestamps"))).isNull)
      // The (votes, -dt) argmax is packed into ONE BIGINT —
      // votes·2³² + (2³¹ − dt) — instead of max(struct(votes, -dt)):
      // a struct max has no mutable aggregation buffer, so Catalyst
      // plans BOTH aggregate halves as SortAggregate with a full sort
      // on each side of the exchange, over the per-(pair, dt) vote
      // table (candidate-scale at dense-fingerprint corpora — measured
      // the dominant stage of the round-19 q151 budget at sf1). The
      // packing is the exact lexicographic order: votes < 2³¹ (bounded
      // by a pair's matched-window count) and |dt| < 2³¹ (window
      // indices), so max(packed) ≡ max(votes, then −dt), every
      // aggregate is a primitive max/sum, and the whole tail plans as
      // codegen'd HashAggregate.
      .groupBy(col("asset_a"), col("asset_b"))
      .agg(max(col("votes")).as("best_votes"),
        sum(col("votes")).as("n_matched"),
        max(col("votes") * lit(4294967296L) +
          (lit(2147483648L) - col("dt"))).as("_packed"))
      .filter(col("best_votes") >= minVotes)
      .select(col("asset_a"), col("asset_b"), col("best_votes"),
        (lit(2147483648L) - col("_packed") % lit(4294967296L))
          .as("best_dt"),
        col("n_matched"))

  /** Brute-force twin of the banded audio path — all-pairs over distinct
    * (asset, window, fp) rows with the popcount filter; the spec oracle
    * for the pigeonhole-completeness claim at d <= 3 (numeric fp only).
    * Never point it at a real corpus.
    */
  private[graft] def audioNearDupExact(fingerprints: DataFrame,
                                       minVotes: Int, maxAssetsPerFp: Int,
                                       maxHamming: Int): DataFrame = {
    val distinctFp = fingerprints
      .select(col("asset_id"), col("window_index"), col("fp")).distinct()
      .localCheckpoint()
    val stopFps = distinctFp.groupBy(col("fp"))
      .agg(countDistinct(col("asset_id")).as("n_assets"))
      .filter(col("n_assets") > maxAssetsPerFp)
      .select(col("fp"))
    val pruned = distinctFp.join(stopFps, Seq("fp"), "left_anti")
    val matched = pruned.select(col("asset_id").as("asset_a"),
        col("window_index").as("w_a"), col("fp").as("fp_a"))
      .crossJoin(pruned.select(col("asset_id").as("asset_b"),
        col("window_index").as("w_b"), col("fp").as("fp_b")))
      .filter(col("asset_a") < col("asset_b"))
      .filter(bit_count(col("fp_a").bitwiseXOR(col("fp_b"))) <= maxHamming)
      .select(col("asset_a"), col("w_a"), col("asset_b"), col("w_b"))
    bestAlignment(matched, minVotes)
  }

  /** Audio twin of [[frameIndexRows]]: persisted sub-fingerprint
    * inverted-index rows for the incremental audio near-dup path. Voting
    * needs WHERE each fingerprint sits, so rows keep `window_index`
    * (distinct (asset, window, fp)); `n_windows` — the asset's distinct
    * row count — is denormalized on for symmetry with the video index,
    * giving a consumer absolute match fractions without re-aggregating
    * the corpus (the voting threshold itself is absolute, so the probe
    * does not need it). Appendable by construction, same contract:
    * every column depends only on the asset's own windows.
    */
  def audioIndexRows(windows: DataFrame): DataFrame =
    windows.select(col("asset_id"), col("window_index"), col("fp")).distinct()
      .withColumn("n_windows", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("asset_id"))))

  /** Which NEW audio assets are copies/clips of something already in the
    * corpus — the [[videoNearDupAgainstIndex]] pattern with
    * [[audioNearDup]]'s time-offset voting: matching windows vote for
    * `dt = corpus_window − delta_window`, the best single offset's votes
    * score the pair, and `best_dt` reports the winning alignment (the
    * delta asset's timeline shifted by best_dt windows lines up with the
    * corpus asset's; vote ties break to the smallest dt, the same
    * determinism rule as the batch form). Output (asset_a = corpus,
    * asset_b = delta) at `best_votes >= minVotes`.
    *
    * Scale shape: identical to the video probe — index scanned once,
    * never shuffled; delta broadcast; stop-fingerprint guard from
    * corpus-side popularity (countDistinct, since one asset legitimately
    * repeats a fingerprint across windows); the two-level vote aggregate
    * shuffles only matched pairs.
    *
    * PRECONDITION: `index` rows must be distinct (asset_id,
    * window_index, fp) — [[audioIndexRows]]/[[readAudioIndex]] guarantee
    * it, and [[appendAudioIndex]] preserves it. A duplicated index row
    * would vote its window twice (inflating best_votes/n_matched and
    * possibly flipping best_dt). The index is corpus-sized, so this
    * probe deliberately does NOT pay a per-call distinct exchange over
    * it the way it absorbs duplicate rows on the broadcast-small delta
    * side; route index writes through the audioIndexRows family.
    */
  def audioNearDupAgainstIndex(index: DataFrame, delta: DataFrame,
                               minVotes: Int = 4,
                               maxAssetsPerFp: Int = 64,
                               maxHamming: Int = 0): DataFrame = {
    requireTolerantAudioFp(delta, maxHamming)
    // Distinct the (broadcast-small) delta rows up front — the
    // exchange-free band dedup keeps each candidate only in its first
    // agreeing band, which removes per-BAND multiplicity but not
    // duplicate caller-supplied rows; the batch paths distinct their
    // input explicitly and this public probe must not make that a
    // silent precondition (round-18 ADVICE). In-repo callers feed
    // [[audioIndexRows]] output (already distinct), so this is a value
    // no-op for them at negligible broadcast-side cost.
    val dRows = delta
      .select(col("asset_id"), col("window_index"), col("fp")).distinct()
    val stopFps = index.groupBy(col("fp"))
      .agg(countDistinct(col("asset_id")).as("n_assets"))
      .filter(col("n_assets") > maxAssetsPerFp)
      .select(col("fp"))
    val prunedIdx = index.join(broadcast(stopFps), Seq("fp"), "left_anti")
    val matched =
      if (maxHamming == 0)
        prunedIdx
          .join(broadcast(dRows.select(col("fp"),
            col("asset_id").as("asset_b"), col("window_index").as("w_b"))),
            Seq("fp"))
          .filter(col("asset_id") =!= col("asset_b"))
          .select(col("asset_id").as("asset_a"),
            col("window_index").as("w_a"), col("asset_b"), col("w_b"))
      else {
        // Banded probe: the delta's band keys broadcast WITH it, the
        // index explodes its maxHamming + 1 bands map-side against each
        // partition —
        // still scanned once, never shuffled; only the matched candidate
        // rows pay the dedup + popcount verify before voting.
        val ikeyed = prunedIdx
          .select(col("asset_id"), col("window_index"), col("fp"),
            explode(audioBandStructs("fp", maxHamming)).as("b"))
          .select(col("asset_id").as("asset_a"),
            col("window_index").as("w_a"), col("fp").as("fp_a"),
            col("b.band").as("band"), col("b.bv").as("bv"))
        val dkeyed = dRows
          .select(col("asset_id"), col("window_index"), col("fp"),
            explode(audioBandStructs("fp", maxHamming)).as("b"))
          .select(col("asset_id").as("asset_b"),
            col("window_index").as("w_b"), col("fp").as("fp_b"),
            col("b.band").as("band"), col("b.bv").as("bv"))
        ikeyed.join(broadcast(dkeyed), Seq("band", "bv"))
          .filter(col("asset_a") =!= col("asset_b"))
          // popcount first — failed candidates never reach the dedup
          .filter(bit_count(col("fp_a").bitwiseXOR(col("fp_b")))
            <= maxHamming)
          // exchange-free band dedup (see [[firstMatchingBand]]): the
          // probe's candidate volume never pays a distinct exchange
          .filter(col("band") === firstMatchingBand(col("fp_a"),
            col("fp_b"), maxHamming))
          .select(col("asset_a"), col("w_a"), col("asset_b"), col("w_b"))
      }
    bestAlignment(matched, minVotes)
  }

  /** Resize stub: metadata-level resize plan (target dims per asset) — the
    * pixel work happens inside the decode stub in a real deployment.
    */
  def resizePlan(assets: DataFrame, maxSide: Int = 224): DataFrame =
    assets.select(col("asset_id"), col("width"), col("height"),
      when(greatest(col("width"), col("height")) <= maxSide, lit(1.0))
        .otherwise(lit(maxSide.toDouble) /
          greatest(col("width"), col("height")).cast("double")).as("scale"))
      .withColumn("target_w", floor(col("width") * col("scale")).cast("int"))
      .withColumn("target_h", floor(col("height") * col("scale")).cast("int"))
}
