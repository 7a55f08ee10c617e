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
    * "features" are a fixed-length fold of the payload bytes. Replace the
    * body with the real library call; the batching around it stays.
    */
  private[graft] def decodeBatchStub(batch: Seq[Asset]): Seq[AssetFeatures] =
    batch.map { a =>
      val dim = 8
      val acc = new Array[Float](dim)
      var i = 0
      while (i < a.payload.length) {
        acc(i % dim) += (a.payload(i) & 0xff) / 255.0f
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
    * per-dim expectation (1.0 for the 16-byte/8-dim fold) makes
    * unrelated bits fair coins, which is what gives banding its
    * selectivity. A real DCT pHash gets this for free (AC coefficients
    * are zero-mean); any replacement decode stub must preserve it.
    */
  def perceptualHashes(spark: SparkSession, assets: Dataset[Asset],
                       batchSize: Int = 64): DataFrame =
    extractFeatures(spark, assets, batchSize).toDF()
      .select(col("asset_id"), col("kind"),
        graft.functions.LshBucketMath.lshBucketCol(
          transform(col("feature"), x => (x - lit(1.0f)).cast("float")),
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
  def nearDupByPHash(hashes: DataFrame, maxHamming: Int = 2): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"banded search over 4 bands guarantees hamming <= 3, got $maxHamming")
    val bandCols = (0 until 4).map(i =>
      struct(lit(i).as("band"),
        shiftright(col("phash"), i * 14).bitwiseAND(lit(16383L)).as("bv")))
    val keyed = hashes.select(col("asset_id"), col("phash"),
        explode(array(bandCols: _*)).as("b"))
      .select(col("asset_id"), col("phash"), col("b.band").as("band"),
        col("b.bv").as("bv"))
    keyed.select(col("band"), col("bv"), col("asset_id").as("asset_a"),
        col("phash").as("ph_a"))
      .join(keyed.select(col("band"), col("bv"),
        col("asset_id").as("asset_b"), col("phash").as("ph_b")),
        Seq("band", "bv"))
      .filter(col("asset_a") < col("asset_b"))
      .select(col("asset_a"), col("asset_b"), col("ph_a"), col("ph_b"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("ph_a").bitwiseXOR(col("ph_b"))))
      .filter(col("hamming") <= maxHamming)
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
