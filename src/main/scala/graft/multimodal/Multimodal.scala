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
