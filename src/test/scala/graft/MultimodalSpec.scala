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
    assert(f.feature(0) == 0.0f && f.feature(1) == 255.0f / 255.0f && f.feature(2) == 16.0f / 255.0f)
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
