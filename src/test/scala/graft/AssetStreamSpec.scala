package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

import graft.multimodal.Multimodal
import graft.streaming.AssetStream

/** Streaming multimodal ingestion (AssetStream): the bucket-partitioned
  * frame index is the dedup state — replayed assets, in-batch near-dup
  * clusters, and corpus near-dups all die before the append, across
  * micro-batches and across full replays.
  */
class AssetStreamSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("frame_index", IntegerType),
    StructField("fhash", StringType)))

  /** Video `id` whose frames are `hs`, one row per frame. */
  private def video(id: Long, hs: Seq[String]) =
    hs.zipWithIndex.map { case (h, i) => (id, i, h) }

  private def frames(rows: Seq[(Long, Int, String)]*) =
    rows.flatten.toDF("asset_id", "frame_index", "fhash")

  test("ingest: replay guard, in-batch components, corpus precedence — full replay appends nothing") {
    val dir = java.nio.file.Files.createTempDirectory("graft-astream").toString
    val src = s"$dir/src"
    val idx = s"$dir/idx"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))

    // seed corpus: videos 100 and 101, disjoint frame sets
    Multimodal.writeFrameIndex(frames(
      video(100L, (0 until 10).map(i => s"f$i")),
      video(101L, (0 until 10).map(i => s"g$i"))), idx, nBuckets = 8)

    // one batch carrying every dup mode plus one genuine survivor:
    //  - asset 100: re-delivered (already indexed)      -> replay guard
    //  - asset 1: shares 8/10 frames with corpus v100   -> corpus precedence
    //  - assets 2,3: share 9/10 frames with each other  -> min id 2 survives
    //  - asset 4: all-new frames                        -> survives
    val batch = frames(
      video(100L, (0 until 10).map(i => s"f$i")),
      video(1L, (0 until 8).map(i => s"f$i") ++ Seq("x0", "x1")),
      video(2L, (0 until 9).map(i => s"h$i") :+ "h_a"),
      video(3L, (0 until 9).map(i => s"h$i") :+ "h_b"),
      video(4L, (0 until 10).map(i => s"z$i")))
    batch.coalesce(1).write.mode("overwrite").parquet(s"$src/b1")
    AssetStream.ingestQuery(spark, s"$src/*", idx, s"$dir/cp1", schema,
      minOverlap = 0.5, nBuckets = 8).awaitTermination()

    def indexedAssets() = spark.read.parquet(idx)
      .select($"asset_id").distinct().as[Long].collect().toSet
    assert(indexedAssets() == Set(100L, 101L, 2L, 4L),
      "only the in-batch survivor and the new asset may join the corpus")

    // full replay (same rows, new file, FRESH checkpoint — the harshest
    // at-least-once case): 100/2/4 die on the replay guard, 1 dies on
    // corpus precedence, 3 dies against the now-indexed 2
    batch.coalesce(1).write.mode("overwrite").parquet(s"$src/b2")
    AssetStream.ingestQuery(spark, s"$src/*", idx, s"$dir/cp2", schema,
      minOverlap = 0.5, nBuckets = 8).awaitTermination()
    assert(indexedAssets() == Set(100L, 101L, 2L, 4L),
      "a replayed batch must append nothing")

    // the appended index keeps answering the batch delta probe: a new
    // clip of survivor 2 is found, the dropped twin 3 is absent
    val probe = Multimodal.videoNearDupAgainstIndex(
      Multimodal.readFrameIndex(spark, idx),
      Multimodal.frameIndexRows(
        frames(video(999L, (0 until 9).map(i => s"h$i")))),
      minOverlap = 0.5)
    assert(probe.select($"asset_a").as[Long].collect().toSeq == Seq(2L))
  }

  test("audio ingest: offset-voting dedup against batch and corpus, replay appends nothing") {
    val dir = java.nio.file.Files.createTempDirectory("graft-astream-a").toString
    val src = s"$dir/src"
    val idx = s"$dir/idx"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))

    def audio(id: Long, shift: Long, fps: Seq[String]) =
      fps.zipWithIndex.map { case (f, i) => (id, i + shift, f) }
    def windows(rows: Seq[(Long, Long, String)]*) =
      rows.flatten.toDF("asset_id", "window_index", "fp")
    val aSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("window_index", LongType),
      StructField("fp", StringType)))

    // seed corpus: track 100 (a0..a9), track 101 (b0..b9)
    Multimodal.writeAudioIndex(windows(
      audio(100L, 0, (0 until 10).map(i => s"a$i")),
      audio(101L, 0, (0 until 10).map(i => s"b$i"))), idx, nBuckets = 8)

    // batch: 100 re-delivered; 1 = corpus track 100 shifted +3 (clip);
    // 2,3 = in-batch shifted copies of each other; 4 = genuinely new
    val batch = windows(
      audio(100L, 0, (0 until 10).map(i => s"a$i")),
      audio(1L, 3, (0 until 10).map(i => s"a$i")),
      audio(2L, 0, (0 until 10).map(i => s"c$i")),
      audio(3L, 5, (0 until 10).map(i => s"c$i")),
      audio(4L, 0, (0 until 10).map(i => s"d$i")))
    batch.coalesce(1).write.mode("overwrite").parquet(s"$src/b1")
    AssetStream.ingestAudioQuery(spark, s"$src/*", idx, s"$dir/cp1", aSchema,
      minVotes = 4, nBuckets = 8).awaitTermination()

    def indexedIds() = spark.read.parquet(idx)
      .select($"asset_id").distinct().as[Long].collect().toSet
    assert(indexedIds() == Set(100L, 101L, 2L, 4L),
      "shifted copies must lose to the corpus and to the in-batch min id")

    // full replay, fresh checkpoint: nothing may append
    batch.coalesce(1).write.mode("overwrite").parquet(s"$src/b2")
    AssetStream.ingestAudioQuery(spark, s"$src/*", idx, s"$dir/cp2", aSchema,
      minVotes = 4, nBuckets = 8).awaitTermination()
    assert(indexedIds() == Set(100L, 101L, 2L, 4L),
      "a replayed audio batch must append nothing")
  }

  test("an empty/pure-replay batch is a no-op (empty-graph path)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-astream-e").toString
    val src = s"$dir/src"
    val idx = s"$dir/idx"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    Multimodal.writeFrameIndex(frames(
      video(10L, Seq("p", "q")), video(11L, Seq("r", "s"))), idx, nBuckets = 8)
    // pure replay: every asset already indexed, no pairs anywhere —
    // dedupClusters must converge on the empty graph and nothing appends
    frames(video(10L, Seq("p", "q")), video(11L, Seq("r", "s")))
      .coalesce(1).write.mode("overwrite").parquet(s"$src/b1")
    AssetStream.ingestQuery(spark, s"$src/*", idx, s"$dir/cp", schema,
      minOverlap = 0.5, nBuckets = 8).awaitTermination()
    assert(spark.read.parquet(idx).select($"asset_id").distinct()
      .as[Long].collect().toSet == Set(10L, 11L))
  }

  test("compaction: probe results, replay guard, and appendability survive") {
    import graft.maintenance.Compaction
    val dir = java.nio.file.Files.createTempDirectory("graft-astream-c").toString
    val src = s"$dir/src"
    val idx = s"$dir/idx"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    // seed + THREE streamed batches all hashing into bucket ab=1 (ids
    // 1, 5, 9 mod 4): the accretion pattern that decays a long-lived
    // index — each drain appends another file to the SAME bucket dir
    Multimodal.writeFrameIndex(frames(
      video(100L, (0 until 10).map(i => s"f$i"))), idx, nBuckets = 4)
    Seq(1L, 5L, 9L).foreach { b =>
      frames(video(b, (0 until 10).map(i => s"v${b}_$i")))
        .coalesce(1).write.mode("overwrite").parquet(s"$src/b$b")
      AssetStream.ingestQuery(spark, s"$src/*", idx, s"$dir/cp$b", schema,
        minOverlap = 0.5, nBuckets = 4).awaitTermination()
    }
    val before = Compaction.fileCount(spark, idx)
    def probe() = Multimodal.videoNearDupAgainstIndex(
        Multimodal.readFrameIndex(spark, idx),
        Multimodal.frameIndexRows(
          frames(video(999L, (0 until 9).map(i => s"v5_$i")))),
        minOverlap = 0.5)
      .as[(Long, Long, Long, Double)].collect().toSet
    def guard() = Multimodal.indexedAssets(spark, idx,
        frames(video(5L, Seq("x"))), nBuckets = 4)
      .as[Long].collect().toSet
    val (probeBefore, guardBefore) = (probe(), guard())
    assert(probeBefore.map(_._1) == Set(5L) && guardBefore.contains(5L))

    // maintenance pass (between drains — the single-writer contract)
    Compaction.compactPartitioned(spark, idx, "ab")
    val after = Compaction.fileCount(spark, idx)
    assert(after < before,
      s"compaction must shrink the file count, got $before -> $after")
    assert(probe() == probeBefore,
      "probe results must be identical over the compacted index")
    assert(guard() == guardBefore,
      "the replay guard must still recognize indexed assets")
    // and the stream keeps appending into the compacted layout: a replay
    // appends nothing, a genuinely new asset still lands
    frames(video(5L, (0 until 10).map(i => s"v5_$i")),
        video(7L, (0 until 10).map(i => s"n$i")))
      .coalesce(1).write.mode("overwrite").parquet(s"$src/b9")
    AssetStream.ingestQuery(spark, s"$src/*", idx, s"$dir/cp9", schema,
      minOverlap = 0.5, nBuckets = 4).awaitTermination()
    assert(spark.read.parquet(idx).select($"asset_id").distinct()
      .as[Long].collect().toSet == Set(100L, 1L, 5L, 9L, 7L))
  }

  test("replay-guard read is bucket-pruned (PartitionFilters on ab)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-astream-pp").toString
    val idx = s"$dir/idx"
    Multimodal.writeFrameIndex(frames(
      (0L until 16L).map(id =>
        video(id, (0 until 4).map(i => s"v${id}_$i"))): _*), idx, nBuckets = 8)
    // a batch touching two buckets must read exactly those partitions
    val batchRows = Multimodal.frameIndexRows(
      frames(video(24L, Seq("a", "b")), video(17L, Seq("c", "d"))))
    val guarded = Multimodal.indexedAssets(spark, idx, batchRows, nBuckets = 8)
    val plan = guarded.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("ab"),
      s"replay guard must prune index buckets:\n${plan.take(1200)}")
    // and semantics: 24 ≡ 0 (mod 8) collides with indexed asset 0's
    // bucket but not its id; 17 ≡ 1 — both buckets contain only seeds
    assert(guarded.as[Long].collect().toSet.subsetOf((0L until 16L).toSet))
  }
}
