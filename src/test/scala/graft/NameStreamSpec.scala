package graft

import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.ops.FuzzyJoin
import graft.streaming.NameStream

/** Streaming name ingestion (NameStream): the tb-bucket-partitioned
  * variant index is the dedup state — replayed names, in-batch fuzzy
  * clusters, and corpus near-matches all die before the append, across
  * micro-batches and across full replays; the overlap-safe append keeps
  * the index row set identical to a one-shot build throughout.
  */
class NameStreamSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(StructField("name", StringType)))

  private def indexedNames(idx: String) =
    FuzzyJoin.readVariantIndex(spark, idx)
      .select($"t").distinct().as[String].collect().toSet

  test("ingest: replay guard, in-batch components, corpus precedence — full replay appends nothing") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nstream").toString
    val src = s"$dir/src"
    val idx = s"$dir/idx"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))

    // seed corpus: two far-apart names
    FuzzyJoin.writeVariantIndex(Seq("kitten", "orange").toDF("name"),
      "name", idx, maxDist = 1, nBuckets = 8)

    // one batch carrying every dup mode plus one genuine survivor:
    //  - "kitten": re-delivered verbatim            -> replay guard
    //  - "kitteno": lev 1 from corpus "kitten"      -> corpus precedence
    //  - "banana"/"banan"/"bananna": in-batch chain -> min "banan" survives
    //  - "quartz": far from everything              -> survives
    val batch = Seq("kitten", "kitteno", "banana", "banan", "bananna",
      "quartz").toDF("name")
    batch.coalesce(1).write.mode("overwrite").parquet(s"$src/b1")
    NameStream.ingestQuery(spark, s"$src/*", idx, s"$dir/cp1", schema)
      .awaitTermination()
    assert(indexedNames(idx) == Set("kitten", "orange", "banan", "quartz"),
      "only the in-batch survivor and the new name may join the corpus")

    // full replay (same rows, new file, FRESH checkpoint — the harshest
    // at-least-once case): survivors die on the replay guard, the rest
    // lose to the same deterministic pipeline
    batch.coalesce(1).write.mode("overwrite").parquet(s"$src/b2")
    NameStream.ingestQuery(spark, s"$src/*", idx, s"$dir/cp2", schema)
      .awaitTermination()
    assert(indexedNames(idx) == Set("kitten", "orange", "banan", "quartz"),
      "a replayed batch must append nothing")

    // the index stays probe-consistent with a one-shot build over the
    // surviving corpus: same pairs for a fresh delta
    val rebuilt = java.nio.file.Files.createTempDirectory("graft-nstream-r").toString
    FuzzyJoin.writeVariantIndex(
      Seq("kitten", "orange", "banan", "quartz").toDF("name"), "name",
      rebuilt, maxDist = 1, nBuckets = 8)
    val delta = Seq("mitten", "quart").toDF("name")
    def pairs(d: String) = FuzzyJoin.fuzzyProbe(spark, d, delta, "name")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs(idx) == pairs(rebuilt))
    assert(pairs(idx) == Set(("kitten", "mitten"), ("quartz", "quart")))
  }

  test("chained batches: later arrivals lose to earlier survivors") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nstream2").toString
    val src = s"$dir/src"
    val idx = s"$dir/idx"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    FuzzyJoin.writeVariantIndex(Seq("alpha").toDF("name"), "name", idx,
      maxDist = 1, nBuckets = 4)
    // batch 1: "gamma" survives; batch 2: "gamm" (lev 1 of gamma) loses
    // to the now-indexed batch-1 survivor, "delta" survives
    Seq("gamma").toDF("name").coalesce(1)
      .write.mode("overwrite").parquet(s"$src/b1")
    NameStream.ingestQuery(spark, s"$src/*", idx, s"$dir/cp1", schema)
      .awaitTermination()
    Seq("gamm", "delta").toDF("name").coalesce(1)
      .write.mode("overwrite").parquet(s"$src/b2")
    NameStream.ingestQuery(spark, s"$src/*", idx, s"$dir/cp2", schema)
      .awaitTermination()
    assert(indexedNames(idx) == Set("alpha", "gamma", "delta"))
    // compaction is part of the same maintenance story as the other
    // index streams: probe parity and further appends survive it
    graft.maintenance.Compaction.compactPartitioned(spark, idx, "tb")
    assert(indexedNames(idx) == Set("alpha", "gamma", "delta"))
    Seq("omega").toDF("name").coalesce(1)
      .write.mode("overwrite").parquet(s"$src/b3")
    NameStream.ingestQuery(spark, s"$src/*", idx, s"$dir/cp3", schema)
      .awaitTermination()
    assert(indexedNames(idx) ==
      Set("alpha", "gamma", "delta", "omega"))
  }
}
