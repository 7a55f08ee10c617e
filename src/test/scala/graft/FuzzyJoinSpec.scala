package graft

import org.apache.spark.sql.functions._

import graft.ops.FuzzyJoin

/** Pins for [[graft.ops.FuzzyJoin]]: deletion-variant algebra, blocked ≡
  * brute-force at d ∈ {1, 2} on a fixture covering every edit kind
  * (substitution, insertion, deletion, transposition), and the
  * hot-bucket guard's drop semantics.
  */
class FuzzyJoinSpec extends SparkSpec {

  import spark.implicits._

  // substitution (kitten/mitten d=1), deletion (kitten/kiten d=1),
  // insertion (kitten/kittten d=1), transposition (kitten/iktten d=2),
  // double substitution (mitten/mutton d=2), far word (orange).
  private lazy val words = Seq("kitten", "mitten", "kiten", "kittten",
    "iktten", "mutton", "orange", "oranje").toDF("w")

  private def brute(maxDist: Int) =
    words.select(col("w").as("name_a")).crossJoin(
        words.select(col("w").as("name_b")))
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("int"))
      .filter(col("dist") <= maxDist)

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("name_a", "name_b", "dist").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet

  test("deletion variants: exactly the ≤k-deletion neighborhood") {
    val v1 = words.filter(col("w") === "abc")
    val got = Seq("abc").toDF("w")
      .select(explode(FuzzyJoin.deletionVariants(col("w"), 1)).as("v"))
      .as[String].collect().toSet
    assert(got === Set("abc", "bc", "ac", "ab"))
    val got2 = Seq("abc").toDF("w")
      .select(explode(FuzzyJoin.deletionVariants(col("w"), 2)).as("v"))
      .as[String].collect().toSet
    assert(got2 === Set("abc", "bc", "ac", "ab", "a", "b", "c"))
    assert(v1.count() === 0) // fixture sanity: "abc" not among the words
  }

  test("blocked join == brute force at d=1 (sub/ins/del all found)") {
    val got = pairs(FuzzyJoin.fuzzySelfJoin(words, "w", maxDist = 1))
    assert(got === pairs(brute(1)))
    assert(got.contains(("kitten", "mitten", 1))) // substitution
    assert(got.contains(("kiten", "kitten", 1))) // deletion
    assert(got.contains(("kitten", "kittten", 1))) // insertion
  }

  test("blocked join == brute force at d=2 (transposition found)") {
    val got = pairs(FuzzyJoin.fuzzySelfJoin(words, "w", maxDist = 2))
    assert(got === pairs(brute(2)))
    assert(got.contains(("iktten", "kitten", 2))) // transposition
    assert(got.contains(("mitten", "mutton", 2))) // double substitution
    assert(!got.exists { case (a, b, _) => a == "orange" && b == "oranje" }
      || got.contains(("orange", "oranje", 1)))
  }

  test("duplicate input rows do not duplicate pairs") {
    val dup = words.union(words)
    assert(pairs(FuzzyJoin.fuzzySelfJoin(dup, "w", maxDist = 1)) ===
      pairs(brute(1)))
  }

  test("delta probe == batch form restricted to corpus × delta") {
    val corpus = Seq("kitten", "mitten", "orange").toDF("w")
    val delta = Seq("kiten", "kittten", "oranje", "banana").toDF("w")
    val idx = FuzzyJoin.variantIndexRows(corpus, "w")
    val probe = FuzzyJoin.fuzzyAgainstIndex(idx, delta, "w")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    // brute restriction: corpus side × delta side
    val brute = corpus.select(col("w").as("name_a"))
      .crossJoin(delta.select(col("w").as("name_b")))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("int"))
      .filter(col("dist") <= 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(probe === brute)
    assert(probe.contains(("kitten", "kiten", 1)))
    assert(!probe.exists(_._2 == "banana"))
  }

  test("delta probe refuses an index shallower than the probe distance") {
    // a k=1 index probed at maxDist=2 would silently drop pairs whose
    // only shared variant needs two corpus-side deletions
    val idx1 = FuzzyJoin.variantIndexRows(Seq("abcd").toDF("w"), "w",
      maxDist = 1)
    intercept[IllegalArgumentException] {
      FuzzyJoin.fuzzyAgainstIndex(idx1, Seq("abxy").toDF("w"), "w",
        maxDist = 2).collect()
    }
    // and a deep-enough index finds the lev-2 pair
    val idx2 = FuzzyJoin.variantIndexRows(Seq("abcd").toDF("w"), "w",
      maxDist = 2)
    val got = FuzzyJoin.fuzzyAgainstIndex(idx2, Seq("abxy").toDF("w"), "w",
      maxDist = 2).collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq === Seq(("abcd", "abxy")))
  }

  test("variant index: append of disjoint term batches == full rebuild") {
    val b1 = Seq("kitten", "mitten").toDF("w")
    val b2 = Seq("orange", "oranje").toDF("w")
    val dir = java.nio.file.Files.createTempDirectory("graft-fuzzyidx").toString
    FuzzyJoin.variantIndexRows(b1, "w").write.mode("append").parquet(dir)
    FuzzyJoin.variantIndexRows(b2, "w").write.mode("append").parquet(dir)
    val appended = spark.read.parquet(dir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val full = FuzzyJoin.variantIndexRows(b1.union(b2), "w")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(appended === full)
  }

  test("blocked (record-linkage) form == brute force within each key") {
    // same spellings in two blocks: cross-block pairs must vanish even
    // at lev 0..1, in-block pairs must match the unblocked brute force
    val recs = Seq(
      ("kitten", 1), ("mitten", 1), ("kiten", 2), ("kitten", 2),
      ("orange", 1), ("oranje", 2)).toDF("w", "g")
    val got = FuzzyJoin.fuzzySelfJoinWithin(recs, "w", Seq("g"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getInt(3))).toSet
    val brute = recs.select(col("w").as("name_a"), col("g")).distinct()
      .join(recs.select(col("w").as("name_b"), col("g")).distinct(), Seq("g"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b")).cast("int"))
      .filter(col("dist") <= 1)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getInt(3))).toSet
    assert(got === brute)
    // block 1 pairs kitten~mitten; block 2 pairs kiten~kitten; the
    // cross-block kitten(1)~kiten(2) and orange(1)~oranje(2) are gone
    assert(got === Set((1, "kitten", "mitten", 1), (2, "kiten", "kitten", 1)))
  }

  test("persisted index: OVERLAPPING appends == full rebuild (row-identical)") {
    val b1 = Seq("kitten", "mitten", "orange").toDF("w")
    // b2 re-sends kitten and orange — the daily-feed reality
    val b2 = Seq("kitten", "orange", "oranje", "mutton").toDF("w")
    val dir = java.nio.file.Files.createTempDirectory("graft-fuzzyidx-o").toString
    FuzzyJoin.writeVariantIndex(b1, "w", dir, nBuckets = 8)
    FuzzyJoin.appendVariantIndex(b2, "w", dir)
    val rebuilt = java.nio.file.Files.createTempDirectory("graft-fuzzyidx-r").toString
    FuzzyJoin.writeVariantIndex(b1.union(b2), "w", rebuilt, nBuckets = 8)
    def rows(d: String) = FuzzyJoin.readVariantIndex(spark, d)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows(dir).sorted === rows(rebuilt).sorted,
      "overlap-appended index must equal the one-shot rebuild, with no " +
        "duplicated rows")
    assert(rows(dir).size === rows(dir).distinct.size)
    // and a guarded probe over the appended index == over the rebuild
    // (duplicated rows would inflate variant popularity and could trip
    // maxBucket into dropping pairs — the silent-loss mode this closes)
    val delta = Seq("kiten", "oranje2", "muton").toDF("w")
    def probe(d: String) = FuzzyJoin.fuzzyProbe(spark, d, delta, "w",
        maxBucket = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(probe(dir) === probe(rebuilt))
  }

  test("variant index delete == never-ingested (row-identical); emptied buckets; no-op") {
    val keep = Seq("kitten", "mitten", "orange").toDF("w")
    val doomed = Seq("zzzzzz", "qqqqqq").toDF("w")
    val dir = java.nio.file.Files.createTempDirectory("graft-fuzzyidx-d").toString
    FuzzyJoin.writeVariantIndex(keep.union(doomed), "w", dir, nBuckets = 8)
    val bucketsBefore = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("tb=")).map(_.getName).toSet
    FuzzyJoin.deleteFromVariantIndex(spark, dir, doomed, "w")
    val clean = java.nio.file.Files.createTempDirectory("graft-fuzzyidx-c").toString
    FuzzyJoin.writeVariantIndex(keep, "w", clean, nBuckets = 8)
    def rows(d: String) = FuzzyJoin.readVariantIndex(spark, d)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    assert(rows(dir) === rows(clean),
      "delete-after-ingest must equal the never-ingested build")
    // buckets holding ONLY doomed terms' variants must be gone from disk
    // (dynamic overwrite alone would leave their old files resurrectable)
    val bucketsClean = new java.io.File(clean).listFiles()
      .filter(_.getName.startsWith("tb=")).map(_.getName).toSet
    val bucketsAfter = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("tb=")).map(_.getName).toSet
    assert(bucketsAfter == bucketsClean &&
      (bucketsBefore -- bucketsAfter).nonEmpty,
      s"emptied buckets must be removed: before=$bucketsBefore after=$bucketsAfter")
    // deleting never-indexed terms rewrites nothing (mtimes untouched)
    val stamps = new java.io.File(dir).listFiles().map(f =>
      f.getName -> f.lastModified()).toMap
    FuzzyJoin.deleteFromVariantIndex(spark, dir,
      Seq("absent1", "absent2").toDF("w"), "w")
    assert(new java.io.File(dir).listFiles().map(f =>
      f.getName -> f.lastModified()).toMap == stamps,
      "a no-hit delete must be a physical no-op")
  }

  test("bucketed variant TABLE: probe == dir probe; overlapping append == rebuild") {
    val b1 = Seq("kitten", "mitten", "orange").toDF("w")
    val b2 = Seq("kitten", "orange", "oranje", "mutton").toDF("w")
    val delta = Seq("kiten", "oranje2", "muton").toDF("w")
    // path-layout twin: the two layouts must answer identically
    val dir = java.nio.file.Files.createTempDirectory("graft-fztbl-d").toString
    FuzzyJoin.writeVariantIndex(b1, "w", dir, nBuckets = 8)
    FuzzyJoin.appendVariantIndex(b2, "w", dir)
    FuzzyJoin.writeVariantTable(b1, "w", "graft_fztbl_a", nBuckets = 4)
    FuzzyJoin.appendVariantTable(b2, "w", "graft_fztbl_a")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val viaTable = pairs(FuzzyJoin.fuzzyProbeTable(spark, "graft_fztbl_a",
      delta, "w"))
    assert(viaTable === pairs(FuzzyJoin.fuzzyProbe(spark, dir, delta, "w")))
    // overlapping append ≡ one-shot rebuild, no duplicated rows
    FuzzyJoin.writeVariantTable(b1.union(b2), "w", "graft_fztbl_r",
      nBuckets = 4)
    def rows(tbl: String) = spark.table(tbl)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows("graft_fztbl_a").sorted === rows("graft_fztbl_r").sorted)
    assert(rows("graft_fztbl_a").size === rows("graft_fztbl_a").distinct.size)
    // depth ships in the catalog properties; a shallow table is refused
    assert(FuzzyJoin.tableMeta(spark, "graft_fztbl_a") === ((1, 4)))
    intercept[IllegalArgumentException] {
      FuzzyJoin.fuzzyProbeTable(spark, "graft_fztbl_a", delta, "w",
        maxDist = 2)
    }
    // a table not built by writeVariantTable fails loudly (clear a
    // location orphaned by a previous JVM first — this plain saveAsTable
    // lacks writeVariantTable's own orphan guard)
    graft.sources.Tables.clearOrphanedWarehouseDir(spark, "graft_fztbl_bare")
    b1.write.mode("overwrite").saveAsTable("graft_fztbl_bare")
    intercept[IllegalArgumentException] {
      FuzzyJoin.fuzzyProbeTable(spark, "graft_fztbl_bare", delta, "w")
    }
  }

  test("probe depth comes from the sidecar, and a shallow index is refused") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fuzzyidx-m").toString
    FuzzyJoin.writeVariantIndex(Seq("abcd").toDF("w"), "w", dir,
      maxDist = 2, nBuckets = 4)
    assert(FuzzyJoin.indexMeta(spark, dir) === ((2, 4)))
    // the deep index answers a d=2 probe
    val got = FuzzyJoin.fuzzyProbe(spark, dir, Seq("abxy").toDF("w"), "w",
      maxDist = 2).collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq === Seq(("abcd", "abxy")))
    // overwrite the sidecar to claim depth 1: the probe must refuse from
    // the SIDECAR alone — proving the depth source is the metadata read,
    // not a scan of the index's k column (which still says 2)
    val p = new org.apache.hadoop.fs.Path(dir, "_FUZZY_META")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    out.write("1\n4\n".getBytes("UTF-8")); out.close()
    intercept[IllegalArgumentException] {
      FuzzyJoin.fuzzyProbe(spark, dir, Seq("abxy").toDF("w"), "w",
        maxDist = 2)
    }
    // a pre-sidecar layout fails loudly too
    fs.delete(p, false)
    intercept[IllegalArgumentException] {
      FuzzyJoin.fuzzyProbe(spark, dir, Seq("abxy").toDF("w"), "w")
    }
  }

  test("append's overlap check is bucket-pruned (PartitionFilters on tb)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fuzzyidx-pp").toString
    FuzzyJoin.writeVariantIndex(
      (0 until 64).map(i => s"term$i").toDF("w"), "w", dir, nBuckets = 8)
    val terms = Seq("term3", "newterm").toDF("t")
    val guarded = FuzzyJoin.indexedTerms(spark, dir, terms, nBuckets = 8)
    val plan = guarded.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("tb"),
      s"overlap check must prune index buckets:\n${plan.take(1200)}")
    assert(guarded.collect().map(_.getString(0)).contains("term3"))
  }

  test("scored two-stage == brute candidates rescored, at k in {1, 2}") {
    // The q165 shape kept at spec level for k=2 (the bench registration
    // is k=1 — deletion-variant blocking degenerates on ID-structured
    // corpora at k>=2, see the FuzzyJoin scaladoc): FastSS candidates
    // rescored by the codegen'd JaroWinkler expression must equal the
    // n² form's survivors, jw column bit-identical (same expression on
    // both sides; cross-engine bit-identity is JaroWinklerSpec's job).
    def bruteScored(maxDist: Int, minJw: Double) =
      brute(maxDist).withColumn("jw",
          graft.functions.GraftFunctions.jaro_winkler(
            col("name_a"), col("name_b")))
        .filter(col("jw") >= minJw)
    def scoredPairs(df: org.apache.spark.sql.DataFrame) =
      df.select("name_a", "name_b", "dist", "jw").collect()
        .map(r => (r.getString(0), r.getString(1), r.getInt(2),
          java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
    Seq(1, 2).foreach { k =>
      val got = scoredPairs(
        FuzzyJoin.fuzzySelfJoinScored(words, "w", maxDist = k, minJw = 0.8))
      assert(got === scoredPairs(bruteScored(k, 0.8)),
        s"scored two-stage != brute rescored at k=$k")
      assert(got.nonEmpty, s"fixture must keep some jw >= 0.8 pairs at k=$k")
    }
    // the precision stage really filters: a low-jw lev<=2 pair dies
    val all = scoredPairs(
      FuzzyJoin.fuzzySelfJoinScored(words, "w", maxDist = 2, minJw = 0.0))
    val kept = scoredPairs(
      FuzzyJoin.fuzzySelfJoinScored(words, "w", maxDist = 2, minJw = 0.8))
    assert(kept.subsetOf(all) && kept.size < all.size,
      "minJw must drop low-precision candidates, never add")
  }

  test("hot-bucket guard drops pairs only reachable through hot variants") {
    // "aa","ab",...: deleting one char maps many terms onto 1-char
    // variants; with maxBucket 2 those buckets vanish and only pairs
    // sharing a cooler variant survive.
    val tight = FuzzyJoin.fuzzySelfJoin(words, "w", maxDist = 1,
      maxBucket = 2)
    assert(pairs(tight).subsetOf(pairs(brute(1))),
      "the guard may lose pairs, never invent them")
    // and with a generous bound the guard is a no-op
    assert(pairs(FuzzyJoin.fuzzySelfJoin(words, "w", maxDist = 1,
      maxBucket = 1000)) === pairs(brute(1)))
  }
}
