package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) self-join via deletion-neighborhood blocking —
  * the FastSS / SymSpell family (Bocek et al. 2007, public algorithm):
  * `lev(a, b) ≤ k` implies the k-deletion neighborhoods of `a` and `b`
  * intersect, so candidate generation is a pure EQUI-join on deletion
  * variants, verified by one real `levenshtein` call per candidate pair —
  * never an all-pairs distance matrix. The entity-resolution rung of the
  * dedup family: exact dedup catches equal keys, MinHash/SimHash catch
  * near-equal documents, this catches near-equal SHORT STRINGS (names,
  * codes, vocabulary terms) where shingling has nothing to grip.
  *
  * Scale posture: |D_k(t)| ≤ L^k variants per term (L = term length), so
  * the exploded frame is corpus × L^k rows keyed by variant; a variant
  * bucket holds at most ~L·|Σ| terms FOR k=1 (every way to re-insert one
  * character), so Σ_bucket n² is structurally bounded — same shape as
  * the banded-LSH join, with the bound coming from the alphabet instead
  * of a band width. That alphabet bound is k=1-ONLY: at k≥2 a bucket
  * holds every term reachable by re-inserting TWO characters, and on
  * ID-structured corpora (shared literal prefix + digit tail, e.g.
  * TPC-H `c_name` = "Customer#" + 9 digits) dropping two tail digits
  * collapses O(corpus/|Σ|²)-sized cohorts into single buckets — bucket
  * depth grows LINEARLY with the corpus and candidate volume
  * quadratically (measured at sf0.1: 3,750 names → 226k variant
  * buckets, hottest 271 deep, 3.1M candidate pairs vs 7M brute — the
  * blocking only halves the work and loses to the n² matrix). Use k=1
  * for ID-like keys (or compose with [[fuzzySelfJoinWithin]]'s blocking
  * key to restore a bounded bucket); k≥2 is for natural-language terms
  * where no deletion variant is shared corpus-wide. For adversarial
  * corpora `maxBucket` drops variants
  * hotter than the bound from BOTH sides (the stop-hash trade: bounded
  * work, visible recall caveat — a dropped pair is recovered iff it
  * shares a cooler variant); the default keeps every variant so the
  * output is EXACT lev ≤ k semantics (q140's oracle is the plain n²
  * levenshtein join, algorithm-free).
  *
  * The PERSISTED index ([[writeVariantIndex]]) is the entity-resolution
  * member of the engine's delta-vs-index family (text q83, vectors q93,
  * frames q132, audio q133; names q144): `tb`-bucket-partitioned by term
  * hash so the overlap-safe [[appendVariantIndex]] and the streaming
  * replay guard read only the buckets a batch touches, with the build
  * depth in a `_FUZZY_META` sidecar so a probe never scans the index to
  * learn it.
  */
object FuzzyJoin {

  /** All distinct strings reachable from `t` by at most `k` deletions
    * (including `t` itself), as an array column. k is a LITERAL plan
    * parameter: the expression is k nested codegen'd transforms, not a
    * runtime loop.
    */
  private[graft] def deletionVariants(t: Column, k: Int): Column = {
    require(k >= 1 && k <= 2, s"deletionVariants: k in [1, 2], got $k")
    def deletions(c: Column): Column =
      transform(sequence(lit(0), length(c) - 1),
        i => concat(c.substr(lit(1), i), c.substr(i + lit(2), length(c))))
    val d1 = array_union(array(t), deletions(t))
    if (k == 1) d1
    else array_distinct(flatten(transform(d1, v =>
      array_union(array(v), deletions(v)))))
  }

  /** Variant-index rows for a name corpus: distinct (t, v) pairs, one per
    * term × deletion variant, with the build depth `k` riding every row
    * (a probe deeper than the index would silently lose pairs, so probes
    * validate it — from the `_FUZZY_META` sidecar on the persisted dir
    * form, or from this column on a bare DataFrame). Raw rows are only
    * append-identical for DISJOINT term batches; the persisted-dir path
    * routes every append through [[appendVariantIndex]]'s term-level
    * anti-join, which makes OVERLAPPING batches safe too (append ≡ full
    * rebuild, FuzzyJoinSpec-pinned both ways).
    */
  def variantIndexRows(names: DataFrame, nameCol: String,
                       maxDist: Int = 1): DataFrame =
    names.select(col(nameCol).cast("string").as("t")).distinct()
      .select(col("t"),
        explode(deletionVariants(col("t"), maxDist)).as("v"))
      .distinct()
      .withColumn("k", lit(maxDist))

  /** Sidecar carrying the index's build parameters (deletion depth k and
    * term-bucket count) — underscore-named so parquet readers of the dir
    * skip it. One tiny file: probes and appends read THIS, never an
    * aggregation over the index (the depth is a build-time constant; an
    * `agg(min("k"))` per probe is a full index scan at 100 TB — round-11
    * review finding).
    */
  private val MetaFile = "_FUZZY_META"

  private def writeMeta(spark: SparkSession, dir: String, maxDist: Int,
                        nBuckets: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, MetaFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s"$maxDist\n$nBuckets\n".getBytes("UTF-8"))
    finally out.close()
  }

  /** (build depth k, term-bucket count) of a persisted variant index —
    * one sidecar read, no index scan. Fails loudly on a pre-sidecar
    * layout: rebuild with [[writeVariantIndex]].
    */
  def indexMeta(spark: SparkSession, dir: String): (Int, Int) = {
    val p = new org.apache.hadoop.fs.Path(dir, MetaFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"fuzzy variant index at $dir lacks $MetaFile — rebuild it with " +
        "FuzzyJoin.writeVariantIndex (round-12 format)")
    val in = fs.open(p)
    val lines =
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        "UTF-8").split("\n")
      finally in.close()
    (lines(0).trim.toInt, lines(1).trim.toInt)
  }

  private def withBucket(rows: DataFrame, nBuckets: Int): DataFrame =
    rows.withColumn("tb",
      pmod(xxhash64(col("t")), lit(nBuckets.toLong)).cast("int"))

  /** Build the persisted variant index for a name corpus: [[variantIndexRows]]
    * partitioned by `tb = pmod(xxhash64(t), nBuckets)` plus the
    * `_FUZZY_META` sidecar. The bucket column exists for the append/replay
    * guard ([[indexedTerms]]) — the same one-consumer rationale as the
    * frame index's `ab` layout; probes drop it.
    */
  def writeVariantIndex(names: DataFrame, nameCol: String, dir: String,
                        maxDist: Int = 1, nBuckets: Int = 64): Unit = {
    val spark = names.sparkSession
    withBucket(variantIndexRows(names, nameCol, maxDist), nBuckets)
      .write.partitionBy("tb").mode("overwrite").parquet(dir)
    writeMeta(spark, dir, maxDist, nBuckets)
  }

  /** The index without its layout column — what probes read. */
  def readVariantIndex(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir).drop("tb")

  /** Terms from the index that collide with `terms` (a one-column `t`
    * frame) — reads ONLY the `tb` buckets the incoming terms hash into
    * (PartitionFilters; the candidate bucket list is bounded by nBuckets,
    * collect-safe by construction), so the overlap/replay check is
    * bounded by batch spread, not index size — the
    * [[graft.multimodal.Multimodal.indexedAssets]] discipline re-keyed
    * from asset ids to term hashes.
    */
  private[graft] def indexedTerms(spark: SparkSession, dir: String,
                                  terms: DataFrame,
                                  nBuckets: Int): DataFrame = {
    val buckets = withBucket(terms, nBuckets)
      .select(col("tb")).distinct().collect().map(_.getInt(0))
    spark.read.parquet(dir)
      .filter(col("tb").isin(buckets.map(Integer.valueOf).toIndexedSeq: _*))
      .select(col("t")).distinct()
  }

  /** Overlap-safe append: only terms NOT already indexed generate rows, so
    * a daily feed that re-sends yesterday's names (the normal case —
    * review finding: real feeds DO overlap) cannot duplicate index rows,
    * inflate variant-popularity counts, or spuriously trip the
    * `maxBucket` guard. The anti-join reads only the buckets the batch
    * hashes into; the variant build runs at the INDEX's depth (from the
    * sidecar), keeping every row's completeness contract uniform.
    * Append ≡ full rebuild over overlapping batches is FuzzyJoinSpec-pinned.
    */
  def appendVariantIndex(names: DataFrame, nameCol: String,
                         dir: String): Unit = {
    val spark = names.sparkSession
    val (k, nBuckets) = indexMeta(spark, dir)
    val terms = names.select(col(nameCol).cast("string").as("t")).distinct()
    val fresh = terms.join(indexedTerms(spark, dir, terms, nBuckets),
      Seq("t"), "left_anti")
    withBucket(variantIndexRows(fresh, "t", k), nBuckets)
      .write.partitionBy("tb").mode("append").parquet(dir)
  }

  /** The DELETE half of variant-index maintenance (takedowns): every
    * row of a term lives in its one `tb = hash(t)` bucket, so the
    * rewrite touches only the doomed terms' buckets — first pruned by
    * the terms' own hashes (PartitionFilters), then CONFIRMED by a
    * semi-join so a term that was never indexed rewrites nothing.
    * Emptied bucket dirs are removed outright (dynamic overwrite alone
    * would resurrect their old rows). Delete-after-append ≡
    * never-ingested is FuzzyJoinSpec-pinned row-identically and
    * certified through the q202 probe oracle. Single-writer, like every
    * compaction here.
    */
  def deleteFromVariantIndex(spark: SparkSession, dir: String,
                             names: DataFrame, nameCol: String): Unit = {
    val (_, nBuckets) = indexMeta(spark, dir)
    val doomed = names.select(col(nameCol).cast("string").as("t")).distinct()
    // the candidate pre-prune hashes with the SIDECAR's bucket count —
    // trusted index state, never a caller-supplied number
    val cand = withBucket(doomed, nBuckets)
      .select(col("tb")).distinct().collect().map(_.getInt(0))
    graft.maintenance.Compaction.deleteKeysFromBuckets(spark, dir,
      "tb", "t", doomed, Some(cand))
  }


  /** The shared probe body: delta variants equi-join the corpus index —
    * the corpus is never re-paired, the index never shuffled beyond the
    * variant join. The stop-variant guard counts corpus popularity by
    * DISTINCT term (`countDistinct(t)`), not rows, so duplicated rows —
    * impossible via [[appendVariantIndex]], possible via a raw writer —
    * can never push a variant over the cap and silently drop pairs.
    */
  private def probeCore(index: DataFrame, delta: DataFrame,
                        nameCol: String, maxDist: Int,
                        maxBucket: Int): DataFrame = {
    val dv = variantIndexRows(delta, nameCol, maxDist)
    val pruned =
      if (maxBucket == Int.MaxValue) index
      else {
        val hot = index.groupBy(col("v"))
          .agg(countDistinct(col("t")).as("_n"))
          .filter(col("_n") > maxBucket)
          .select(col("v"))
        index.join(broadcast(hot), Seq("v"), "left_anti")
      }
    pruned.select(col("t").as("name_a"), col("v"))
      .join(dv.select(col("t").as("name_b"), col("v")), Seq("v"))
      .select(col("name_a"), col("name_b"))
      .distinct()
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b")).cast("int"))
      .filter(col("dist") <= maxDist)
  }

  /** Delta-vs-index fuzzy probe over the PERSISTED index: depth validated
    * from the `_FUZZY_META` sidecar (no aggregation over the index — the
    * probe plan touches index rows only through the variant equi-join).
    * Output (name_a = corpus term, name_b = delta term, dist ≤ maxDist);
    * sides are kept distinct, so no ordering constraint.
    */
  def fuzzyProbe(spark: SparkSession, indexDir: String, delta: DataFrame,
                 nameCol: String, maxDist: Int = 1,
                 maxBucket: Int = Int.MaxValue): DataFrame = {
    val (k, _) = indexMeta(spark, indexDir)
    require(k >= maxDist,
      s"fuzzyProbe: index at $indexDir was built at depth $k < " +
        s"maxDist $maxDist — lev <= $maxDist completeness needs corpus " +
        s"variants at depth >= $maxDist; rebuild with writeVariantIndex")
    probeCore(readVariantIndex(spark, indexDir), delta, nameCol, maxDist,
      maxBucket)
  }

  /** [[fuzzyProbe]] for a bare in-memory index frame (no sidecar): the
    * depth check falls back to a 1-row aggregation over the index's `k`
    * column — bounded driver work, but a full index scan per call, so the
    * persisted-dir form is the one to use against an at-rest corpus (a
    * k=1 index probed at maxDist=2 would silently drop pairs like
    * abcd↔abxy whose only shared variant needs two corpus-side deletions).
    */
  def fuzzyAgainstIndex(index: DataFrame, delta: DataFrame,
                        nameCol: String, maxDist: Int = 1,
                        maxBucket: Int = Int.MaxValue): DataFrame = {
    require(index.columns.contains("k"),
      "fuzzyAgainstIndex: index lacks the depth column k — rebuild it " +
        "with variantIndexRows (round-11 format)")
    val depth = index.agg(min(col("k"))).collect().head
    if (!depth.isNullAt(0)) {
      require(depth.getInt(0) >= maxDist,
        s"fuzzyAgainstIndex: index depth ${depth.getInt(0)} < " +
          s"maxDist $maxDist — rebuild the index at depth >= $maxDist")
    }
    probeCore(index.drop("k"), delta, nameCol, maxDist, maxBucket)
  }

  /** Bucketed CATALOG variant of the persisted index — the exchange-free
    * probe posture (the q88/S8 layout applied to a delta-index family):
    * variant rows live in a catalog table BUCKETED AND SORTED BY `v`,
    * the probe's join key, so every probe plans with ZERO Exchange on
    * the index side — the delta's variants (batch-sized) shuffle into
    * the index's bucket layout; the at-rest corpus index never moves.
    * That is the complementary trade to [[writeVariantIndex]]'s `tb`
    * path layout: `tb` partition-prunes the APPEND/replay guard but the
    * probe join on `v` re-shuffles the index every run; `v` buckets make
    * the probe exchange-free but the append guard must scan the index's
    * `t` column (pruned to one column, still index-wide). A daily-delta
    * user probing a large at-rest corpus is probe-dominated, which makes
    * THIS the 100 TB layout; keep the path form where appends dominate.
    *
    * Build depth and bucket count ride the CATALOG as table properties —
    * the `_FUZZY_META` sidecar re-expressed in catalog terms; probes and
    * appends read the properties, never an aggregation over index rows.
    */
  def writeVariantTable(names: DataFrame, nameCol: String, table: String,
                        maxDist: Int = 1, nBuckets: Int = 8): Unit = {
    val spark = names.sparkSession
    graft.sources.Tables.clearOrphanedWarehouseDir(spark, table)
    variantIndexRows(names, nameCol, maxDist)
      .select(col("t"), col("v"))
      .write.mode("overwrite")
      .bucketBy(nBuckets, "v").sortBy("v")
      .format("parquet").saveAsTable(table)
    graft.sources.Tables.setTableMetaInts(spark, table, "graft.fuzzy",
      "k" -> maxDist, "nbuckets" -> nBuckets)
  }

  /** (build depth k, bucket count) of a variant TABLE, from its catalog
    * properties ([[graft.sources.Tables.tableMetaInts]]). Fails loudly
    * on a table not built by [[writeVariantTable]].
    */
  def tableMeta(spark: SparkSession, table: String): (Int, Int) = {
    val Seq(k, nb) = graft.sources.Tables.tableMetaInts(spark, table,
      "graft.fuzzy", Seq("k", "nbuckets"), "FuzzyJoin.writeVariantTable")
    (k, nb)
  }

  /** Overlap-safe append to the bucketed variant table: the same
    * term-level anti-join contract as [[appendVariantIndex]] (append ≡
    * full rebuild over overlapping batches, spec-pinned), at this
    * layout's documented cost — the already-indexed probe reads the
    * table's `t` column index-wide instead of partition-pruning. The
    * fresh rows append THROUGH the catalog with the table's own bucket
    * spec, so the exchange-free probe contract survives every append
    * (each append adds files per bucket; compact by rebuilding via
    * [[writeVariantTable]] when file counts matter).
    */
  def appendVariantTable(names: DataFrame, nameCol: String,
                         table: String): Unit = {
    val spark = names.sparkSession
    val (k, nBuckets) = tableMeta(spark, table)
    val terms = names.select(col(nameCol).cast("string").as("t")).distinct()
    val fresh = terms.join(
      spark.table(table).select(col("t")).distinct(), Seq("t"), "left_anti")
    variantIndexRows(fresh, "t", k)
      .select(col("t"), col("v"))
      .write.mode("append")
      .bucketBy(nBuckets, "v").sortBy("v")
      .format("parquet").saveAsTable(table)
  }

  /** [[fuzzyProbe]] against the bucketed catalog table: depth validated
    * from the table properties; the variant equi-join reads the index
    * side bucket-aligned — zero Exchange on the corpus index
    * (PlanSpec-pinned), the one shuffle is the delta's own variants.
    */
  def fuzzyProbeTable(spark: SparkSession, table: String, delta: DataFrame,
                      nameCol: String, maxDist: Int = 1,
                      maxBucket: Int = Int.MaxValue): DataFrame = {
    val (k, _) = tableMeta(spark, table)
    require(k >= maxDist,
      s"fuzzyProbeTable: table $table was built at depth $k < " +
        s"maxDist $maxDist — lev <= $maxDist completeness needs corpus " +
        s"variants at depth >= $maxDist; rebuild with writeVariantTable")
    probeCore(spark.table(table), delta, nameCol, maxDist, maxBucket)
  }

  /** Record-linkage form: fuzzy name pairs WITHIN exact blocking keys —
    * `lev(name_a, name_b) ≤ maxDist` AND equal `keyCols` (the classic
    * composition: a cheap exact attribute narrows the candidate space
    * before the expensive fuzzy comparison ever runs). Implemented by
    * adding the keys to the variant equi-join — each deletion-variant
    * bucket splits by key value, so the Σ_bucket n² bound TIGHTENS by
    * the key's selectivity for free; no post-filter, the key rides the
    * shuffle. Output (keyCols..., name_a < name_b, dist); distinct
    * (name, keys) rows pair once, mirroring [[fuzzySelfJoin]].
    */
  def fuzzySelfJoinWithin(names: DataFrame, nameCol: String,
                          keyCols: Seq[String], maxDist: Int = 1,
                          maxBucket: Int = Int.MaxValue): DataFrame = {
    require(keyCols.nonEmpty,
      "fuzzySelfJoinWithin: empty keyCols — use fuzzySelfJoin")
    val terms = names
      .select(col(nameCol).cast("string").as("t") +: keyCols.map(col): _*)
      .distinct()
    val v = terms.select(col("t") +: keyCols.map(col) :+
      explode(deletionVariants(col("t"), maxDist)).as("v"): _*)
    val joinKeys = "v" +: keyCols
    val pruned =
      if (maxBucket == Int.MaxValue) v
      else {
        val hot = v.groupBy(joinKeys.map(col): _*)
          .agg(countDistinct(col("t")).as("_n"))
          .filter(col("_n") > maxBucket)
          .select(joinKeys.map(col): _*)
        v.join(broadcast(hot), joinKeys, "left_anti")
      }
    pruned.as("a")
      .join(pruned.as("b"), joinKeys)
      .filter(col("a.t") < col("b.t"))
      .select(keyCols.map(k => col(s"a.$k").as(k)) ++
        Seq(col("a.t").as("name_a"), col("b.t").as("name_b")): _*)
      .distinct()
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b")).cast("int"))
      .filter(col("dist") <= maxDist)
  }

  /** Distinct unordered pairs of distinct values of `nameCol` with
    * `lev ≤ maxDist`: (name_a < name_b, dist). `maxBucket < Int.MaxValue`
    * trades exactness for bounded hot buckets (see object doc); its
    * popularity count is by distinct term, matching the probe's.
    */
  def fuzzySelfJoin(names: DataFrame, nameCol: String, maxDist: Int = 1,
                    maxBucket: Int = Int.MaxValue): DataFrame = {
    val terms = names.select(col(nameCol).cast("string").as("t")).distinct()
    val v = terms.select(col("t"),
      explode(deletionVariants(col("t"), maxDist)).as("v"))
    val pruned =
      if (maxBucket == Int.MaxValue) v
      else {
        val hot = v.groupBy(col("v"))
          .agg(countDistinct(col("t")).as("_n"))
          .filter(col("_n") > maxBucket)
          .select(col("v"))
        v.join(broadcast(hot), Seq("v"), "left_anti")
      }
    pruned.as("a")
      .join(pruned.as("b"), Seq("v"))
      .filter(col("a.t") < col("b.t"))
      .select(col("a.t").as("name_a"), col("b.t").as("name_b"))
      .distinct()
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b")).cast("int"))
      .filter(col("dist") <= maxDist)
  }

  /** The entity-resolution two-stage shape: FastSS candidate generation
    * (RECALL — cheap, blocked, never n²) rescored by Jaro-Winkler
    * (PRECISION — the record-linkage literature's ranking metric, which
    * levenshtein distance approximates badly on transposed/prefixed names).
    * Keeps pairs with `jw >= minJw`; `dist` (edit distance) rides along so
    * the caller can see where the two metrics disagree. The 100 TB posture
    * is the whole point of the split: the O(l1·l2) scorer runs only on the
    * candidate set the deletion-variant equi-join produced, so its cost is
    * linear in CANDIDATES, not quadratic in the corpus.
    */
  def fuzzySelfJoinScored(names: DataFrame, nameCol: String,
                          maxDist: Int = 1, minJw: Double = 0.0,
                          maxBucket: Int = Int.MaxValue): DataFrame =
    fuzzySelfJoin(names, nameCol, maxDist, maxBucket)
      .withColumn("jw",
        graft.functions.GraftFunctions.jaro_winkler(
          col("name_a"), col("name_b")))
      .filter(col("jw") >= minJw)
}
