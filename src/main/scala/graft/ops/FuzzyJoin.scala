package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
  * bucket holds at most ~L·|Σ| terms for k=1 (every way to re-insert one
  * character), so Σ_bucket n² is structurally bounded — same shape as
  * the banded-LSH join, with the bound coming from the alphabet instead
  * of a band width. For adversarial corpora `maxBucket` drops variants
  * hotter than the bound from BOTH sides (the stop-hash trade: bounded
  * work, visible recall caveat — a dropped pair is recovered iff it
  * shares a cooler variant); the default keeps every variant so the
  * output is EXACT lev ≤ k semantics (q140's oracle is the plain n²
  * levenshtein join, algorithm-free).
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

  /** Persistable variant-index rows for a name corpus: distinct
    * (t, v) pairs, one per term × deletion variant — the entity-resolution
    * member of the engine's delta-vs-index family (text q83, vectors q93,
    * frames q132, audio q133). Appendable batch-by-batch for DISJOINT
    * term batches (append ≡ full rebuild, FuzzyJoinSpec-pinned); a shared
    * term across batches would duplicate its rows — route appends through
    * a term-level anti-join if batches can overlap.
    */
  def variantIndexRows(names: DataFrame, nameCol: String,
                       maxDist: Int = 1): DataFrame =
    names.select(col(nameCol).cast("string").as("t")).distinct()
      .select(col("t"),
        explode(deletionVariants(col("t"), maxDist)).as("v"))
      .distinct()
      // the deletion depth the index was BUILT with rides every row: a
      // probe at a deeper maxDist than the index holds variants for
      // would silently lose pairs, so the probe validates it (review
      // finding — the scaladoc's exactness promise is k-bounded)
      .withColumn("k", lit(maxDist))

  /** Delta-vs-index fuzzy probe: each delta name generates its own
    * variants and equi-joins the PERSISTED corpus index — the corpus is
    * never re-paired, the index never shuffled beyond the variant join.
    * Output (name_a = corpus term, name_b = delta term, dist ≤ maxDist);
    * sides are kept distinct, so no ordering constraint. The stop-variant
    * guard reads corpus popularity from the index itself (> maxBucket
    * terms per variant → dropped both sides, the usual visible-recall
    * trade; default exact).
    */
  def fuzzyAgainstIndex(index: DataFrame, delta: DataFrame,
                        nameCol: String, maxDist: Int = 1,
                        maxBucket: Int = Int.MaxValue): DataFrame = {
    // fail loudly on a too-shallow index: lev ≤ maxDist completeness
    // needs corpus variants at depth ≥ maxDist (a k=1 index probed at
    // maxDist=2 would silently drop pairs like abcd↔abxy whose only
    // shared variant needs two corpus-side deletions). One 1-row agg
    // over the index — bounded driver work, same class as a manifest
    // read.
    require(index.columns.contains("k"),
      "fuzzyAgainstIndex: index lacks the depth column k — rebuild it " +
        "with variantIndexRows (round-11 format)")
    val depth = index.agg(min(col("k"))).collect().head
    if (!depth.isNullAt(0)) {
      require(depth.getInt(0) >= maxDist,
        s"fuzzyAgainstIndex: index depth ${depth.getInt(0)} < " +
          s"maxDist $maxDist — rebuild the index at depth >= $maxDist")
    }
    val dv = variantIndexRows(delta, nameCol, maxDist)
    val pruned =
      if (maxBucket == Int.MaxValue) index
      else {
        val hot = index.groupBy(col("v"))
          .agg(count(lit(1)).as("_n")).filter(col("_n") > maxBucket)
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

  /** Distinct unordered pairs of distinct values of `nameCol` with
    * `lev ≤ maxDist`: (name_a < name_b, dist). `maxBucket < Int.MaxValue`
    * trades exactness for bounded hot buckets (see object doc).
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
          .agg(count(lit(1)).as("_n")).filter(col("_n") > maxBucket)
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
}
