package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity search over embedding columns (SURVEY.md §2.3 J7 +
  * north star). All math runs through codegen'd higher-order functions
  * (`zip_with`/`aggregate`) in DOUBLE with sequential accumulation — the
  * same order DuckDB's `list_dot_product` uses, which is what makes the
  * oracle hash-compare exact.
  *
  * Scale design:
  *  - Brute force broadcasts the PROBES (small side) and makes one pass
  *    over the corpus: per-probe top-k via window rank, no corpus shuffle.
  *    Right answer for "few probes × huge corpus".
  *  - The LSH path buckets vectors by random-hyperplane sign bits computed
  *    over QUANTIZED components (integer dot products — exact, order-free,
  *    engine-independent), then joins within buckets only: cost is
  *    Σ_bucket n², tunable via the bit count. Right answer for
  *    "all-pairs similarity on a huge corpus".
  */
object Similarity {

  /** Sequential-order double dot product of two float arrays (HOF form). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** HOF cosine — kept as the compose-built-ins baseline; ~3 interpreted
    * lambda evaluations per element.
    */
  def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Cosine via the codegen'd [[graft.functions.CosineSimilarity]]
    * expression — one fused Java loop, bit-identical doubles to
    * [[cosineHof]] and the DuckDB oracle.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.cosine_similarity(a, b)

  /** Int8 codes of a float embedding ([[graft.functions.Sq8Encode]]) —
    * 1 byte/dim vs float32's 4, the scan-cost lever of [[searchIvfIndexSq8]].
    */
  def sq8Encode(emb: Column): Column =
    graft.functions.GraftFunctions.column(
      graft.functions.Sq8Encode(graft.functions.GraftFunctions.expr(emb)))

  /** Cosine of a float probe against [[sq8Encode]] codes — exact up to the
    * codes' ~7-bit direction rounding (the per-vector scale cancels).
    */
  def sq8Cosine(probe: Column, codes: Column): Column =
    graft.functions.GraftFunctions.column(
      graft.functions.Sq8Cosine(graft.functions.GraftFunctions.expr(probe),
        graft.functions.GraftFunctions.expr(codes)))

  /** Product-quantization parameters for [[writeIvfIndex]]: `m` subspaces
    * × `k` centroids each; `codebook` pins a pre-trained codebook (the
    * append ≡ full-build identity only holds under a FROZEN codebook),
    * None trains one on the indexed corpus with `trainIters` Lloyd rounds.
    * `opq = true` learns an orthonormal rotation first
    * ([[trainOpqRotation]]) and encodes in the rotated space — adopted
    * round 15 after the measured A/B (BASELINE.md: recall@5 0.800 →
    * 0.900 at equal bytes on the ablation corpus, identity init;
    * +0.04/+0.10/+0.06 across random-init seeds, over the ≥0.05 bar);
    * `rotation` pins a pre-learned matrix (frozen, like the codebook).
    * `opqIters`/`opqLloydIters` are the rotation-training depth handed
    * to [[trainOpqRotation]] — carried HERE so a caller's training
    * budget governs the OPQ alternation too (a seed-only rebuild must
    * not silently pay the full default 6×4 passes; the r15 advice).
    * A pinned `codebook` under `opq = true` must come with its matching
    * pinned `rotation`: the codebook was trained in SOME rotation
    * space, and re-learning a fresh R against it would encode rotated
    * vectors with centroids from a different basis (enforced loudly in
    * [[writeIvfIndex]]).
    */
  final case class PqConfig(m: Int = 8, k: Int = 16, trainIters: Int = 5,
                            codebook: Option[Array[Float]] = None,
                            opq: Boolean = false,
                            rotation: Option[Array[Float]] = None,
                            opqIters: Int = 6, opqLloydIters: Int = 4)

  private[graft] def writePqCodebook(spark: org.apache.spark.sql.SparkSession,
                              dir: String, cb: Array[Float],
                              m: Int, k: Int): Unit = {
    import spark.implicits._
    cb.toSeq.zipWithIndex.map { case (v, i) => (m, k, i, v) }
      .toDF("m", "k", "idx", "value")
      .write.mode("overwrite").parquet(s"$dir/pq_codebook")
  }

  private[graft] def readPqCodebook(spark: org.apache.spark.sql.SparkSession,
                             dir: String): (Array[Float], Int, Int) = {
    val rows = spark.read.parquet(s"$dir/pq_codebook").collect()
    val m = rows.head.getAs[Int]("m")
    val k = rows.head.getAs[Int]("k")
    val cb = new Array[Float](rows.length)
    rows.foreach(r => cb(r.getAs[Int]("idx")) = r.getAs[Float]("value"))
    (cb, m, k)
  }

  private[graft] def writePqRotation(spark: org.apache.spark.sql.SparkSession,
                                     dir: String, r: Array[Float]): Unit = {
    import spark.implicits._
    r.toSeq.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("idx", "value")
      .write.mode("overwrite").parquet(s"$dir/pq_rotation")
  }

  /** The index's learned rotation, None for unrotated (pre-OPQ) indexes —
    * the at-rest format stays self-describing either way.
    */
  private[graft] def readPqRotation(spark: org.apache.spark.sql.SparkSession,
                                    dir: String): Option[Array[Float]] =
    if (!graft.sources.Tables.pathExists(spark, s"$dir/pq_rotation")) None
    else {
      val rows = spark.read.parquet(s"$dir/pq_rotation").collect()
      val r = new Array[Float](rows.length)
      rows.foreach(row => r(row.getAs[Int]("idx")) = row.getAs[Float]("value"))
      Some(r)
    }

  /** R·emb via the codegen'd [[graft.functions.VecRotate]] (matrix rides
    * the plan like the codebook; rotation preserves cosine exactly).
    */
  def rotateVec(emb: Column, r: Array[Float]): Column = {
    val d = math.sqrt(r.length.toDouble).toInt
    graft.functions.GraftFunctions.column(
      graft.functions.VecRotate(
        graft.functions.GraftFunctions.expr(emb), r, d))
  }

  /** Learn the OPQ rotation (Ge et al., non-parametric): alternate a
    * per-subspace Lloyd codebook on the rotated sample with the
    * orthonormal R minimizing the quantization error ‖R·x − x̂‖_F
    * (Procrustes: R = U·Vᵀ from the SVD of Σ x̂·xᵀ). Training runs on a
    * DRIVER-COLLECTED sample — the FAISS discipline: OPQ needs cluster
    * geometry, not every point, so 10–100k vectors suffice at any corpus
    * scale (`sampleFraction` draws the same seeded Bernoulli sample as
    * [[trainPqCodebook]]); ENCODING stays distributed with the returned
    * matrix as plan state ([[rotateVec]]). Identity init — fully
    * deterministic, and the measured best (BASELINE.md round-15 table).
    * Returns the d×d row-major matrix.
    */
  def trainOpqRotation(corpus: DataFrame, m: Int, k: Int,
                       opqIters: Int = 6, lloydIters: Int = 4,
                       sampleFraction: Double = 1.0,
                       sampleSeed: Long = 42L,
                       maxSample: Int = 20000,
                       initRotation: Option[Array[Float]] = None)
      : Array[Float] = {
    require(sampleFraction > 0.0 && sampleFraction <= 1.0,
      s"trainOpqRotation: sampleFraction must be in (0, 1], got $sampleFraction")
    require(maxSample >= 1, s"trainOpqRotation: maxSample $maxSample")
    if (opqIters <= 0) {
      // zero alternations = the identity rotation (or the pinned init):
      // skip the sample collect entirely, so a trainIters = 0 seed-only
      // rebuild pays nothing here (the rebuild cost contract)
      initRotation.foreach(r0 => require({
        val d0 = math.sqrt(r0.length.toDouble).toInt; d0 * d0 == r0.length
      }, s"trainOpqRotation: initRotation length ${r0.length} is not square"))
      return initRotation.getOrElse {
        val head = corpus.select(col("embedding")).limit(1).collect()
        require(head.nonEmpty, "trainOpqRotation: empty corpus")
        val d = head(0).getSeq[Float](0).length
        Array.tabulate(d * d)(i => if (i / d == i % d) 1f else 0f)
      }
    }
    val train =
      if (sampleFraction >= 1.0) corpus
      else corpus.sample(withReplacement = false, sampleFraction, sampleSeed)
    // `maxSample` HARD-BOUNDS the driver collect independent of caller
    // discipline (20k × 64 dims is megabytes; OPQ needs cluster
    // geometry, not every point — the FAISS operating range). The bound
    // is an ordered limit by vec_id — one distributed top-k, never a
    // full collect — but a deterministic PREFIX of an ingest-ordered or
    // clustered corpus is a biased training set, so when the limit
    // would actually bind, a seeded Bernoulli pre-sample (cushioned to
    // land above maxSample w.h.p.) spreads the kept rows across the
    // whole corpus first; the ordered limit then only trims the cushion.
    // Under maxSample rows, behavior is byte-identical to before (the
    // count() is one aggregate on a corpus training already scans).
    val bounded = {
      val n = train.count()
      if (n <= maxSample) train
      else train.sample(withReplacement = false,
        math.min(1.0, 1.3 * maxSample / n), sampleSeed + 1)
    }
    val xs = bounded.orderBy(col("vec_id")).limit(maxSample)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(xs.length >= k,
      s"trainOpqRotation: training sample has ${xs.length} vectors, " +
        s"need >= $k — raise sampleFraction")
    val d = xs.head.length
    require(d % m == 0, s"trainOpqRotation: $d dims not divisible by m=$m")
    val sub = d / m
    def mul(r: Array[Double], v: Array[Double]): Array[Double] =
      Array.tabulate(d) { i =>
        var s = 0.0; var j = 0; val base = i * d
        while (j < d) { s += r(base + j) * v(j); j += 1 }; s
      }
    def lloyd(ys: Array[Array[Double]]): Array[Array[Array[Double]]] = {
      val cents = Array.tabulate(m, k)((mi, ki) =>
        ys(ki).slice(mi * sub, (mi + 1) * sub).clone())
      for (_ <- 0 until lloydIters; mi <- 0 until m) {
        val sums = Array.fill(k, sub)(0.0)
        val cnt = new Array[Int](k)
        ys.foreach { y =>
          var best = 0; var bd = Double.MaxValue
          var ki = 0
          while (ki < k) {
            var dd = 0.0; var si = 0
            while (si < sub) {
              val df = y(mi * sub + si) - cents(mi)(ki)(si); dd += df * df
              si += 1
            }
            if (dd < bd) { bd = dd; best = ki }
            ki += 1
          }
          cnt(best) += 1
          var si = 0
          while (si < sub) { sums(best)(si) += y(mi * sub + si); si += 1 }
        }
        for (ki <- 0 until k if cnt(ki) > 0; si <- 0 until sub)
          cents(mi)(ki)(si) = sums(ki)(si) / cnt(ki)
      }
      cents
    }
    def reconstruct(y: Array[Double],
                    cents: Array[Array[Array[Double]]]): Array[Double] = {
      val out = new Array[Double](d)
      for (mi <- 0 until m) {
        var best = 0; var bd = Double.MaxValue
        var ki = 0
        while (ki < k) {
          var dd = 0.0; var si = 0
          while (si < sub) {
            val df = y(mi * sub + si) - cents(mi)(ki)(si); dd += df * df
            si += 1
          }
          if (dd < bd) { bd = dd; best = ki }
          ki += 1
        }
        var si = 0
        while (si < sub) { out(mi * sub + si) = cents(mi)(best)(si); si += 1 }
      }
      out
    }
    initRotation.foreach(r0 => require(r0.length == d * d,
      s"trainOpqRotation: initRotation has ${r0.length} floats, " +
        s"expected ${d * d}"))
    var r = initRotation.map(_.map(_.toDouble))
      .getOrElse(Array.tabulate(d * d)(i => if (i / d == i % d) 1.0 else 0.0))
    for (_ <- 0 until opqIters) {
      val ys = xs.map(mul(r, _))
      val cents = lloyd(ys)
      val yh = ys.map(reconstruct(_, cents))
      val mm = breeze.linalg.DenseMatrix.zeros[Double](d, d)
      for (n <- xs.indices; i <- 0 until d; j <- 0 until d)
        mm(i, j) += yh(n)(i) * xs(n)(j)
      val breeze.linalg.svd.SVD(u, _, vt) = breeze.linalg.svd(mm)
      val ropt = u * vt
      r = Array.tabulate(d * d)(idx => ropt(idx / d, idx % d))
    }
    r.map(_.toFloat)
  }

  /** PQ codes of a float embedding ([[graft.functions.PqEncode]]) — `m`
    * bytes per vector (0.125 byte/dim at the 64-dim/m=8 default) vs
    * SQ8's 1 byte/dim; the codebook rides inside the plan.
    */
  def pqEncode(emb: Column, codebook: Array[Float], m: Int, k: Int): Column =
    graft.functions.GraftFunctions.column(
      graft.functions.PqEncode(
        graft.functions.GraftFunctions.expr(emb), codebook, m, k))

  /** Cosine of a float probe against [[pqEncode]] codes — bit-identical
    * to cosine(probe, reconstructed vector), spec-pinned.
    */
  def pqCosine(probe: Column, codes: Column, codebook: Array[Float],
               m: Int, k: Int): Column =
    graft.functions.GraftFunctions.column(
      graft.functions.PqCosine(
        graft.functions.GraftFunctions.expr(probe),
        graft.functions.GraftFunctions.expr(codes), codebook, m, k))

  /** Train a product-quantization codebook: per-subspace k-means over the
    * corpus (Lloyd iterations), returned as the flat row-major array
    * [[graft.functions.PqEncode]] consumes — centroid (mi, ki) at
    * `[(mi·k + ki)·sub, +sub)`.
    *
    * Deterministic init: the k lowest-`vec_id` vectors seed every
    * subspace (the IVF seed-centroid discipline). Each Lloyd round is
    * TWO distributed passes with nothing corpus-sized on the driver:
    * assignment happens inside the codegen'd [[graft.functions.PqEncode]]
    * scan (the codebook is plan state, no join), and the update is one
    * (mi, code, si)-keyed average — m·k·sub grouped rows (~4k floats at
    * the defaults) collected per round. Empty clusters keep their
    * previous centroid. At 100 TB you train on a sample and encode the
    * full corpus with the frozen codebook — the encode pass is the only
    * full-data scan, and it is map-side: pass `sampleFraction` < 1 and
    * every training pass (seed selection included) runs over a seeded
    * Bernoulli sample while the returned codebook still encodes the full
    * corpus. The sample is deterministic for a fixed source layout
    * (`sample` draws per-partition from the seed), so train-then-retrain
    * reproduces the same codebook — the property the frozen-codebook
    * append contract leans on. Operating point (VectorSpec-measured, 512
    * vecs, m=8, k=16): a half-corpus sample trains a codebook whose
    * refined recall@5 holds the 0.75 floor of the full-corpus build —
    * k-means needs cluster GEOMETRY, not every point, so the sample just
    * needs to cover the modes (≫ k·m points; 10–100k vectors is plenty
    * at 100 TB, i.e. fractions near 1e-6).
    *
    * OPQ-lite ablation (measured, rejected): a seeded random orthonormal
    * rotation of the space before subspace splitting — the cheap end of
    * OPQ (Ge et al.'s R, random instead of learned) — was measured at
    * equal bytes on the sf0.001 corpus, m=8 k=16 refine=50, recall@5 vs
    * brute force (VectorSpec "OPQ-lite ablation"): unrotated 0.800;
    * rotated 0.800 / 0.860 / 0.800 over seeds {5, 11, 23}. Median ties
    * the baseline and the spread is seed noise (±0.06), so the RANDOM
    * rotation is not adopted — a random R just reshuffles which
    * subspaces are lucky. The LEARNED rotation (full OPQ,
    * [[trainOpqRotation]]) was measured round 15 and ADOPTED: recall@5
    * 0.800 → 0.900 at equal bytes with deterministic identity init
    * (+0.04/+0.10/+0.06 across random inits — over the ≥0.05 bar);
    * `PqConfig(opq = true)` turns it on, and the production q127/q128
    * paths carry it (BASELINE.md round-15 table).
    */
  def trainPqCodebook(corpus: DataFrame, m: Int = 8, k: Int = 16,
                      iters: Int = 5, sampleFraction: Double = 1.0,
                      sampleSeed: Long = 42L): Array[Float] = {
    require(sampleFraction > 0.0 && sampleFraction <= 1.0,
      s"trainPqCodebook: sampleFraction must be in (0, 1], got $sampleFraction")
    val train =
      if (sampleFraction >= 1.0) corpus
      else corpus.sample(withReplacement = false, sampleFraction, sampleSeed)
    val d = train.select(size(col("embedding"))).head().getInt(0)
    require(d % m == 0, s"trainPqCodebook: $d dims not divisible by m=$m")
    val sub = d / m
    val seed = train.orderBy(col("vec_id").asc).limit(k)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    require(seed.length == k,
      s"trainPqCodebook: training set has ${seed.length} vectors, need >= $k " +
        "seeds — raise sampleFraction")
    var codebook = new Array[Float](m * k * sub)
    for (mi <- 0 until m; ki <- 0 until k; si <- 0 until sub)
      codebook((mi * k + ki) * sub + si) = seed(ki)(mi * sub + si)
    for (_ <- 0 until iters) {
      val means = train
        .select(col("vec_id"), col("embedding"),
          pqEncode(col("embedding"), codebook, m, k).as("codes"))
        .filter(col("codes").isNotNull)
        .select(col("embedding"), col("codes"),
          explode(sequence(lit(0), lit(d - 1))).as("i"))
        .select(
          (col("i") / sub).cast("int").as("mi"),
          conv(hex(expr(s"substr(codes, CAST(i / $sub AS INT) + 1, 1)")),
            16, 10).cast("int").as("code"),
          pmod(col("i"), lit(sub)).cast("int").as("si"),
          element_at(col("embedding"), col("i") + 1).cast("double").as("v"))
        .groupBy(col("mi"), col("code"), col("si"))
        .agg(avg(col("v")).as("mean"))
        .collect()
      val next = codebook.clone()
      means.foreach { r =>
        next((r.getAs[Int]("mi") * k + r.getAs[Int]("code")) * sub +
          r.getAs[Int]("si")) = r.getAs[Double]("mean").toFloat
      }
      codebook = next
    }
    codebook
  }

  /** The PQ-family refine-pool sizing rule, in ONE place: an explicit
    * `refine >= 0` wins; otherwise the pool is `refineFraction` of the
    * corpus, floored at the requested result width. `corpusRows` is
    * by-name so the auto path alone pays the row count.
    */
  private[graft] def resolveRefine(refine: Int, corpusRows: => Long,
                                   refineFraction: Double,
                                   floor: Int): Int = {
    require(refineFraction > 0 && refineFraction <= 1,
      s"refineFraction must be in (0, 1], got $refineFraction")
    if (refine >= 0) refine
    else math.max(floor, math.ceil(corpusRows * refineFraction).toInt)
  }

  /** Absolute floor of the AUTO-sized refine pool. The fraction rule
    * alone under-sizes SMALL corpora: a PQ codebook's rank inversions
    * have an absolute radius set by the quantization geometry (m·log2 k
    * bits/vector), not by corpus size, so below ~40k rows the pool must
    * cover that radius outright. Measured on the fitted scale fixtures
    * (m=8, k=16, recall@5 vs bruteForceTopK, iters=2 codebook):
    * emb3x (6k rows) pool 60 (1%) → 0.46, 200 → 0.74, 400 → 0.82;
    * emb10x (20k rows) pool 200 (1%) → 0.80 (boundary), 400 → 0.88.
    * At scale the 1% fraction dominates (400 < 1% past 40k rows), so
    * this floor costs nothing where the fraction rule is the binding
    * one. Callers with measured workloads pass an explicit `refine`.
    */
  private[graft] val MinRefinePool = 400

  private def autoRefineFloor(topK: Int): Int = math.max(topK, MinRefinePool)

  /** Top-k cosine neighbors via the PQ ranking scan + full-precision
    * refinement: rank ALL vectors per probe by [[pqCosine]] (a scan that
    * reads m bytes/vector — the 100 TB point of PQ), keep the top
    * `refine` candidates, re-score exactly against the float embeddings
    * (candidate-bounded read), emit the top `k`. `refine` trades recall
    * for the width of the exact pass; recall is spec-measured against
    * [[bruteForceTopK]]. Composes with IVF the same way
    * [[searchIvfIndexSq8]] does — the codes column simply replaces sq8's.
    *
    * `refine < 0` (the default) auto-sizes the pool as
    * `max(topK, MinRefinePool, ceil(refineFraction × corpus rows))` —
    * the round-19 ratio-vs-SF measurement's rule (a FIXED pool's recall
    * decays as the corpus grows past it: 160-at-20k held 0.82,
    * 160-at-200k would not) plus the round-20 measured absolute floor
    * (see [[MinRefinePool]]: the fraction alone starves recall on small
    * corpora), so the scale-correct posture is the API default rather
    * than a number every caller must know to grow. Sizing pays one
    * `count()` of the corpus frame; pass an explicit `refine` to skip
    * it (0 = no exact pass, quantized cosines returned as-is).
    */
  def searchPq(corpus: DataFrame, probes: DataFrame,
               codebook: Array[Float], m: Int, k: Int,
               topK: Int, refine: Int = -1,
               rotation: Option[Array[Float]] = None,
               refineFraction: Double = 0.01): DataFrame = {
    val refineN = resolveRefine(refine, corpus.count(), refineFraction,
      autoRefineFloor(topK))
    val embCol = rotation.fold(col("embedding"))(r =>
      rotateVec(col("embedding"), r))
    val coded = corpus.select(col("vec_id").as("neighbor_id"),
      pqEncode(embCol, codebook, m, k).as("codes"))
    val p = probes.select(col("vec_id").as("probe_id"),
      col("embedding").as("p_emb"))
    val probeEmb = rotation.fold(col("p_emb"))(r =>
      rotateVec(col("p_emb"), r))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    val approx = coded
      .join(broadcast(p), col("neighbor_id") =!= col("probe_id"))
      .withColumn("cosine", pqCosine(probeEmb, col("codes"), codebook, m, k))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= math.max(topK, refineN))
    if (refineN <= 0) {
      approx.select(col("probe_id"), col("neighbor_id"), col("rank"),
        col("cosine"))
    } else {
      corpus.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("n_emb"))
        .join(broadcast(approx.select(col("probe_id"), col("p_emb"),
          col("neighbor_id"))), Seq("neighbor_id"))
        .withColumn("cosine", cosine(col("p_emb"), col("n_emb")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= topK)
        .select(col("probe_id"), col("neighbor_id"), col("rank"),
          col("cosine"))
    }
  }

  /** Semantic decontamination — the EMBEDDING twin of the n-gram
    * decontamination family (q68/q79/q87): drop every corpus vector
    * whose cosine against ANY eval vector reaches `threshold`. The
    * leakage n-gram overlap cannot see — paraphrased or translated eval
    * material — lives exactly here. Scale shape: the eval set is
    * benchmark-sized, so it broadcasts into ONE corpus scan as a
    * nested-loop LEFT ANTI (per corpus row the codegen'd cosine runs
    * against eval vectors until the first hit — anti-join semantics
    * short-circuit), and the corpus never shuffles. The decision is the
    * bit-identical [[cosine]] expression, so the kept set is hash-exact
    * cross-engine (the q39 ≥-threshold discipline).
    */
  def decontaminateByCosine(corpus: DataFrame, evalSet: DataFrame,
                            threshold: Double): DataFrame =
    corpus.join(
      broadcast(evalSet.select(col("embedding").as("_e"))),
      cosine(col("embedding"), col("_e")) >= threshold,
      "left_anti")

  /** Brute-force exact top-k cosine neighbors for each probe vector. */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("n_emb"))
    val p = probes.select(col("vec_id").as("probe_id"),
      col("embedding").as("p_emb"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    c.join(broadcast(p), col("neighbor_id") =!= col("probe_id"))
      .withColumn("cosine", cosine(col("p_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("rank"), col("cosine"))
  }

  /** Random-hyperplane LSH bucket id (`bits` sign bits packed into a long).
    *
    * Components are quantized to `floor(x * 1000)` BEFORE the signed sum, so
    * the bucket decision is integer arithmetic: exactly reproducible in any
    * engine regardless of float summation order. The hyperplane entry for
    * (plane i, dim d) is the deterministic pseudo-sign of
    * `((i*31 + d) * 1103515245 + 12345) mod 97 < 48`.
    *
    * Production path: the codegen'd [[graft.functions.LshBucket]]
    * expression — one fused JVM loop per row instead of ~bits×dims
    * interpreted lambda steps (the round-1 bench's slowest data path), with
    * a loud error when `dims` doesn't match the embedding length (the HOF
    * form silently collapsed everything into bucket 0). Bit-identical
    * buckets to [[lshBucketHof]] and the DuckDB oracle.
    */
  def lshBucket(embCol: String, bits: Int = 8, dims: Int = 64,
                planeOffset: Int = 0): Column =
    graft.functions.LshBucketMath.lshBucketCol(col(embCol), bits, dims, planeOffset)

  /** The compose-built-ins HOF form of [[lshBucket]] — kept as the
    * cross-checkable baseline (InvarianceSpec asserts bucket equality).
    * ~bits×dims interpreted lambda evaluations per row; do not use in hot
    * paths.
    */
  def lshBucketHof(embCol: String, bits: Int = 8, dims: Int = 64,
                   planeOffset: Int = 0): Column = {
    val dotI =
      s"""aggregate(sequence(1, $dims), CAST(0 AS BIGINT), (acc, d) ->
         |  acc + CAST(floor(CAST(element_at($embCol, d) AS DOUBLE) * 1000) AS BIGINT)
         |        * (CASE WHEN (((CAST(i AS BIGINT) + $planeOffset) * 31 + d) * 1103515245 + 12345) % 97 < 48
         |           THEN 1 ELSE -1 END))""".stripMargin
    val bucket =
      s"""aggregate(sequence(0, ${bits - 1}), CAST(0 AS BIGINT), (acc2, i) ->
         |  acc2 + (CASE WHEN ($dotI) >= 0
         |          THEN shiftleft(CAST(1 AS BIGINT), CAST(i AS INT))
         |          ELSE CAST(0 AS BIGINT) END))""".stripMargin
    expr(bucket)
  }

  /** LSH-bucketed candidate pairs with verified exact cosine. The join key
    * is the bucket id; no cross-bucket pairs are ever materialized.
    * `planeOffset` selects an independent hyperplane family (used by the
    * multi-table variant).
    */
  /** Candidate vec-id pairs sharing a bucket in ONE hash table (ids only —
    * verification is a separate, join-once step).
    */
  private def lshCandidateIds(corpus: DataFrame, bits: Int,
                              planeOffset: Int, dims: Int): DataFrame = {
    // both self-join sides read the shared (bucket, vec_id) cache —
    // without it each side re-scans the corpus and re-computes the
    // bits×dims bucket projection (the lshCandidatePairsMulti finding at
    // T=1). Lazy persist, not localCheckpoint: there is no prior action
    // here, so an eager checkpoint would ADD a scheduling round-trip,
    // while the cache fills as a side effect of the join's own first
    // evaluation.
    val bucketed = corpus.select(col("vec_id"),
      lshBucket("embedding", bits, dims, planeOffset).as("bucket"))
      .persist()
    val a = bucketed.select(col("bucket"), col("vec_id").as("vec_a"))
    val b = bucketed.select(col("bucket"), col("vec_id").as("vec_b"))
    a.join(b, Seq("bucket")).filter(col("vec_a") < col("vec_b"))
  }

  /** Join candidate id-pairs back to embeddings ONCE and compute cosine. */
  private def verifyPairs(corpus: DataFrame, idPairs: DataFrame): DataFrame = {
    val ea = corpus.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
    val eb = corpus.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
    idPairs.join(ea, Seq("vec_a")).join(eb, Seq("vec_b"))
      .withColumn("cosine", cosine(col("emb_a"), col("emb_b")))
      .drop("emb_a", "emb_b")
  }

  /** LSH-bucketed candidate pairs with verified exact cosine. The join key
    * is the bucket id; no cross-bucket pairs are ever materialized.
    * `dims` must match the embedding length — enforced at runtime by
    * [[graft.functions.LshBucket]], which throws on mismatch instead of
    * silently collapsing the corpus into bucket 0 (an O(n²) cross join).
    */
  def lshCandidatePairs(corpus: DataFrame, bits: Int = 8,
                        planeOffset: Int = 0, dims: Int = 64): DataFrame =
    verifyPairs(corpus,
      lshCandidateIds(corpus, bits, planeOffset, dims)
        .select(col("bucket"), col("vec_a"), col("vec_b")))
      .select(col("bucket"), col("vec_a"), col("vec_b"), col("cosine"))

  /** Multi-table LSH (OR of `tables` independent hash tables): a pair is a
    * candidate if ANY table buckets it together. Standard recall lever —
    * single-table recall p becomes 1-(1-p)^T — at T× the bucketing cost.
    * Candidates are unioned and DEDUPED AS ID PAIRS first; the cosine is
    * computed once per distinct pair (not once per table collision).
    *
    * Operating regime (measured — BASELINE.md round-7 curve): hyperplane
    * LSH pays off ABOVE ~0.7 cosine, where p(same bucket) is large; at a
    * 0.4 threshold p ≈ 0.63^bits and even the multi-table OR recovers
    * <20% of true pairs. For low-threshold pair search use the blocked
    * exact forms ([[nearDupWithinLabel]], IVF-list-bucketed pairs).
    */
  def lshCandidatePairsMulti(corpus: DataFrame, bits: Int = 8,
                             tables: Int = 4, dims: Int = 64): DataFrame = {
    // All T bucket ids come from ONE corpus pass (each table is just a
    // different hyperplane family over the same vector), exploded to a
    // skinny (table, bucket, vec_id) frame shared by both self-join sides
    // via lazy persist (see lshCandidateIds for the persist-vs-checkpoint
    // measurement) — the per-table form re-scanned and re-projected the
    // corpus 2T times (measured: 10 FileScans at T=4, vs 3 now: bucketing
    // once, the two verify sides; 0.83 → 0.49 s at sf0.1). Keying the
    // self-join by (table, bucket) also widens the key space T× over a
    // per-table bucket join — at 8 bits a single table has only 256
    // reducer keys.
    val tb = corpus.select(col("vec_id"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"),
          lshBucket("embedding", bits, dims, planeOffset = t * bits)
            .as("bucket"))): _*)).as("_tb"))
      .select(col("_tb.t").as("t"), col("_tb.bucket").as("bucket"),
        col("vec_id"))
      .persist()
    val a = tb.select(col("t"), col("bucket"), col("vec_id").as("vec_a"))
    val b = tb.select(col("t"), col("bucket"), col("vec_id").as("vec_b"))
    val idPairs = a.join(b, Seq("t", "bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b")).distinct()
    verifyPairs(corpus, idPairs)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
  }

  /** IVF-flat approximate top-k cosine search (the ANN scale path next to
    * [[bruteForceTopK]]'s exact baseline and the LSH pair variants).
    *
    * Centroids here are the embeddings of the `nCentroids` lowest vec_ids —
    * the deterministic seed; [[trainCentroids]] refines them with Lloyd
    * iterations and [[writeIvfIndex]]`(trainIters > 0)` persists the
    * trained set (measurably better recall-per-probe on clustered data —
    * see the VectorSpec recall bound and the BASELINE.md curve). The
    * query path is identical either way. They are collected to the
    * driver (nCentroids × dims floats — broadcast-variable sized) and
    * inlined as literal arrays, so:
    *
    *  - list ASSIGNMENT is a pure map-side projection over the corpus —
    *    `array_min` over per-centroid (−cosine, c_id) structs — no join, no
    *    shuffle;
    *  - probe LIST SELECTION is the same projection over the probes plus a
    *    sort/slice of the K structs (top `nProbe` lists per probe);
    *  - SEARCH broadcasts the (probe, list) pairs and equi-joins on
    *    list_id, so cosine is computed only against the probed fraction
    *    (~nProbe/nCentroids) of the corpus, and the only exchange in the
    *    whole plan is the final per-probe top-k window over candidates.
    *
    * Exactness contract: ranks and cosines of returned rows are exact;
    * recall < 1 is the IVF trade (a true neighbor in an unprobed list is
    * missed). With `nProbe = nCentroids` every list is probed and the
    * result is row-identical to [[bruteForceTopK]] (property-tested).
    * Ties break (cosine desc, c_id asc / neighbor_id asc) in both engines.
    */
  def ivfTopK(corpus: DataFrame, probes: DataFrame, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    val cents = collectCentroids(
      corpus.orderBy(col("vec_id")).limit(nCentroids))
    val assigned = corpus.select(
      col("vec_id").as("neighbor_id"), col("embedding").as("n_emb"),
      array_min(centStructs(cents)(col("embedding"))).getField("c_id")
        .as("list_id"))
    ivfSearch(assigned, probeListsFor(probes, cents, nProbe), k)
  }

  private def collectCentroids(centroids: DataFrame): Array[(Long, Seq[Float])] =
    centroids.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))

  /** Deterministic Lloyd (k-means) refinement of the IVF centroids —
    * recall-per-probe is the product an IVF index sells, and the first-N
    * seed ignores the data distribution entirely (on clustered
    * embeddings several seeds land in one cluster and other clusters get
    * carved across far-away lists). Each iteration is ONE corpus pass:
    * list assignment is the same map-side literal-centroid projection the
    * query path uses, and the per-list per-dimension means reduce through
    * partial aggregation to k × dims rows on the driver.
    *
    * Determinism: float means are order-dependent under parallel
    * summation, which would make centroids — and therefore list layout
    * and recall — vary run to run. Components are quantized to 2^-20
    * grid longs BEFORE summing (exact, associative, partition-order
    * free), so training is bit-reproducible at any parallelism, the same
    * trick [[lshBucket]] uses for hyperplane signs. Quantization error
    * (≤ 5e-7 per component, embeddings are O(1)) is far below any recall
    * effect. Empty lists keep their previous centroid (standard Lloyd).
    *
    * Scale: driver state is k × dims floats per iteration; the corpus is
    * scanned `iters` times with no shuffle beyond the k×dims×partitions
    * partial-agg rows. For 100 TB, run on a sample — centroid quality
    * needs distribution coverage, not every row (the sample bound is the
    * k-means|| argument); the returned table plugs into
    * [[writeIvfIndex]] / [[appendIvfIndex]] unchanged either way.
    */
  def trainCentroids(corpus: DataFrame, nCentroids: Int = 16,
                     iters: Int = 5): DataFrame = {
    val spark = corpus.sparkSession
    val Q = 1 << 20
    var cents = collectCentroids(
      corpus.orderBy(col("vec_id")).limit(nCentroids))
    val dims = cents.head._2.length
    for (_ <- 0 until iters) {
      val sums = corpus
        .select(col("embedding"),
          array_min(centStructs(cents)(col("embedding"))).getField("c_id")
            .as("list_id"))
        .select(col("list_id"), posexplode(col("embedding")))
        .groupBy(col("list_id"), col("pos"))
        .agg(sum(expr(s"CAST(round(CAST(col AS DOUBLE) * $Q) AS BIGINT)"))
          .as("qsum"), count(lit(1)).as("n"))
        .collect()
      val byList = sums.groupBy(_.getLong(0))
      cents = cents.map { case (cId, old) =>
        byList.get(cId) match {
          case Some(rows) =>
            val arr = new Array[Float](dims)
            rows.foreach { r =>
              arr(r.getInt(1)) =
                (r.getLong(2).toDouble / Q / r.getLong(3)).toFloat
            }
            (cId, arr.toSeq)
          case None => (cId, old)
        }
      }
    }
    import spark.implicits._
    cents.toSeq.toDF("vec_id", "embedding")
  }

  /** Embedding-distribution drift via centroid-assignment histograms —
    * the T6 monitoring family's EMBEDDING modality (PSI watches scalar
    * columns; nothing watched the vector space a retrieval/dedup stack
    * actually lives in). The REFERENCE side defines the quantization
    * geometry (seed centroids from its first `nCentroids` rows by
    * vec_id — deterministic and SQL-expressible, the q65/q181
    * discipline, playing the role percentile edges play for
    * [[graft.ops.Profile.driftBuckets]]); both sides then assign
    * map-side against the centroid literals (no join, no shuffle beyond
    * two nCentroids-row count aggregates) and the aligned histogram
    * (list_id, n_ref, n_cur) is the oracle-checkable counting artifact —
    * feed [[graft.ops.Profile.psi]] for the scalar, exactly as with
    * bucket drift. An embedding model swap, a new-domain intake, or a
    * collapsed encoder all move assignment mass between lists long
    * before any scalar column moves. Empty lists survive (zero-fill —
    * an emptied list IS the signal). At 100 TB: centroids are
    * maintenance state (reuse the IVF index's), each snapshot pays one
    * map-side pass — the same cost as writing it into the index.
    */
  def assignmentDrift(ref: DataFrame, cur: DataFrame,
                      nCentroids: Int = 16): DataFrame = {
    val cents = collectCentroids(
      ref.orderBy(col("vec_id")).limit(nCentroids))
    def hist(df: DataFrame, as: String) =
      df.select(array_min(centStructs(cents)(col("embedding")))
          .getField("c_id").as("list_id"))
        .groupBy(col("list_id")).agg(count(lit(1)).as(as))
    hist(ref, "n_ref").join(hist(cur, "n_cur"), Seq("list_id"), "full_outer")
      .select(col("list_id"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
  }

  /** [[assignmentDrift]] keyed by a stratum column — WHICH population
    * moved, not just whether one did (the [[graft.ops.Profile.ksDriftBy]]
    * shape in embedding space). All strata share ONE quantization
    * geometry (the reference's global seed centroids): per-stratum
    * geometries would make the per-stratum PSIs incomparable and hide a
    * stratum collapsing onto another's region. One-sided strata are
    * REFUSED loudly — a vanished or newborn stratum is schema-level
    * drift, surfaced by the strata census, never silently zero-filled
    * into a huge PSI. Output (stratum, list_id, n_ref, n_cur),
    * zero-filled within each stratum; Σ over strata reproduces the
    * pooled [[assignmentDrift]] exactly (VectorSpec-pinned).
    */
  def assignmentDriftBy(ref: DataFrame, cur: DataFrame, strataCol: String,
                        nCentroids: Int = 16): DataFrame = {
    val rs = ref.select(col(strataCol)).distinct().localCheckpoint()
    val cs = cur.select(col(strataCol)).distinct().localCheckpoint()
    require(cs.join(rs, Seq(strataCol), "left_anti").isEmpty,
      s"assignmentDriftBy: current side has strata the reference lacks " +
        s"($strataCol) — schema-level drift, handle it explicitly")
    require(rs.join(cs, Seq(strataCol), "left_anti").isEmpty,
      s"assignmentDriftBy: reference has strata the current side lacks " +
        s"($strataCol) — a vanished stratum is schema-level drift")
    val cents = collectCentroids(
      ref.orderBy(col("vec_id")).limit(nCentroids))
    def hist(df: DataFrame, as: String) =
      df.select(col(strataCol),
          array_min(centStructs(cents)(col("embedding")))
            .getField("c_id").as("list_id"))
        .groupBy(col(strataCol), col("list_id")).agg(count(lit(1)).as(as))
    hist(ref, "n_ref")
      .join(hist(cur, "n_cur"), Seq(strataCol, "list_id"), "full_outer")
      .select(col(strataCol), col("list_id"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
  }

  /** [[assignmentDrift]] with an at-rest [[writeIvfIndex]] index as the
    * reference — the ZERO-extra-state form: the index's centroids ARE
    * the quantization geometry and its `list_stats` (kept truthful by
    * appends and deletes) ARE the reference histogram, so monitoring an
    * intake batch against "what the retrieval corpus looks like" costs
    * one map-side assignment pass over the batch and a stats-table-sized
    * join — the index is never scanned. Output contract matches
    * [[assignmentDrift]]: (list_id, n_ref, n_cur), zero-filled both
    * ways, [[graft.ops.Profile.psi]]-ready.
    */
  def assignmentDriftAgainstIndex(spark: org.apache.spark.sql.SparkSession,
                                  dir: String, batch: DataFrame): DataFrame = {
    val cents = collectCentroids(spark.read.parquet(s"$dir/centroids"))
    val cur = batch
      .select(array_min(centStructs(cents)(col("embedding")))
        .getField("c_id").as("list_id"))
      .groupBy(col("list_id")).agg(count(lit(1)).as("n_cur"))
    ivfListStats(spark, dir)
      .select(col("list_id"), col("n_vectors").as("n_ref"))
      .join(cur, Seq("list_id"), "full_outer")
      .select(col("list_id"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
  }

  /** Recall@k of an approximate ANN result against the exact one: the
    * fraction of true (probe, neighbor) top-k pairs the approximate
    * search recovered. The measuring stick for the IVF/LSH operating
    * points tabulated in BASELINE.md.
    */
  def recallAtK(approx: DataFrame, exact: DataFrame): Double = {
    val truth = exact.select(col("probe_id"), col("neighbor_id"))
    val hits = truth
      .intersect(approx.select(col("probe_id"), col("neighbor_id")))
      .count()
    hits.toDouble / truth.count()
  }

  /** [[recallAtK]]'s oracle-checkable per-probe form: for every probe,
    * how many of its exact top-k the approximate search recovered —
    * (probe_id, k_true, n_hit), all integers (both searches are
    * deterministic, so even the ANN operating point is hash-exact
    * cross-engine). This is the per-query view an operating-point sweep
    * reads (WHICH probes lose recall at a given nProbe, not just the
    * average), and q210's green row pins the measuring stick itself.
    */
  def recallReport(approx: DataFrame, exact: DataFrame): DataFrame =
    exact.select(col("probe_id"), col("neighbor_id"))
      .join(approx.select(col("probe_id"), col("neighbor_id"),
          lit(1).as("_hit")),
        Seq("probe_id", "neighbor_id"), "left")
      .groupBy(col("probe_id"))
      .agg(count(lit(1)).as("k_true"), count(col("_hit")).as("n_hit"))

  /** [[recallReport]]'s PAIR-GENERATOR form — the measuring stick for
    * blocked dedup candidates ([[ivfCandidatePairs]] et al.) instead of
    * top-k search: at each threshold (integer basis points, so the
    * report carries no float columns), how many exact pairs with
    * `cosine >= tau` did the generator recover? `approx`/`exact` carry
    * `(vec_a, vec_b, cosine)`; thresholds with zero qualifying exact
    * pairs produce no row (both engines agree — the group is absent).
    * All-integer output, so the q210 rule applies: deterministic
    * generators make the stick itself hash-exact cross-engine.
    */
  def pairRecallReport(approx: DataFrame, exact: DataFrame,
                       tausBp: Seq[Int]): DataFrame = {
    val spark = exact.sparkSession
    import spark.implicits._
    val taus = tausBp.toDF("tau_bp")
    exact.select(col("vec_a"), col("vec_b"), col("cosine"))
      .join(approx.select(col("vec_a"), col("vec_b"), lit(1).as("_hit")),
        Seq("vec_a", "vec_b"), "left")
      .crossJoin(broadcast(taus))
      .filter(col("cosine") >= col("tau_bp") / lit(10000.0))
      .groupBy(col("tau_bp"))
      .agg(count(lit(1)).as("n_true"), count(col("_hit")).as("n_hit"))
  }

  /** Per-centroid (−cosine, c_id) structs over inlined literal centroids —
    * `array_min` of this is the assignment argmax; `sort_array` + slice is
    * probe-list selection. A NaN cosine (zero-norm vector or centroid,
    * 0/0) maps to −∞ here so it ranks FIRST — matching the SQL oracle's
    * `ORDER BY ccos DESC`, where NaN sorts greatest; Spark's struct min
    * would otherwise rank NaN last and assign a different list.
    */
  private def centStructs(cents: Array[(Long, Seq[Float])])(emb: Column): Column =
    array(cents.map { case (cId, cEmb) =>
      struct(
        (-nanvl(cosine(emb, typedLit(cEmb)), lit(Double.PositiveInfinity)))
          .as("nc"),
        lit(cId).as("c_id"))
    }.toIndexedSeq: _*)

  /** (probe_id, p_emb, list_id) rows: each probe's top-`nProbe` lists. */
  private def probeListsFor(probes: DataFrame,
                            cents: Array[(Long, Seq[Float])],
                            nProbe: Int): DataFrame =
    probes
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"),
        centStructs(cents)(col("embedding")).as("_cs"))
      .select(col("probe_id"), col("p_emb"),
        explode(expr(s"transform(slice(sort_array(_cs), 1, $nProbe), s -> s.c_id)"))
          .as("list_id"))

  /** Search tail shared by the in-memory and at-rest index forms: broadcast
    * the probe lists, join on list_id, exact cosine, per-probe top-k with
    * a map-side WindowGroupLimit under the single exchange.
    */
  private def ivfSearch(assigned: DataFrame, probeLists: DataFrame,
                        k: Int): DataFrame = {
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    assigned.join(broadcast(probeLists), Seq("list_id"))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .withColumn("cosine", cosine(col("p_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("rank"), col("cosine"))
  }

  /** Persist an IVF-flat index: the corpus PARTITIONED BY list_id on disk
    * (one directory per inverted list) plus the centroid table. A search
    * against the written index reads ONLY the probed list partitions —
    * partition pruning does what the in-memory form's join does, so the
    * scan cost of a query is ~nProbe/nCentroids of the corpus regardless
    * of corpus size. This is the vector-database layout expressed as a
    * plain partitioned parquet table. `trainIters > 0` runs
    * [[trainCentroids]] Lloyd refinement before assignment; 0 keeps the
    * deterministic first-N seed (the pre-round-7 behavior).
    */
  def writeIvfIndex(corpus: DataFrame, dir: String,
                    nCentroids: Int = 16, trainIters: Int = 0,
                    sq8: Boolean = false,
                    pq: Option[PqConfig] = None): Unit = {
    // precondition BEFORE any write: a pinned codebook under opq needs
    // its matching pinned rotation — it was trained in THAT rotation
    // space; a fresh R would encode rotated vectors against centroids
    // from another basis. Checked first so a refused config can never
    // leave a half-rebuilt dir (fresh centroids over stale lists).
    pq.foreach(cfg =>
      require(cfg.rotation.isDefined || cfg.codebook.isEmpty || !cfg.opq,
        "writeIvfIndex: PqConfig pins a codebook with opq = true but " +
          "no rotation — pin the rotation the codebook was trained " +
          "under (the frozen pair travels together)"))
    val centDf =
      if (trainIters > 0) trainCentroids(corpus, nCentroids, trainIters)
      else corpus.orderBy(col("vec_id")).limit(nCentroids)
        .select(col("vec_id"), col("embedding"))
    centDf.write.mode("overwrite").parquet(s"$dir/centroids")
    // read the tiny file just written rather than re-running the
    // full-corpus top-k subquery a second time
    val cents = collectCentroids(
      corpus.sparkSession.read.parquet(s"$dir/centroids"))
    val assigned = corpus.select(col("vec_id"), col("embedding"),
      array_min(centStructs(cents)(col("embedding"))).getField("c_id")
        .as("list_id"))
    // sq8: the codes column rides next to the full-precision one —
    // parquet column pruning means the quantized scan reads only 1/4 the
    // vector bytes while the refine step (and searchIvfIndex) still has
    // the float column, at +25% storage
    val withSq8 =
      if (sq8) assigned.withColumn("codes", sq8Encode(col("embedding")))
      else assigned
    // pq: m-byte codes (+~3% storage at the defaults) plus the codebook
    // persisted beside the index — searches and appends read it back, so
    // the at-rest format is self-describing like the sq8 codes column
    // a rebuild that does NOT write a sidecar must also CLEAR any stale
    // one left by a previous build in this dir — searches and appends
    // read sidecars back by existence, so a surviving pq_rotation (or
    // pq_codebook) from an earlier OPQ/PQ build would silently encode
    // new rows and rotate probes against codes that were never rotated
    def clearSidecar(name: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(dir, name)
      val fs = p.getFileSystem(
        corpus.sparkSession.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
    val withPq = pq match {
      case Some(cfg) =>
        // learned-OPQ leg: rotation trains first (or rides in pinned),
        // persists beside the codebook, and BOTH codebook training and
        // encoding run in the rotated space — searches read the matrix
        // back, so the at-rest format stays self-describing
        val rot = cfg.rotation.orElse(
          if (cfg.opq) Some(trainOpqRotation(corpus, cfg.m, cfg.k,
            opqIters = cfg.opqIters, lloydIters = cfg.opqLloydIters))
          else None)
        if (rot.isEmpty) clearSidecar("pq_rotation")
        rot.foreach(r => writePqRotation(corpus.sparkSession, dir, r))
        val embCol = rot.fold(col("embedding"))(r =>
          rotateVec(col("embedding"), r))
        val cb = cfg.codebook.getOrElse {
          val trainSrc = rot.fold(corpus)(r => corpus.select(col("vec_id"),
            rotateVec(col("embedding"), r).as("embedding")))
          trainPqCodebook(trainSrc, cfg.m, cfg.k, cfg.trainIters)
        }
        writePqCodebook(corpus.sparkSession, dir, cb, cfg.m, cfg.k)
        withSq8.withColumn("pq_codes", pqEncode(embCol, cb, cfg.m, cfg.k))
      case None =>
        clearSidecar("pq_rotation")
        clearSidecar("pq_codebook")
        withSq8
    }
    withPq
      .write.mode("overwrite").partitionBy("list_id").parquet(s"$dir/lists")
    // seed the per-list stats from the freshly written lists (one
    // metadata-cheap aggregate at build time; appends then extend it
    // delta-sized — the asOfAuto appendKeyStats pattern)
    corpus.sparkSession.read.parquet(s"$dir/lists")
      .groupBy(col("list_id").cast("long").as("list_id"))
      .agg(count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(s"$dir/list_stats")
  }

  /** Append a vector delta to a [[writeIvfIndex]] index without touching
    * existing rows — the vector-domain twin of the incremental dedup
    * index ([[graft.text.TextDedup.nearDupAgainstIndex]]): assignment
    * depends only on the FROZEN centroid table, so a delta assigned
    * batch-by-batch lands in exactly the lists a single full build would
    * have produced (spec-asserted row identity), and each day's append
    * writes only delta-sized files into the affected list directories.
    * The trade is the standard IVF one: centroids drift from the true
    * data distribution as the corpus grows, so drifted vectors pile into
    * whichever frozen lists happen to be nearest — list sizes skew, a
    * probe of a bloated list scans ever more candidates for the same
    * recall, and nothing about the SEARCH results signals it (ranks stay
    * exact). Every append therefore extends `list_stats` with the
    * delta's per-list counts; [[ivfNeedsRetrain]] turns those into the
    * rebuild trigger, and [[rebuildIvfIndex]] restores the
    * recall-per-candidate economics (spec-driven on a drifted stream in
    * VectorSpec). Searches stay correct-as-ranked regardless.
    */
  def appendIvfIndex(delta: DataFrame, dir: String): Unit = {
    val spark = delta.sparkSession
    val cents = collectCentroids(spark.read.parquet(s"$dir/centroids"))
    // match the at-rest format: an sq8 index gets sq8 appends (codes are
    // deterministic per vector) and a pq index gets pq appends encoded
    // with the FROZEN persisted codebook — so append ≡ full-build holds
    // per-variant (for pq, "full build" means full-encode under the same
    // codebook; retraining is rebuildIvfIndex's job, not an append's)
    val listFields = spark.read.parquet(s"$dir/lists").schema.fieldNames
    val hasCodes = listFields.contains("codes")
    val hasPq = listFields.contains("pq_codes")
    // Materialize the assignment ONCE (delta-sized by contract): the two
    // writes below must see the SAME rows — a recomputed assignment over a
    // non-deterministic delta source could make list_stats diverge from
    // the list rows actually written, and even a deterministic one pays
    // the centroid-distance scan twice.
    val assigned = {
      val base = delta.select(col("vec_id"), col("embedding"),
        array_min(centStructs(cents)(col("embedding"))).getField("c_id")
          .as("list_id"))
      val s1 =
        if (hasCodes) base.withColumn("codes", sq8Encode(col("embedding")))
        else base
      if (hasPq) {
        val (cb, m, k) = readPqCodebook(spark, dir)
        val embCol = readPqRotation(spark, dir)
          .fold(col("embedding"))(r => rotateVec(col("embedding"), r))
        s1.withColumn("pq_codes", pqEncode(embCol, cb, m, k))
      } else s1
    }.localCheckpoint()
    assigned
      .write.mode("append").partitionBy("list_id").parquet(s"$dir/lists")
    assigned.groupBy(col("list_id")).agg(count(lit(1)).as("n"))
      .write.mode("append").parquet(s"$dir/list_stats")
  }

  /** Takedown (right-to-be-forgotten) for the at-rest IVF index: remove
    * `ids` from the index touching ONLY the list partitions that
    * actually hold them — the missing DELETE half of the index's
    * maintenance algebra (appends existed since round 8; an opt-out or
    * DMCA sweep at 100 TB cannot pay a rebuild). Three bounded steps:
    * (1) a column-pruned (vec_id, list_id) scan semi-joined to the
    * broadcast id set yields the affected list ids (≤ nCentroids —
    * collect-safe by construction); (2) those partitions alone are
    * re-read (PartitionFilters), anti-joined, checkpointed (the rows
    * must materialize BEFORE the dynamic partition overwrite replaces
    * their own input files), and written back — at-rest variant columns
    * (sq8 `codes`, `pq_codes`) ride the rewrite untouched, so variant
    * searches keep working; (3) `list_stats` gets the removals as
    * NEGATIVE delta rows, so [[ivfListStats]]'s sum — and therefore the
    * [[ivfNeedsRetrain]] trigger — stays truthful without a rescan.
    * A list emptied entirely is deleted outright (dynamic overwrite
    * only replaces partitions PRESENT in the written frame — leaving
    * the stale directory would resurrect the deleted vectors).
    * Centroids are untouched, standard IVF delete semantics: geometry
    * degrades only via occupancy, which the stats trigger already
    * watches. Post-delete search ≡ search over an index built without
    * the ids (spec-pinned, plus the q199 oracle).
    *
    * SINGLE-WRITER contract (the [[graft.maintenance.Compaction]]
    * discipline): never run concurrently with an append to the same
    * index.
    */
  def deleteFromIvfIndex(spark: org.apache.spark.sql.SparkSession,
                         dir: String, ids: DataFrame): Unit = {
    val doomed = ids.select(col("vec_id")).distinct()
    val affected = spark.read.parquet(s"$dir/lists")
      .join(broadcast(doomed), Seq("vec_id"), "left_semi")
      .select(col("list_id").cast("long").as("list_id"))
      .distinct().collect().map(_.getLong(0)) // <= nCentroids
    if (affected.isEmpty) return
    val hit = spark.read.parquet(s"$dir/lists")
      .filter(col("list_id").isin(affected.map(Long.box).toIndexedSeq: _*))
    // one pass over the affected partitions feeds BOTH the survivors and
    // the per-list removal counts; checkpointed so the overwrite below
    // cannot see half-replaced input
    val flagged = hit
      .join(broadcast(doomed.withColumn("_del", lit(1))),
        Seq("vec_id"), "left")
      .localCheckpoint()
    val remaining = flagged.filter(col("_del").isNull).drop("_del")
    graft.ops.Upsert.overwritePartitions(remaining, s"$dir/lists",
      Seq("list_id"))
    // partitions with no survivors are not in `remaining` — remove them
    val kept = remaining.select(col("list_id").cast("long"))
      .distinct().collect().map(_.getLong(0)).toSet
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    affected.filterNot(kept).foreach { l =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/lists/list_id=$l"),
        true)
    }
    flagged.filter(col("_del").isNotNull)
      .groupBy(col("list_id").cast("long").as("list_id"))
      .agg((-count(lit(1))).as("n"))
      .write.mode("append").parquet(s"$dir/list_stats")
  }

  /** Per-list vector counts of an at-rest index, folded from the
    * build-time seed plus every append's delta rows — stats-table-sized
    * reads, the index itself is never scanned. Lists no append ever
    * touched report their build-time count; centroid ids with no vectors
    * at all report 0.
    */
  def ivfListStats(spark: org.apache.spark.sql.SparkSession,
                   dir: String): DataFrame = {
    val centIds = spark.read.parquet(s"$dir/centroids")
      .select(col("vec_id").as("list_id"))
    spark.read.parquet(s"$dir/list_stats")
      .groupBy(col("list_id")).agg(sum(col("n")).as("n"))
      .join(centIds, Seq("list_id"), "right")
      .select(col("list_id"), coalesce(col("n"), lit(0L)).as("n_vectors"))
  }

  /** The drift signal: max/mean list occupancy over the index's centroid
    * set (1.0 = perfectly balanced; an all-in-one-list index with k lists
    * scores k). Probe cost scales with the PROBED lists' sizes, so at
    * equal recall a skewed index scans `imbalance`× the candidates of a
    * balanced one — this ratio IS the recall-per-candidate economics the
    * index sells, which is why it (not recall, which stays exact-as-
    * ranked) is the trigger.
    */
  def ivfImbalance(spark: org.apache.spark.sql.SparkSession,
                   dir: String): Double = {
    val r = ivfListStats(spark, dir)
      .agg(max(col("n_vectors")).cast("double").as("mx"),
        avg(col("n_vectors")).as("mean"))
      .head()
    if (r.isNullAt(1) || r.getDouble(1) == 0.0) 1.0
    else r.getDouble(0) / r.getDouble(1)
  }

  /** The documented rebuild rule (SCALE.md): retrain when appends have
    * skewed list occupancy past `maxImbalance` (default 3× — a probed
    * hot list then costs ~3 balanced lists per query, the point where
    * one nightly re-cluster amortizes against every search paying the
    * skew). Stats-only — O(lists) driver work.
    */
  def ivfNeedsRetrain(spark: org.apache.spark.sql.SparkSession, dir: String,
                      maxImbalance: Double = 3.0): Boolean =
    ivfImbalance(spark, dir) >= maxImbalance

  /** The retrain trigger as an ORACLE-CHECKABLE counting artifact: one
    * row (n_lists, total_n, max_n, needs_retrain) from the stats table
    * alone, with the imbalance test cross-multiplied to integers —
    * `max_n · n_lists · den ≥ total_n · num` is exactly
    * `max/mean ≥ num/den` (the [[ivfImbalance]] rule at num/den = 3/1)
    * with no float in the decision, the [[graft.text.Corpus]]
    * integer-threshold discipline applied to index maintenance. This is
    * what a maintenance DAG keys on; [[ivfNeedsRetrain]] stays as the
    * scalar convenience. needs_retrain rides as INT (0/1) for
    * cross-engine hash parity.
    */
  def ivfMaintenanceReport(spark: org.apache.spark.sql.SparkSession,
                           dir: String, num: Int = 3,
                           den: Int = 1): DataFrame =
    ivfListStats(spark, dir)
      .agg(count(lit(1)).as("n_lists"),
        sum(col("n_vectors")).as("total_n"),
        max(col("n_vectors")).as("max_n"))
      .select(col("n_lists"), col("total_n"), col("max_n"),
        (col("max_n") * col("n_lists") * lit(den.toLong) >=
          col("total_n") * lit(num.toLong)).cast("int").as("needs_retrain"))

  /** Re-cluster an index from its OWN vectors into `destDir`: fresh Lloyd
    * centroids over the accumulated corpus (base + every appended delta),
    * fresh balanced lists, fresh stats. Writes a NEW directory — the live
    * index stays searchable during the rebuild; callers swap paths when
    * it lands (the z-order/compaction maintenance convention).
    */
  def rebuildIvfIndex(spark: org.apache.spark.sql.SparkSession,
                      srcDir: String, destDir: String,
                      nCentroids: Int = 16, trainIters: Int = 5): Unit = {
    val lists = spark.read.parquet(s"$srcDir/lists")
    // Preserve the at-rest variant (the appendIvfIndex format contract):
    // rebuilding an sq8 index must re-emit the codes column and a pq
    // index its pq_codes + codebook, or the documented path swap would
    // break the variant searches on the new dir. The pq codebook
    // RETRAINS on the current corpus (same m/k) — a rebuild exists to
    // restore quantization economics after drift, and that applies to
    // the subspace centroids exactly as it does to the coarse ones.
    val hasCodes = lists.schema.fieldNames.contains("codes")
    val pqCfg =
      if (lists.schema.fieldNames.contains("pq_codes")) {
        val (_, m, k) = readPqCodebook(spark, srcDir)
        // the caller's trainIters governs ALL retrains — a seed-only
        // rebuild request must not silently pay 5 codebook Lloyd passes
        // OR the default 6×4 OPQ alternation (plus its driver-sample
        // collect). An OPQ index RE-LEARNS its rotation on the current
        // corpus: a rebuild exists to restore quantization economics
        // after drift, and the rotation is part of the quantizer — so
        // its alternation depth follows the same knob. trainIters = 0 is
        // the seed-only rebuild: zero retraining passes means the
        // codebook must stay in the geometry it was trained in, so the
        // SOURCE index's stored rotation is pinned (resetting to identity
        // would silently discard the paid-for OPQ geometry and degrade
        // recall for free). Any trainIters > 0 relearns both.
        val storedRot = readPqRotation(spark, srcDir)
        Some(PqConfig(m, k, trainIters = trainIters,
          opq = storedRot.isDefined,
          rotation = if (trainIters == 0) storedRot else None,
          opqIters = trainIters,
          opqLloydIters = math.min(4, math.max(1, trainIters))))
      } else None
    writeIvfIndex(lists.select(col("vec_id"), col("embedding")),
      destDir, nCentroids, trainIters, sq8 = hasCodes, pq = pqCfg)
  }

  /** Top-k search against a [[writeIvfIndex]] index. Row-identical to
    * [[ivfTopK]] over the same corpus/parameters (spec-asserted); the
    * probed-lists filter lands in `PartitionFilters`, so unprobed list
    * directories are never opened.
    */
  def searchIvfIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
                     probes: DataFrame, k: Int, nProbe: Int = 4): DataFrame = {
    val cents = collectCentroids(spark.read.parquet(s"$dir/centroids"))
    // Materialize the probe lists ONCE (probes are broadcast-small by
    // contract): the rows feed the broadcast join AND yield the probed
    // list ids, which must be inlined — not joined — for the planner to
    // prune partitions statically.
    val pl = probeListsFor(probes, cents, nProbe)
    val plRows = pl.collect()
    val probeLists = spark.createDataFrame(
      java.util.Arrays.asList(plRows: _*), pl.schema)
    val wanted = plRows.map(_.getAs[Long]("list_id")).distinct
    val assigned = spark.read.parquet(s"$dir/lists")
      .filter(col("list_id").isin(wanted.toSeq: _*))
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("n_emb"),
        col("list_id").cast("long").as("list_id"))
    ivfSearch(assigned, probeLists, k)
  }

  /** Top-k search against a `writeIvfIndex(..., sq8 = true)` index,
    * ranking on the int8 codes — the probed scan reads the `codes`
    * column only (parquet column pruning), 1/4 the vector bytes of
    * [[searchIvfIndex]] at the same partition pruning. With `refine = 0`
    * the returned cosines are the quantized ones (exact up to the codes'
    * ~7-bit direction rounding). With `refine = R >= k`, the quantized
    * pass keeps R candidates per probe and a second, candidate-filtered
    * read of the probed lists recomputes EXACT cosines for the final
    * top-k — the standard ANN rescoring step: the full-precision column
    * is touched only for probes × R rows, so refine cost is
    * candidate-sized, not list-sized. Recall vs the float path is
    * spec-measured in VectorSpec; ranks-of-returned-rows are exact under
    * refine, approximate without.
    */
  def searchIvfIndexSq8(spark: org.apache.spark.sql.SparkSession, dir: String,
                        probes: DataFrame, k: Int, nProbe: Int = 4,
                        refine: Int = 0): DataFrame = {
    val cents = collectCentroids(spark.read.parquet(s"$dir/centroids"))
    val pl = probeListsFor(probes, cents, nProbe)
    val plRows = pl.collect()
    val probeLists = spark.createDataFrame(
      java.util.Arrays.asList(plRows: _*), pl.schema)
    val wanted = plRows.map(_.getAs[Long]("list_id")).distinct
    val lists = spark.read.parquet(s"$dir/lists")
      .filter(col("list_id").isin(wanted.toSeq: _*))
    val coded = lists
      .select(col("vec_id").as("neighbor_id"), col("codes"),
        col("list_id").cast("long").as("list_id"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    val approx = coded.join(broadcast(probeLists), Seq("list_id"))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .withColumn("cosine", sq8Cosine(col("p_emb"), col("codes")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= math.max(k, refine))
      .select(col("probe_id"), col("p_emb"), col("neighbor_id"),
        col("rank"), col("cosine"))
    if (refine <= 0) {
      approx.select(col("probe_id"), col("neighbor_id"), col("rank"),
        col("cosine"))
    } else {
      // candidate-filtered full-precision rescore: probes × R rows
      val cand = approx.select(col("probe_id"), col("p_emb"),
        col("neighbor_id"))
      lists.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("n_emb"))
        .join(broadcast(cand), Seq("neighbor_id"))
        .withColumn("cosine", cosine(col("p_emb"), col("n_emb")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("probe_id"), col("neighbor_id"), col("rank"),
          col("cosine"))
    }
  }

  /** Top-k search against a `writeIvfIndex(..., pq = Some(...))` index,
    * ranking on the product-quantized codes — the probed scan reads the
    * `pq_codes` column only (m BYTES per vector: 1/32 of the float bytes
    * at the defaults, 1/8 of sq8's), at the same partition pruning as
    * [[searchIvfIndex]]. The persisted codebook is read back (m·k·sub
    * floats) and inlined into the plan. `refine > 0` re-scores the top
    * candidates against the float column, candidate-bounded; `refine <
    * 0` (the default) auto-sizes the pool as `max(k, MinRefinePool,
    * ceil(refineFraction × index rows))` — the round-19 ratio-vs-SF
    * rule plus the measured small-corpus floor, so the pool grows
    * with the index instead of silently starving recall at scale. The
    * index row count is a parquet metadata-only count of `lists`; pass
    * `refine = 0` explicitly for the raw quantized ranking.
    */
  def searchIvfIndexPq(spark: org.apache.spark.sql.SparkSession, dir: String,
                       probes: DataFrame, k: Int, nProbe: Int = 4,
                       refine: Int = -1,
                       refineFraction: Double = 0.01): DataFrame = {
    val refineN = resolveRefine(refine,
      spark.read.parquet(s"$dir/lists").count(), refineFraction,
      autoRefineFloor(k))
    val (cb, m, kk) = readPqCodebook(spark, dir)
    // OPQ index: the ranking scan compares in the rotated space (probe
    // rotates per row — codes were encoded rotated); the refine step
    // stays in the original space, since rotation preserves cosine
    val rot = readPqRotation(spark, dir)
    val cents = collectCentroids(spark.read.parquet(s"$dir/centroids"))
    val pl = probeListsFor(probes, cents, nProbe)
    val plRows = pl.collect()
    val probeLists = spark.createDataFrame(
      java.util.Arrays.asList(plRows: _*), pl.schema)
    val wanted = plRows.map(_.getAs[Long]("list_id")).distinct
    val lists = spark.read.parquet(s"$dir/lists")
      .filter(col("list_id").isin(wanted.toSeq: _*))
    val coded = lists
      .select(col("vec_id").as("neighbor_id"), col("pq_codes"),
        col("list_id").cast("long").as("list_id"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    val probeEmb = rot.fold(col("p_emb"))(r => rotateVec(col("p_emb"), r))
    val approx = coded.join(broadcast(probeLists), Seq("list_id"))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .withColumn("cosine", pqCosine(probeEmb, col("pq_codes"), cb, m, kk))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= math.max(k, refineN))
      .select(col("probe_id"), col("p_emb"), col("neighbor_id"),
        col("rank"), col("cosine"))
    if (refineN <= 0) {
      approx.select(col("probe_id"), col("neighbor_id"), col("rank"),
        col("cosine"))
    } else {
      val cand = approx.select(col("probe_id"), col("p_emb"),
        col("neighbor_id"))
      lists.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("n_emb"))
        .join(broadcast(cand), Seq("neighbor_id"))
        .withColumn("cosine", cosine(col("p_emb"), col("n_emb")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("probe_id"), col("neighbor_id"), col("rank"),
          col("cosine"))
    }
  }

  /** Embedding-cosine near-duplicates within a blocking key (here: label).
    * Blocked all-pairs: cost Σ_block n² — at 100 TB the block key comes from
    * LSH buckets ([[lshCandidatePairs]]) instead of a label column.
    */
  def nearDupWithinLabel(corpus: DataFrame, threshold: Double): DataFrame = {
    val a = corpus.select(col("label"), col("vec_id").as("vec_a"),
      col("embedding").as("emb_a"))
    val b = corpus.select(col("label"), col("vec_id").as("vec_b"),
      col("embedding").as("emb_b"))
    a.join(b, Seq("label"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine", cosine(col("emb_a"), col("emb_b")))
      .filter(col("cosine") >= threshold)
      .select(col("label"), col("vec_a"), col("vec_b"), col("cosine"))
  }

  /** Semantic (embedding-cosine) dedup clusters: connected components of
    * a near-dup pair graph over vectors — the embedding-space analogue of
    * [[graft.text.TextDedup.dedupClusters]], and deliberately the SAME
    * machinery (min-label propagation, localCheckpoint rounds, label-sum
    * fixpoint): the component walk is representation-agnostic, only the
    * pair generator differs. `pairs` needs (vec_a, vec_b); any generator
    * plugs in — [[nearDupWithinLabel]] (blocked exact), [[ivfCandidatePairs]]
    * (unlabeled scale path), [[lshCandidatePairsMulti]] (high-threshold
    * regime).
    */
  def semanticClusters(pairs: DataFrame): DataFrame =
    graft.text.TextDedup.dedupClusters(
      pairs.select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
      .select(col("doc_id").as("vec_id"), col("cluster_id"))

  /** The corpus minus every non-representative member of each semantic
    * near-dup component (one survivor — the min vec_id — per cluster;
    * vectors in no pair survive untouched). Anti-join keys are only the
    * cluster LOSERS — a tiny table relative to the corpus, same shape as
    * [[graft.text.TextDedup.survivors]].
    */
  def semanticDedup(corpus: DataFrame, pairs: DataFrame): DataFrame = {
    val losers = semanticClusters(pairs)
      .filter(col("vec_id") =!= col("cluster_id"))
      .select(col("vec_id"))
    corpus.join(losers, Seq("vec_id"), "left_anti")
  }

  /** IVF-list-blocked candidate pairs — the unlabeled-corpus blocking
    * scheme for semantic dedup at LOW thresholds, where hyperplane LSH
    * recall collapses (p ≈ 0.63^bits at cosine 0.4 — the
    * [[lshCandidatePairsMulti]] operating-regime note). Blocks come from
    * the data distribution instead: each vector joins its top-`assign`
    * trained-centroid lists (multi-assignment is the recall lever — a
    * near-boundary pair split by top-1 partitioning still co-locates in a
    * secondary list), pairs sharing ANY list are candidates, deduped as
    * id pairs, then verified by exact cosine ONCE per pair.
    *
    * Cost: Σ_list n² with list sizes steered by `nCentroids` (sized so a
    * list fits one task), times `assign`² in the worst case — the
    * semantic analogue of the banded-LSH bound, never all-pairs. Recall
    * vs the exact pair set is measured in VectorSpec on the clustered
    * testdata, mirroring the IVF recall curve in BASELINE.md.
    */
  def ivfCandidatePairs(corpus: DataFrame, threshold: Double,
                        nCentroids: Int = 16, assign: Int = 2,
                        trainIters: Int = 3): DataFrame =
    ivfCandidatePairsWithCentroids(corpus,
      trainCentroids(corpus, nCentroids, trainIters), threshold, assign)

  /** [[ivfCandidatePairs]] against an ALREADY-TRAINED centroid table —
    * the production split: training is offline/maintenance work (run
    * once, persist with [[writeIvfIndex]]), pair blocking is a pure
    * apply step (one map-side multi-assignment pass + the in-list pair
    * join). Pass `spark.read.parquet(s"$indexDir/centroids")` to block
    * against a persisted index's own layout.
    */
  def ivfCandidatePairsWithCentroids(corpus: DataFrame, centroids: DataFrame,
                                     threshold: Double,
                                     assign: Int = 2): DataFrame = {
    val cents = collectCentroids(centroids)
    val lists = corpus
      .select(col("vec_id"), centStructs(cents)(col("embedding")).as("_cs"))
      .select(col("vec_id"),
        explode(expr(s"transform(slice(sort_array(_cs), 1, $assign), s -> s.c_id)"))
          .as("list_id"))
    val a = lists.select(col("list_id"), col("vec_id").as("vec_a"))
    val b = lists.select(col("list_id"), col("vec_id").as("vec_b"))
    val idPairs = a.join(b, Seq("list_id"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b")).distinct()
    verifyPairs(corpus, idPairs)
      .filter(col("cosine") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
  }

  /** Exact all-pairs near-dup at a cosine threshold — the brute-force
    * baseline every blocked generator ([[nearDupWithinLabel]],
    * [[ivfCandidatePairs]], [[lshCandidatePairsMulti]]) is measured
    * against, and the right generator outright when the input is SMALL
    * by contract (a micro-batch's internal dups in
    * [[graft.streaming.VectorStream]]). O(n²) — never point it at a
    * corpus.
    */
  def nearDupPairsExact(vectors: DataFrame, threshold: Double): DataFrame = {
    val a = vectors.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
    val b = vectors.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
    a.crossJoin(b).filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine", cosine(col("emb_a"), col("emb_b")))
      .filter(col("cosine") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
  }

  /** The `delta` vec_ids already present in a [[writeIvfIndex]] index —
    * the replay guard for streaming ingestion. Frozen centroids make
    * assignment deterministic, so a re-delivered vector can only live in
    * its own top-1 list: only those list directories are read (partition
    * pruning), never the index.
    */
  def indexedIds(spark: org.apache.spark.sql.SparkSession, dir: String,
                 delta: DataFrame): DataFrame = {
    val cents = collectCentroids(spark.read.parquet(s"$dir/centroids"))
    val assigned = delta.select(col("vec_id"),
      array_min(centStructs(cents)(col("embedding"))).getField("c_id")
        .as("list_id"))
    val wanted = assigned.select(col("list_id")).distinct()
      .collect().map(_.getLong(0))
    spark.read.parquet(s"$dir/lists")
      .filter(col("list_id").isin(wanted.toSeq: _*))
      .select(col("vec_id"))
      .join(assigned.select(col("vec_id")), Seq("vec_id"), "left_semi")
  }

  /** Incremental semantic near-dup: which vectors of a NEW batch
    * near-duplicate (cosine ≥ threshold) something already in a
    * [[writeIvfIndex]] corpus index — the vector twin of
    * [[graft.text.TextDedup.nearDupAgainstIndex]] (q83's daily-delta
    * pattern), and the missing piece between [[appendIvfIndex]] (which
    * grows the index) and [[semanticDedup]] (which dedups a closed
    * corpus).
    *
    * Scale shape: the delta assigns to its top-`nProbe` lists map-side
    * against the FROZEN centroid table; the probed list ids inline as
    * literals so only those list directories are opened (the same
    * `PartitionFilters` contract [[searchIvfIndex]] pins); the (delta,
    * list) rows broadcast; exact cosine verifies inside the join
    * projection. The corpus is never re-paired — cost is the probed
    * ~nProbe/nCentroids fraction of one index scan per batch. A corpus
    * vector lives in exactly one list, so no pair can appear twice.
    *
    * Output: (corpus_id, delta_id, cosine). `nProbe = nCentroids` probes
    * every list and returns exactly the brute-force delta × corpus pair
    * set (spec-asserted); smaller nProbe trades recall for scan volume.
    */
  def nearDupAgainstIvfIndex(spark: org.apache.spark.sql.SparkSession,
                             dir: String, delta: DataFrame,
                             threshold: Double, nProbe: Int = 4): DataFrame = {
    require(threshold > 0, s"nearDup threshold must be > 0, got $threshold")
    val cents = collectCentroids(spark.read.parquet(s"$dir/centroids"))
    val pl = probeListsFor(delta, cents, nProbe)
    val plRows = pl.collect()
    val probeLists = spark.createDataFrame(
      java.util.Arrays.asList(plRows: _*), pl.schema)
    val wanted = plRows.map(_.getAs[Long]("list_id")).distinct
    spark.read.parquet(s"$dir/lists")
      .filter(col("list_id").isin(wanted.toSeq: _*))
      .select(col("vec_id").as("corpus_id"), col("embedding").as("n_emb"),
        col("list_id").cast("long").as("list_id"))
      .join(broadcast(probeLists), Seq("list_id"))
      .filter(col("corpus_id") =!= col("probe_id"))
      .withColumn("cosine", cosine(col("p_emb"), col("n_emb")))
      .filter(col("cosine") >= threshold)
      .select(col("corpus_id"), col("probe_id").as("delta_id"), col("cosine"))
  }

  /** The batch minus every vector that near-duplicates the indexed
    * corpus — corpus precedence (the at-rest representative wins, the
    * same direction as decontamination), so the survivors are safe to
    * [[appendIvfIndex]]. Batch-internal dups are a separate (and far
    * smaller) [[semanticDedup]] over the batch alone — mirroring the
    * text pipeline's split of delta-vs-corpus and delta-vs-delta.
    */
  def dedupDeltaAgainstIvfIndex(spark: org.apache.spark.sql.SparkSession,
                                dir: String, delta: DataFrame,
                                threshold: Double, nProbe: Int = 4): DataFrame = {
    val dups = nearDupAgainstIvfIndex(spark, dir, delta, threshold, nProbe)
      .select(col("delta_id").as("vec_id")).distinct()
    delta.join(dups, Seq("vec_id"), "left_anti")
  }

  /** [[decontaminateByCosine]]'s scale path for eval sets too large to
    * broadcast (a full benchmark-suite sweep): the CORPUS lives in the
    * persisted IVF index, eval vectors probe their `nProbe` nearest
    * lists, and every corpus vector within `threshold` of a probing
    * eval vector is dropped. Unlike the q93 delta probe (which collects
    * the delta to the driver — correct for a daily batch, wrong for
    * this question), the probe side here stays DISTRIBUTED: eval
    * vectors shuffle to their assigned list ids and hash-join the
    * probed list partitions — only the ≤ nCentroids DISTINCT list ids
    * touch the driver (for PartitionFilters pruning), so neither axis
    * is driver- or broadcast-bounded. No self-pair exclusion: an eval
    * vector and a corpus vector sharing an id are different ROWS here,
    * and an identical copy is the most blatant contamination of all.
    *
    * The trade is RECALL, and the lost side is the BAD one: a
    * contaminated pair whose corpus member sits outside the eval
    * vector's probed lists SURVIVES (leakage, not over-dropping) —
    * treat `nProbe` as the leak-rate knob, measured against the exact
    * [[decontaminateByCosine]] twin (VectorSpec: survivors ⊇ exact,
    * full-probe ≡ exact, identical-id copies DO drop; with seed
    * centroids the q181 oracle is exact because the probe algebra is
    * SQL-expressible). Hot lists skew the join — AQE's skew split
    * applies, the SkewSpec-pinned machinery.
    */
  def decontaminateAgainstIvfIndex(spark: org.apache.spark.sql.SparkSession,
                                   dir: String, corpus: DataFrame,
                                   evalSet: DataFrame, threshold: Double,
                                   nProbe: Int = 4): DataFrame = {
    val cents = collectCentroids(spark.read.parquet(s"$dir/centroids"))
    val pl = probeListsFor(evalSet, cents, nProbe)
    val wanted = pl.select(col("list_id")).distinct()
      .collect().map(_.getLong(0))
    val hits = spark.read.parquet(s"$dir/lists")
      .filter(col("list_id").isin(wanted.map(Long.box).toIndexedSeq: _*))
      .select(col("vec_id"), col("embedding").as("n_emb"),
        col("list_id").cast("long").as("list_id"))
      .join(pl, Seq("list_id"))
      .filter(cosine(col("p_emb"), col("n_emb")) >= threshold)
      .select(col("vec_id")).distinct()
    corpus.join(hits, Seq("vec_id"), "left_anti")
  }

  /** Per-vector L2 norm and quantized-norm — the array-function sampler
    * (F7): transform/aggregate/zip_with surface.
    */
  def norms(corpus: DataFrame): DataFrame =
    corpus.select(
      col("vec_id"),
      sqrt(dot(col("embedding"), col("embedding"))).as("l2_norm"),
      expr("CAST(size(embedding) AS INT)").as("dims"),
      expr("CAST(aggregate(embedding, CAST(0 AS BIGINT), (acc, x) -> " +
        "acc + CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS BIGINT)")
        .as("qsum"))
}
