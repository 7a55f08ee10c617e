package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical language-model quality scoring — the CCNet recipe
  * (Wenzek et al. 2020, public): train an n-gram LM on the corpus, score
  * every document by perplexity, and filter the tail. The missing rung of
  * this engine's quality ladder: [[TextAnalysis.qualityScore]] is
  * surface heuristics, [[TextAnalysis.learnedQualityScore]] is a linear
  * model over those heuristics; perplexity is the distributional signal
  * both miss (a fluent-looking document of out-of-domain vocabulary
  * scores fine on heuristics and terribly here).
  *
  * Model: bigram LM with add-one smoothing,
  * `p(w2|w1) = (c(w1,w2) + 1) / (c(w1·) + V)` where `c(w1·)` counts w1 as
  * a left context and V is the corpus vocabulary size. Unseen bigrams fall
  * back to `1 / (c(w1·) + V)`; unseen left contexts to `1 / V` — the same
  * formula with both counts zero, so scoring is ONE expression, no
  * branches. Document score: `ppl = exp(-Σ ln p / n_bigrams)`.
  *
  * Determinism contract (the [[Corpus.temperatureSample]] discipline):
  * every count is an exact integer and every per-bigram probability is a
  * ratio of integers, so the oracle-checked outputs are the INTEGER
  * sufficient statistics (c12, c1, n_bigrams, n_known, sum_c12, sum_c1 —
  * hash-exact cross-engine). `ppl` itself sums `ln` terms whose last ulp
  * is engine-specific and whose sum is order-dependent, so it rides as an
  * engine-internal column; the threshold FILTER ([[perplexityFilter]]) is
  * still oracle-checked because the threshold is chosen mid-gap — the
  * spec measures the smallest |ppl − thr| margin and pins it orders of
  * magnitude above cross-engine ulp noise (LangModelSpec).
  *
  * Scale posture (100 TB): training is one corpus-sized explode into a
  * bigram-keyed partial+final count — map-side combine collapses each
  * partition to its local vocab² before the shuffle, so shuffle bytes are
  * bounded by distinct-bigrams-per-partition, not corpus tokens. The
  * left-context count rides a vocab-partitioned window over the COUNT
  * frame (vocab²-bounded), never a second corpus scan. Scoring is the
  * standard LM-join shape: bigram-keyed sort-merge join of the exploded
  * corpus against the model (AQE broadcasts it when the trained model is
  * small), one unigram-keyed join for the fallback counts, then a per-doc
  * aggregate — three shuffles total, all keyed, no driver state.
  */
object LangModel {

  /** (doc_id, _t: array<string>) — the tokenized corpus. Split out
    * (round 20) so the scoring paths can tokenize ONCE and feed both
    * bigram derivation and vocabulary counting: the regex tokenize is a
    * full text-bytes walk, and [[perplexity]]/[[importanceStats]] were
    * paying it twice per scored corpus (bigrams + vocabSize as two
    * independent subtrees, each re-scanning the parquet text column).
    */
  private[text] def tokensOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("_t"))

  private[text] def bigramsFromTokens(toks: DataFrame): DataFrame =
    toks.filter(size(col("_t")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("_t")) - 1),
          i => struct(element_at(col("_t"), i).as("w1"),
            element_at(col("_t"), i + 1).as("w2")))).as("_bg"))
      .select(col("doc_id"), col("_bg.w1").as("w1"), col("_bg.w2").as("w2"))

  /** (doc_id, w1, w2) — one row per adjacent token pair. Documents with
    * fewer than two tokens have no bigrams and are absent downstream
    * (unscorable, the CCNet convention).
    */
  private[text] def bigrams(docs: DataFrame): DataFrame =
    bigramsFromTokens(tokensOf(docs))

  /** The trained model: (w1, w2, c12, c1) — bigram count plus its left
    * context's total. c1 is a window sum over the count frame (vocab²
    * rows), so training never scans the corpus twice.
    */
  def bigramLm(docs: DataFrame): DataFrame =
    bigramLmFromTokens(tokensOf(docs))

  private[text] def bigramLmFromTokens(toks: DataFrame): DataFrame =
    bigramsFromTokens(toks)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .withColumn("c1",
        sum(col("c12")).over(Window.partitionBy(col("w1"))))

  /** Corpus vocabulary size as a 1-row frame (broadcast onto scoring). */
  private def vocabSize(docs: DataFrame): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col("text"))).as("_w"))
      .agg(countDistinct(col("_w")).as("_v"))

  private def vocabSizeFromTokens(toks: DataFrame): DataFrame =
    toks.select(explode(col("_t")).as("_w"))
      .agg(countDistinct(col("_w")).as("_v"))

  /** Per-document LM score: integer sufficient statistics (oracle-checked)
    * plus the engine-internal `ppl`. `n_known` counts bigrams the model
    * has seen; `sum_c12`/`sum_c1` are the summed counts feeding the
    * smoothed probabilities — together they pin the whole scoring join
    * cross-engine without touching a float.
    */
  def perplexity(docs: DataFrame, lm: DataFrame): DataFrame =
    // ONE tokenize pass feeds both the bigram stream and the smoothing
    // vocabulary (round 20 — see [[tokensOf]]); identical algebra.
    perplexityFromTokens(tokensOf(docs).localCheckpoint(), lm)

  private def perplexityFromTokens(toks: DataFrame,
                                   lm: DataFrame): DataFrame = {
    val uni = lm.select(col("w1"), col("c1")).distinct()
    val p = ((coalesce(col("c12"), lit(0L)) + 1).cast("double") /
      (coalesce(col("c1"), lit(0L)) + col("_v")).cast("double"))
    bigramsFromTokens(toks)
      .join(lm.select(col("w1"), col("w2"), col("c12")), Seq("w1", "w2"),
        "left")
      .join(uni, Seq("w1"), "left")
      .crossJoin(broadcast(vocabSizeFromTokens(toks)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        count(col("c12")).as("n_known"),
        sum(coalesce(col("c12"), lit(0L))).as("sum_c12"),
        sum(coalesce(col("c1"), lit(0L))).as("sum_c1"),
        sum(log(p)).as("_lp"))
      .withColumn("ppl", exp(-col("_lp") / col("n_bigrams")))
      .drop("_lp")
  }

  /** Self-scored perplexity: train on `docs`, score `docs` — the corpus
    * bootstrap form (no external reference corpus in the test data; the
    * two-argument [[perplexity]] is the production entry point where the
    * LM comes from a curated reference). The SAME materialized tokenize
    * feeds training, scoring, and the vocabulary (round 20: this path
    * walked the corpus text three times — train bigrams, score bigrams,
    * vocab — for byte-identical token streams).
    */
  def perplexity(docs: DataFrame): DataFrame = {
    val toks = tokensOf(docs).localCheckpoint()
    perplexityFromTokens(toks, bigramLmFromTokens(toks))
  }

  /** Documents whose self-scored perplexity is at most `maxPpl` — the
    * CCNet keep-side. Output carries only integer/string columns; the
    * float decision's cross-engine safety is the measured mid-gap margin
    * (see object doc).
    */
  def perplexityFilter(docs: DataFrame, maxPpl: Double): DataFrame =
    perplexity(docs)
      .filter(col("ppl") <= maxPpl)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("n_bigrams"))

  private val MetaFile = "_LM_META"

  /** Train on `docs` and persist the LM as MAINTENANCE STATE: the count
    * table plus a sidecar holding the TRAIN vocabulary size. Freezing V
    * is the point of the stored form — [[perplexity]] smooths with the
    * SCORED corpus's vocabulary (fine for the one-shot corpus
    * bootstrap), which makes a document's score depend on its
    * batch-mates; a deployed gate needs CHOP-INVARIANT scores (the same
    * document scores identically alone, in a micro-batch, or in a full
    * corpus — LangModelSpec-pinned), so the smoothing constant is fixed
    * at train time and travels with the counts. The
    * [[graft.streaming.DriftStream.writeDriftReference]] pattern applied
    * to the LM family: train weekly, gate daily.
    */
  def writeLm(docs: DataFrame, dir: String): Unit = {
    val spark = docs.sparkSession
    // validate BEFORE any write (the writeKsReference ordering): an
    // empty train set would otherwise persist — and rotateLm then
    // rename-publish — an artifact whose sidecar holds v=0, which
    // readLm later refuses as "corrupt", blaming the artifact instead
    // of the empty input
    val v = docs.select(explode(TextAnalysis.tokens(col("text"))).as("_w"))
      .agg(countDistinct(col("_w"))).head().getLong(0)
    require(v > 0,
      s"writeLm: train set has an empty vocabulary (no tokens) — " +
        "refusing to persist an unusable LM")
    bigramLm(docs).write.mode("overwrite").parquet(s"$dir/counts")
    val p = new org.apache.hadoop.fs.Path(dir, MetaFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s"$v\n".getBytes("UTF-8"))
    finally out.close()
  }

  /** (counts, train-vocab V) of a stored LM. Fails loudly on a missing
    * or corrupt sidecar — a gate scoring with the wrong V silently
    * shifts every score, so the artifact must be self-describing or
    * refused.
    */
  def readLm(spark: org.apache.spark.sql.SparkSession,
             dir: String): (DataFrame, Long) = {
    val p = new org.apache.hadoop.fs.Path(dir, MetaFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"stored LM at $dir lacks $MetaFile — " +
      "rebuild it with LangModel.writeLm")
    val in = fs.open(p)
    val raw =
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        "UTF-8").trim
      finally in.close()
    val v = try raw.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"stored LM at $dir is corrupt: vocab sidecar holds '$raw'")
    }
    require(v > 0, s"stored LM at $dir is corrupt: vocab $v")
    (spark.read.parquet(s"$dir/counts"), v)
  }

  /** Rotate a stored-LM family: train on `docs` and publish the full
    * [[writeLm]] artifact as the next `v=` member of a
    * [[graft.sources.VersionedStore]] — the q186 reference-rotation
    * pattern applied to the LM (retrain weekly, every consumer of an
    * OLD version keeps reading it unchanged). Returns the published
    * version. The reproducibility contract this buys is the q191 one: a
    * curation run PINS the version it gated with ([[lmVersionDir]]) and
    * re-gates bit-identically forever, while the head moves.
    */
  def rotateLm(docs: DataFrame, rootDir: String): Long = {
    val spark = docs.sparkSession
    val next = graft.sources.VersionedStore
      .latestVersion(spark, rootDir).getOrElse(0L) + 1
    graft.sources.VersionedStore.publish(spark, rootDir, next)(tmp =>
      writeLm(docs, tmp))
    next
  }

  /** The directory of one pinned LM version — feed it to
    * [[perplexityStored]]/[[pplGateStored]] or the streaming gate.
    * Refused if absent (a retired version must fail loudly, not fall
    * back to a different model).
    */
  def lmVersionDir(spark: org.apache.spark.sql.SparkSession,
                   rootDir: String, version: Long): String = {
    val vs = graft.sources.VersionedStore.versions(spark, rootDir)
    require(vs.contains(version),
      s"stored-LM store at $rootDir has versions $vs, not $version — " +
        "the pinned model was retired or never published")
    s"$rootDir/v=$version"
  }

  /** The head version's directory — what a freshly-started gate binds. */
  def latestLmDir(spark: org.apache.spark.sql.SparkSession,
                  rootDir: String): String = {
    val v = graft.sources.VersionedStore.latestVersion(spark, rootDir)
      .getOrElse(throw new IllegalArgumentException(
        s"stored-LM store at $rootDir has no published versions"))
    s"$rootDir/v=$v"
  }

  /** [[perplexity]] against a STORED model: identical algebra with the
    * smoothing V read from the artifact instead of the scored corpus —
    * the chop-invariant scoring form every streaming/batch gate must
    * use. Integer sufficient statistics stay oracle-checkable; `ppl`
    * rides engine-internal as always.
    */
  def perplexityStored(spark: org.apache.spark.sql.SparkSession,
                       dir: String, docs: DataFrame): DataFrame = {
    val (lm, v) = readLm(spark, dir)
    val uni = lm.select(col("w1"), col("c1")).distinct()
    val p = ((coalesce(col("c12"), lit(0L)) + 1).cast("double") /
      (coalesce(col("c1"), lit(0L)) + lit(v)).cast("double"))
    bigrams(docs)
      .join(lm.select(col("w1"), col("w2"), col("c12")), Seq("w1", "w2"),
        "left")
      .join(uni, Seq("w1"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        count(col("c12")).as("n_known"),
        sum(coalesce(col("c12"), lit(0L))).as("sum_c12"),
        sum(coalesce(col("c1"), lit(0L))).as("sum_c1"),
        sum(log(p)).as("_lp"))
      .withColumn("ppl", exp(-col("_lp") / col("n_bigrams")))
      .drop("_lp")
  }

  /** The stored-LM quality gate: documents of `docs` whose stored-model
    * perplexity is at most `maxPpl` — [[perplexityFilter]]'s deployed
    * twin (mid-gap threshold discipline applies: the q205 threshold's
    * margin is LangModelSpec-measured). Output carries only
    * integer/string columns.
    */
  def pplGateStored(spark: org.apache.spark.sql.SparkSession, dir: String,
                    docs: DataFrame, maxPpl: Double): DataFrame =
    perplexityStored(spark, dir, docs)
      .filter(col("ppl") <= maxPpl)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("n_bigrams"))

  /** DSIR-style importance scoring (Xie et al. 2023, public): every
    * document of `docs` scored under a TARGET LM (the distribution you
    * want more of) and a REFERENCE LM (the distribution the pool was
    * drawn from) in ONE pass over the pool's bigrams — four model joins
    * on one exploded frame, never two scoring passes. Oracle-checked
    * output is the integer sufficient statistics of BOTH sides
    * (the [[perplexity]] determinism contract, doubled); the per-bigram
    * mean log-likelihood ratio `log_w = Σ ln(p_t/p_r) / n_bigrams` rides
    * as the engine-internal column [[dsirSample]] selects on. Both
    * sides smooth with the same pool-vocabulary V, the [[perplexity]]
    * convention, so V's ulp influence partially cancels in the ratio.
    */
  def importanceStats(docs: DataFrame, targetLm: DataFrame,
                      refLm: DataFrame): DataFrame = {
    def c12(lm: DataFrame, sfx: String) =
      lm.select(col("w1"), col("w2"), col("c12").as(s"c12_$sfx"))
    def c1(lm: DataFrame, sfx: String) =
      lm.select(col("w1"), col("c1").as(s"c1_$sfx")).distinct()
    def p(sfx: String) =
      ((coalesce(col(s"c12_$sfx"), lit(0L)) + 1).cast("double") /
        (coalesce(col(s"c1_$sfx"), lit(0L)) + col("_v")).cast("double"))
    // ONE tokenize pass feeds both the bigram stream and the smoothing
    // vocabulary (round 20 — see [[tokensOf]]); identical algebra.
    val toks = tokensOf(docs).localCheckpoint()
    bigramsFromTokens(toks)
      .join(c12(targetLm, "t"), Seq("w1", "w2"), "left")
      .join(c1(targetLm, "t"), Seq("w1"), "left")
      .join(c12(refLm, "r"), Seq("w1", "w2"), "left")
      .join(c1(refLm, "r"), Seq("w1"), "left")
      .crossJoin(broadcast(vocabSizeFromTokens(toks)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        count(col("c12_t")).as("n_known_t"),
        sum(coalesce(col("c12_t"), lit(0L))).as("sum_c12_t"),
        sum(coalesce(col("c1_t"), lit(0L))).as("sum_c1_t"),
        count(col("c12_r")).as("n_known_r"),
        sum(coalesce(col("c12_r"), lit(0L))).as("sum_c12_r"),
        sum(coalesce(col("c1_r"), lit(0L))).as("sum_c1_r"),
        sum(log(p("t")) - log(p("r"))).as("_lw"))
      .withColumn("log_w", col("_lw") / col("n_bigrams"))
      .drop("_lw")
  }

  /** DSIR importance RESAMPLING: k pool documents, inclusion probability
    * ∝ exp([[importanceStats]]' log_w) — documents that look more like
    * the target than the reference are preferentially kept, the
    * data-selection step in front of pre-training. Selection is
    * [[Corpus.weightedSample]]'s Efraimidis–Spirakis top-k written in
    * the LOG domain (`ln(u)·exp(−log_w)` orders identically to
    * `u^(1/w)` and cannot underflow for strongly out-of-domain
    * documents where `exp(log_w)` would); the same salted-md5 coin
    * keeps the draw deterministic and partitioning-invariant, the same
    * TakeOrderedAndProject keeps it one heap-merge, never a global
    * sort. Selection rides floats, so the query-form artifact is the
    * stats (q204); the sample itself is LangModelSpec-pinned with the
    * measured-boundary-gap discipline.
    */
  def dsirSample(docs: DataFrame, targetLm: DataFrame, refLm: DataFrame,
                 k: Int = 100, salt: String = "graft"): DataFrame = {
    require(k > 0, s"dsirSample: k must be positive, got $k")
    val u = conv(substring(
      md5(concat(col("doc_id").cast("string"), lit(":" + salt))), 1, 12),
      16, 10).cast("double") / lit(math.pow(2, 48))
    importanceStats(docs, targetLm, refLm)
      .join(docs.select(col("doc_id"), col("lang"), col("source")),
        Seq("doc_id"))
      .withColumn("_es_key", log(u) * exp(-col("log_w")))
      .orderBy(col("_es_key").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("lang"), col("source"), col("log_w"))
  }
}
