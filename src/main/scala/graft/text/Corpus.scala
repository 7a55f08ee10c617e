package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators for training-data pipelines (north star,
  * next to [[TextDedup]]/[[TextAnalysis]]): deterministic dataset
  * splitting and sequence packing.
  *
  * Both are pure map-side or shard-local — no global coordination — so
  * they hold at 100 TB: splitting is a per-row hash projection, packing
  * is a windowed running sum inside hash shards (a global pack order is
  * deliberately NOT offered; pretraining consumers shuffle shards anyway,
  * and a single global window would serialize the corpus through one
  * reducer).
  */
object Corpus {

  /** Deterministic train/val/test assignment by md5 range.
    *
    * The first two hex chars of `md5(doc_id ':' salt)` give 256 uniform
    * buckets; the split is decided by STRING comparison against hex
    * thresholds (`floor(256 * pct)`), which every engine orders
    * identically — no hex-to-int conversion, whose SQL spelling is
    * dialect-specific. Changing `salt` re-rolls the assignment;
    * repeating it reproduces the split exactly (the property that makes
    * a multi-run 100 TB pipeline resumable and its eval set stable).
    *
    * Default 80/10/10: train < 'cc' (204/256), val < 'e6' (230/256).
    */
  def deterministicSplit(docs: DataFrame, salt: String = "graft",
                         trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val bucket = splitBucket(col("doc_id"), salt)
    docs.select(
      col("doc_id"),
      bucket.as("bucket_hex"),
      splitRule(bucket, trainPct, valPct).as("split"))
  }

  /** The ONE split-rule definition shared by [[deterministicSplit]] and
    * [[leakageSafeSplit]]: md5 bucket of (key:salt), thresholded at the
    * train/val percent edges — keeping the two splits' assignments
    * IDENTICAL wherever the key is the same (a singleton document splits
    * the same under both, spec-pinned).
    */
  private def splitBucket(key: Column, salt: String): Column =
    substring(md5(concat(key.cast("string"), lit(":" + salt))), 1, 2)

  private def splitRule(bucket: Column, trainPct: Int, valPct: Int): Column = {
    require(trainPct > 0 && valPct > 0 && trainPct + valPct < 100,
      s"train+val must leave room for test, got $trainPct+$valPct")
    val t1 = f"${(256 * trainPct) / 100}%02x"
    val t2 = f"${(256 * (trainPct + valPct)) / 100}%02x"
    when(bucket < t1, "train").when(bucket < t2, "val").otherwise("test")
  }

  /** Leakage-safe train/val/test split: the split UNIT is the near-dup
    * CLUSTER, not the document. [[deterministicSplit]] hashes doc ids, so
    * two near-duplicates can land on opposite sides of the split — test
    * content leaking into training through its own duplicate, the
    * within-corpus sibling of eval-set contamination (q68/q177 remove
    * eval look-alikes; this stops the corpus's duplicates from BRIDGING
    * the split). Every document keys by its near-dup component
    * representative ([[graft.text.TextDedup.dedupClusters]] min-id over
    * the banded MinHash pair graph); singletons key by their own id; the
    * shared md5 rule applies to the KEY. Consequences, both spec-pinned:
    * every member of a cluster lands on one side, and a singleton's
    * assignment is identical to [[deterministicSplit]]'s.
    *
    * Scale: pair generation is the banded MinHash path (never
    * all-pairs), the component fold is O(log diameter) edge rounds, and
    * the split itself is one join of the cluster map (pair-touched docs
    * only — a small fraction of any real corpus) onto the corpus plus a
    * map-side hash. Output (doc_id, split_key, bucket_hex, split).
    */
  def leakageSafeSplit(docs: DataFrame, threshold: Double = 0.5,
                       salt: String = "graft",
                       trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val clusters = graft.text.TextDedup.dedupClusters(
      graft.text.TextDedup.nearDupPairs(docs, threshold = threshold))
    val key = coalesce(col("cluster_id"), col("doc_id"))
    val bucket = splitBucket(key, salt)
    docs.select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"), key.as("split_key"), bucket.as("bucket_hex"),
        splitRule(bucket, trainPct, valPct).as("split"))
  }

  /** End-to-end corpus curation (the C4/Gopher-style rule pipeline): keep
    * documents that (a) language-identify as `lang`, (b) score at least
    * `minQuality`, (c) repeat at most `maxRepetition` of their word
    * n-grams — and, implicitly, have at least n tokens (the repetition
    * branch drops shorter docs: the min-length rule). One row per
    * surviving doc with the three deciding signals.
    *
    * Plan shape: ONE fused row-wise projection over a single corpus scan
    * computes all three per-row signals (pred_lang, quality, and the
    * n-gram occurrence total) and filters lang + quality before any
    * shuffle — at 100 TB the corpus is read exactly twice: once for the
    * fused row-wise pass, once for the distinct-shingle aggregate (the
    * irreducible explode branch). Survivors of the row-wise filters —
    * not the corpus — flow through the one 1:1 doc_id join.
    * Scan count is pinned in PlanSpec ("q72 curate reads documents at
    * most twice").
    */
  def curate(docs: DataFrame, lang: String = "en", minQuality: Double = 1.0,
             maxRepetition: Double = 0.2, n: Int = 3): DataFrame = {
    // Scores projected as named columns first so the argmax (which
    // references each score ~4×) is written once in the plan; both
    // selects fuse into one codegen stage over one scan.
    val scored = docs.select(
      Seq(col("doc_id"), col("text")) ++
        TextAnalysis.langScores(col("text")).map { case (l, s) =>
          s.as(s"${l}_score")
        }: _*)
    val rowwise = scored
      .select(
        col("doc_id"),
        TextAnalysis.predLangExpr(l => col(s"${l}_score")).as("pred_lang"),
        TextAnalysis.qualityExpr(col("text")).as("quality"),
        (size(TextAnalysis.tokens(col("text"))) - (n - 1)).cast("long")
          .as("n_shingles_total"))
      .filter(col("pred_lang") === lang && col("quality") >= minQuality &&
        col("n_shingles_total") > 0)
    val distinctShingles = TextDedup.shingles(docs, n)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_distinct_shingles"))
    rowwise.join(distinctShingles, Seq("doc_id"))
      .select(col("doc_id"), col("pred_lang"), col("quality"),
        (lit(1.0) - col("n_distinct_shingles").cast("double") /
          col("n_shingles_total")).as("repetition"))
      .filter(col("repetition") <= maxRepetition)
  }

  /** Deterministic per-stratum subsampling (the domain-mixing step: weight
    * a corpus toward a target source/language mixture by downsampling the
    * over-represented strata). A document is kept iff its salted md5
    * bucket — the first 4 hex chars, 65536 uniform buckets — falls below
    * `floor(65536 · rate)` for its stratum; strata absent from `rates`
    * are dropped. Pure map-side projection + filter, the same
    * hex-threshold algebra as [[deterministicSplit]]: reproducible
    * run-over-run, re-rolled by salt, zero shuffles at any corpus size,
    * and cross-engine exact (string compare on hex, no float rates in
    * the decision).
    */
  def stratifiedSample(docs: DataFrame, rates: Map[String, Double],
                       stratumCol: String = "lang",
                       salt: String = "graft"): DataFrame = {
    require(rates.nonEmpty && rates.values.forall(r => r >= 0 && r <= 1),
      s"rates must be fractions in [0,1]: $rates")
    val thresholds = rates.map { case (s, r) =>
      s -> f"${math.floor(65536 * r).toLong}%04x"
    }
    val bucket = substring(
      md5(concat(col("doc_id").cast("string"), lit(":" + salt))), 1, 4)
    val thr = thresholds.foldLeft(lit(null).cast("string")) {
      case (acc, (s, t)) => when(col(stratumCol) === s, t).otherwise(acc)
    }
    docs
      .withColumn("_bucket", bucket)
      .withColumn("_thr", thr)
      .filter(col("_thr").isNotNull && col("_bucket") < col("_thr"))
      .select(col("doc_id"), col(stratumCol), col("_bucket").as("bucket_hex"))
  }

  /** Top-V token vocabulary with contiguous ids (the tokenizer-prep step):
    * global token frequencies, truncated to the `topV` most frequent,
    * ids assigned 1..V by (count desc, token asc) — fully deterministic,
    * so re-running on the same corpus yields the same vocab.
    *
    * Scale: the count is one partial+final hash aggregate on the token;
    * the truncation plans as TakeOrderedAndProject (no global sort of the
    * full token set); only the V surviving rows pass through the global
    * row_number window, so the single-partition window is bounded by V,
    * never by the corpus. The [[onePartitionKey]] marker states that
    * bound in the plan — WindowExec's "No Partition Defined" warning is
    * reserved for windows whose single partition could BE the corpus.
    */
  def buildVocab(docs: DataFrame, topV: Int = 256): DataFrame = {
    require(topV > 0)
    val w = Window.partitionBy(col("_p"))
      .orderBy(col("n_occurrences").desc, col("token").asc)
    onePartitionKey(
      docs.select(explode(TextAnalysis.tokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n_occurrences"))
        .orderBy(col("n_occurrences").desc, col("token").asc).limit(topV))
      .withColumn("token_id", row_number().over(w).cast("int"))
      .drop("_p")
  }

  /** A single-partition window key that SURVIVES optimization: a LITERAL
    * marker gets stripped by Spark's EliminateWindowPartitions rule,
    * putting a bounded V-row window right back on the partition-less
    * warning path. An attribute sourced from a 1-row range scan is
    * semantically the same constant, but no rule can prove it foldable —
    * the broadcast nested-loop join it rides is one row against V.
    */
  private def onePartitionKey(df: DataFrame): DataFrame =
    df.crossJoin(broadcast(
      df.sparkSession.range(1).select(col("id").cast("int").as("_p"))))

  /** Tokenizer application (the encode step after [[buildVocab]]): one row
    * per token POSITION — (doc_id, pos, token_id), OOV mapped to the
    * reserved id 0 (vocab ids start at 1). Emitted exploded rather than
    * as an array column so the output is scalar-typed end to end (ready
    * for [[packSequences]]-style downstream aggregation, and exactly
    * cross-engine comparable).
    *
    * Scale: one posexplode off the corpus scan + one join on the token
    * key; the vocab is V rows — broadcast by size estimation for any
    * realistic V, so the corpus never shuffles.
    */
  /** One BPE-training iteration's pair statistics (the tokenizer-TRAINING
    * counterpart of [[buildVocab]]/[[encode]]): corpus-wide counts of
    * ADJACENT token pairs — the argmax is the merge a byte-pair-encoding
    * trainer applies next, and the full ranked table is the iteration's
    * merge candidate list. `minCount` prunes the long tail (the standard
    * BPE frequency floor).
    *
    * Scale: pairs are emitted MAP-SIDE from each document's token array —
    * slice + zip_with inside one codegen'd projection, no per-position
    * explode-then-self-join on pos+1, no window over positions — so the
    * only shuffle is the (a, b) count aggregate (partial+final on the
    * pair key). The pair key space is bounded by vocabulary², hash-
    * aggregable; the corpus itself never shuffles. Each BPE round is one
    * such aggregate over the re-tokenized corpus — the canonical
    * train-loop shape.
    */
  def bpePairCounts(docs: DataFrame, minCount: Long = 2): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    // both slices have length n-1 (greatest guards size-0 arrays, where
    // a negative slice length would throw); zip_with pairs element i
    // with element i+1
    val n1 = greatest(size(toks) - 1, lit(0))
    docs
      .select(explode(zip_with(
        slice(toks, lit(1), n1), slice(toks, lit(2), n1),
        (a, b) => struct(a.as("a"), b.as("b")))).as("_pair"))
      .groupBy(col("_pair.a").as("a"), col("_pair.b").as("b"))
      .agg(count(lit(1)).as("n_pairs"))
      .filter(col("n_pairs") >= minCount)
  }

  /** One BPE merge applied to the corpus: every greedy left-to-right
    * adjacent occurrence of tokens `(a, b)` becomes the single token
    * `a + joiner + b` ([[graft.functions.BpeMergeText]] — one codegen'd
    * byte walk per document, no regex, no per-token allocation). The
    * `text` column is replaced; all other columns pass through.
    */
  def applyBpeMerge(docs: DataFrame, a: String, b: String,
                    joiner: String = "▁"): DataFrame =
    docs.withColumn("text",
      graft.functions.BpeMergeTextMath.bpeMergeTextCol(col("text"), a, b,
        joiner))

  /** Greedy BPE training over the whitespace token stream: up to
    * `nMerges` rounds of [[bpePairCounts]]-argmax → [[applyBpeMerge]],
    * returning the merge table (step, a, b, n_pairs) a tokenizer builds
    * its merge ranks from. Deterministic: the argmax tie-breaks
    * (n_pairs desc, a asc, b asc); training stops early when no pair
    * reaches `minCount`. Boundary empty tokens (leading/trailing
    * whitespace artifacts) are never selected as merge halves.
    *
    * Scale: each round is one pair-count aggregate (map-side pair
    * emission off the corpus scan), ONE bounded driver collect (the
    * single argmax row — the centroid-collect precedent), and a
    * codegen'd merge projection. The corpus re-materializes per round
    * via `localCheckpoint`, so round k+1 scans the merged corpus once
    * instead of re-running a k-deep merge lineage — the same
    * round-truncation contract as [[TextDedup.dedupClusters]].
    */
  def bpeTrain(docs: DataFrame, nMerges: Int, minCount: Long = 2,
               joiner: String = "▁"): DataFrame = {
    require(nMerges > 0, s"nMerges must be positive, got $nMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    var cur = docs.select(col("doc_id"), col("text"))
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var step = 1
    var exhausted = false
    while (!exhausted && step <= nMerges) {
      val top = bpePairCounts(cur, minCount)
        .filter(col("a") =!= "" && col("b") =!= "")
        .orderBy(col("n_pairs").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val r = top(0)
        merges += ((step, r.getString(0), r.getString(1), r.getLong(2)))
        cur = applyBpeMerge(cur, r.getString(0), r.getString(1), joiner)
          .localCheckpoint(false)
        step += 1
      }
    }
    merges.toSeq.toDF("step", "a", "b", "n_pairs")
  }

  /** Tokenizer INFERENCE: the full rank-ordered merge table applied to
    * every document in ONE corpus pass ([[graft.functions.BpeEncodeText]]
    * — heap-ordered merge events per document, table broadcast as an
    * expression reference object). Exactly equivalent to folding
    * [[applyBpeMerge]] over the table in rank order (spec-pinned for
    * nMerges 1..8 plus the rank-skip divergence case), but the corpus is
    * scanned once regardless of table size — [[bpeTrain]]'s
    * one-pass-per-merge chaining is the TRAINING shape and cannot encode
    * at realistic merge counts (32k merges = 32k corpus scans).
    *
    * `merges` is [[bpeTrain]]'s output (or any (step, a, b) frame);
    * collected to the driver ordered by step — vocab-sized, the
    * centroid-collect precedent.
    */
  def bpeEncode(docs: DataFrame, merges: DataFrame,
                joiner: String = "▁"): DataFrame = {
    val table = merges.select(col("step"), col("a"), col("b"))
      .orderBy(col("step")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    bpeEncodeLiteral(docs, table, joiner)
  }

  /** [[bpeEncode]] with a literal merge table (the cross-engine-checkable
    * form: literal merges are expressible in the DuckDB oracle).
    */
  def bpeEncodeLiteral(docs: DataFrame, merges: Seq[(String, String)],
                       joiner: String = "▁"): DataFrame =
    docs.withColumn("text",
      graft.functions.BpeEncodeTextMath.bpeEncodeTextCol(col("text"),
        merges, joiner))

  def encode(docs: DataFrame, vocab: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "token")))
      .join(vocab.select(col("token"), col("token_id")), Seq("token"), "left")
      .select(col("doc_id"), col("pos"),
        coalesce(col("token_id"), lit(0)).cast("int").as("token_id"))

  /** Per-stratum quota cap (the "at most N docs per domain" rule): keep
    * each stratum's first `maxPerStratum` documents in salted-md5 hash
    * order — a deterministic uniform choice, like [[stratifiedSample]]
    * but with an absolute cap instead of a rate. One window per stratum;
    * partition count scales with stratum cardinality, and each partition
    * ranks only its own stratum.
    */
  def capPerStratum(docs: DataFrame, maxPerStratum: Int,
                    stratumCol: String = "lang",
                    salt: String = "graft"): DataFrame = {
    require(maxPerStratum > 0)
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(col("_bucket").asc, col("doc_id").asc)
    docs
      .withColumn("_bucket",
        md5(concat(col("doc_id").cast("string"), lit(":" + salt))))
      .withColumn("rank_in_stratum", row_number().over(w).cast("int"))
      .filter(col("rank_in_stratum") <= maxPerStratum)
      .select(col("doc_id"), col(stratumCol), col("rank_in_stratum"))
  }

  /** Eval-set decontamination: for each eval document, the fraction of its
    * distinct word n-grams that appear ANYWHERE in the training corpus
    * (the standard benchmark-leakage check run before training). Returns
    * every eval doc with >= n tokens: (doc_id, n_shingles, n_contaminated,
    * contamination), zero-overlap docs included.
    *
    * Shape: the train side — the 100 TB side — collapses to distinct
    * shingle HASHES and is consumed ONCE as the membership tag of a left
    * join (unique keys, so no row multiplication; shuffle on the 8-byte
    * hash key). The eval subtree is consumed once too: sizes and hits are
    * two counts of the SAME grouped pass over the tagged rows. Since
    * round 8 both sides ride [[hashedShingles]] (the codegen'd
    * [[graft.functions.WordNgramHashes]] walk): matching is on n-gram
    * identity, so the counts the oracle checks are unchanged while the
    * shingle STRING — whose production dominated the data path — never
    * exists (the q102-q105 re-key applied to this family).
    */
  def contamination(evalDocs: DataFrame, trainDocs: DataFrame,
                    n: Int = 3): DataFrame = {
    val evalSh = hashedShingles(evalDocs, n)
    val trainSh = hashedShingles(trainDocs, n).select(col("_h")).distinct()
    // one aggregate serves sizes AND hits: the distinct train set joins
    // as a membership tag (unique keys — no row multiplication), so the
    // eval subtree is consumed once and the sizes/hits/outer-join trio
    // collapses to join + groupBy (the q86 single-aggregate shape)
    evalSh.join(trainSh.withColumn("_hit", lit(1)), Seq("_h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        count(col("_hit")).as("n_contaminated"))
      .select(col("doc_id"), col("n_shingles"), col("n_contaminated"),
        (col("n_contaminated").cast("double") /
          col("n_shingles")).as("contamination"))
  }

  /** Fixed-memory decontamination: the train side collapses to ONE
    * bloom filter instead of its distinct shingle set. [[contamination]]
    * and [[contaminationBroadcast]] carry exact train state whose size
    * grows with the corpus; here the 100 TB side folds map-side into a
    * `numBits` filter (partials OR together — one tiny binary reaches the
    * driver), which is then inlined as a literal so the eval probe is a
    * pure codegen'd projection. The price is one-sided error: per-doc
    * `n_flagged` can only OVER-count (bloom false positives, rate set by
    * numBits/items) — never under-count, so no contaminated document
    * escapes (TextSpec pins `n_flagged >= n_contaminated` per doc).
    * Output shape mirrors [[contamination]] with flagged_frac in place of
    * contamination. Since round 17 the filter is the engine's OWN
    * deterministic poly bloom ([[graft.functions.PolyBloomAgg]]): the k
    * probe positions derive from the poly n-gram identity with pure
    * integer arithmetic, so the flag decision — false positives included
    * — is re-derivable in plain SQL and q87 is hash-exact checked
    * (previously Spark's BloomFilterAggregate re-hashed the identities
    * internally, which kept this path rows-only with q68/q79 as the
    * exact twins).
    */
  def contaminationBloom(evalDocs: DataFrame, trainDocs: DataFrame,
                         n: Int = 3, numBits: Int = 1 << 23,
                         k: Int = 5): DataFrame = {
    import graft.functions.GraftFunctions.{poly_bloom_agg, poly_bloom_contains}
    // Bloom insertion is duplicate-invariant: the raw per-occurrence
    // hash stream feeds the aggregate straight off the scan — no
    // distinct shuffle on the train side at all (cheaper than even the
    // broadcast form), and since round 8 the n-gram identity comes from
    // the codegen'd WordNgramHashes walk, so no shingle string exists.
    val filterBytes = trainDocs
      .select(explode(graft.functions.WordNgramHashesMath
        .wordNgramHashesCol(col("text"), n)).as("_h"))
      .agg(poly_bloom_agg(col("_h"), numBits, k).as("f"))
      .head().getAs[Array[Byte]]("f")
    val evalSh = hashedShingles(evalDocs, n)
    val hit = poly_bloom_contains(lit(filterBytes), col("_h"), numBits, k)
    evalSh.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        count(when(hit, 1)).as("n_flagged"))
      .select(col("doc_id"), col("n_shingles"), col("n_flagged"),
        (col("n_flagged").cast("double") / col("n_shingles"))
          .as("flagged_frac"))
  }

  /** Distinct `(doc_id, hash)` shingle-identity pairs — the 8-byte shuffle
    * twin of [[TextDedup.shingles]], for consumers that only need shingle
    * IDENTITY, not text. The distinct and every aggregate downstream
    * exchange 16-byte rows instead of n-gram strings; at corpus scale the
    * shuffle volume drops by the mean shingle width (~50 bytes for word
    * 3-grams). Since round 8 the hashes come from the codegen'd
    * [[graft.functions.WordNgramHashes]] byte walk — the shingle STRING
    * production (regex split + explode + concat_ws) that used to feed
    * the per-shingle hash was the family's dominant data-path cost, not
    * the shuffle width. Hash values are the poly window fold (round 17 —
    * cross-engine, see [[graft.functions.WordNgramHashes]]); the
    * persisted-hotlist state format is versioned accordingly
    * ([[writeHotlist]]).
    */
  private def hashedShingles(docs: DataFrame, n: Int): DataFrame =
    // array_distinct BEFORE the explode: distinct (doc_id, _h) pairs ≡
    // per-document distinct hashes, so deduping inside the array — one
    // codegen'd pass over each doc's hash array — replaces what used to
    // be a corpus-sized distinct EXCHANGE. Downstream aggregates then
    // start from already-distinct pairs and partial-aggregate map-side;
    // the only corpus-wide shuffles left in this family are the
    // small-output hot aggregate and the per-doc count.
    docs.select(col("doc_id"),
      explode(array_distinct(graft.functions.WordNgramHashesMath
        .wordNgramHashesCol(col("text"), n))).as("_h"))

  /** Hash values whose document frequency reaches `minDocs`, from the
    * distinct (doc_id, _h) pairs — the hotlist side of
    * [[boilerplateFraction]]'s flag join, and the PRODUCTION form of
    * [[boilerplateNgrams]] (q64-to-q30 twin relation): every consumer in
    * this engine probes the hotlist by hash identity, so the n-gram TEXT
    * — the one payload that makes q85 carry strings through its
    * aggregate — never needs to exist. 8-byte rows end to end.
    */
  private[text] def hotHashes(hashed: DataFrame, minDocs: Int): DataFrame =
    hashed.groupBy(col("_h")).agg(count(lit(1)).as("_dfh"))
      .filter(col("_dfh") >= minDocs).select(col("_h"))

  /** The text-free boilerplate hotlist — (hot_hash, df) — for consumers
    * that probe by identity (all of them: [[boilerplateFraction]],
    * [[writeHotlist]]'s probes, the streaming scrub). Since round 17 the
    * hashes are the CROSS-ENGINE poly window fold
    * ([[graft.functions.WordNgramHashes]]), so q109 is hash-exact
    * oracle-checked in its own right; [[boilerplateNgrams]] (q85) stays
    * as the text-carrying twin (TextSpec pins row parity between the
    * two). Changing the hash family means changing the q109 oracle AND
    * every hash-identity state version — do not reintroduce an
    * engine-internal hash here.
    */
  def boilerplateHotHashes(docs: DataFrame, minDocs: Int = 3,
                           n: Int = 3): DataFrame =
    hashedShingles(docs, n)
      .groupBy(col("_h").as("hot_hash")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocs)

  /** Cross-corpus repeated n-grams (the "boilerplate" signal of C4-style
    * line dedup, at n-gram granularity): every word n-gram appearing in
    * at least `minDocs` DISTINCT documents, with its document frequency.
    * Headers, footers, license blurbs, and navigation chrome surface
    * here; the list is the input to passage-level cleaning.
    *
    * Scale shape, re-keyed in round 7: ONE corpus scan and one aggregate
    * chain GROUPED BY `xxhash64(shingle)` — the shuffle key is 8 bytes,
    * not n-gram text; the text rides along only as a `min(shingle)`
    * payload so the output keeps the human-readable n-gram. The earlier
    * text-keyed form (distinct + groupBy on the shingle string) paid two
    * corpus-sized string exchanges; A/B at sf0.1 measured 0.52 s vs
    * 0.91 s warm for identical output. A two-scan hash-then-recover
    * variant (broadcast the hot hashes back for the text) re-paid the
    * shingle generation and lost to BOTH (1.09 s) — shingle explode cost
    * dominates shuffle width here, so the single-scan form wins.
    *
    * Exactness bound (same trade as [[boilerplateFraction]], documented
    * once there): a 64-bit collision merges two n-grams into one group —
    * min-text row with the union df. Zero collisions on every test
    * corpus (TextSpec pins bit-identity against the text-keyed form);
    * at 10^12 distinct shingles the expected number of affected rows is
    * ~10^4 out of 10^12 — noise for a boilerplate signal.
    */
  def boilerplateNgrams(docs: DataFrame, minDocs: Int = 3,
                        n: Int = 3): DataFrame =
    // countDistinct-next-to-min was A/B'd against an explicit two-phase
    // form (distinct (hash, doc) pairs with a text witness, then count):
    // the two-phase variant exchanges the shingle TEXT through the wider
    // (hash, doc)-keyed first shuffle and measured 1.25 s vs 1.03 s at
    // sf0.1 — the mixed-distinct plan's partial aggregation dedups
    // before exchanging and wins despite its Expand.
    TextDedup.shinglesRaw(docs, n)
      .groupBy(xxhash64(col("shingle")).as("_h"))
      .agg(countDistinct(col("doc_id")).as("df"),
        min(col("shingle")).as("shingle"))
      .filter(col("df") >= minDocs)
      .select(col("shingle"), col("df"))

  /** Per-document boilerplate fraction: the share of a doc's distinct
    * n-grams that are corpus-wide repeated ([[boilerplateNgrams]]) — the
    * per-doc filter signal ("drop documents that are mostly chrome").
    *
    * Rides the same 8-byte keys as [[boilerplateNgrams]]: the distinct
    * (doc_id, _h) set is consumed twice (the hotlist build and the
    * flag-join) and each consumer RECOMPUTES it from the scan — with
    * [[hashedShingles]]' array-level dedup the recompute is one cheap
    * codegen'd pass (measured ≤ the round-7 localCheckpoint
    * materialization at sf0.1), and at 100 TB re-reading the scan beats
    * materializing a corpus-sized intermediate that no executor's
    * storage holds. Every downstream aggregate carries counts only, and
    * the hotlist side of the flag join is df-filtered and broadcast.
    *
    * Exactness bound: a 64-bit collision between two distinct shingles in
    * the SAME document undercounts that doc's n_shingles by 1, and a
    * collision with a hot hash can flag one extra n-gram. P(any same-doc
    * collision) <= sum over docs of s_d^2 / 2^65 — for 10^12 docs of
    * ~300 shingles each that is ~2e-3 for the whole corpus, i.e. expected
    * errors well under one row at 100 TB; on the test corpora there are
    * zero 64-bit collisions and the output is bit-identical to the
    * text-keyed form (asserted by TextSpec against a text-keyed oracle).
    */
  def boilerplateFraction(docs: DataFrame, minDocs: Int = 3,
                          n: Int = 3): DataFrame = {
    val sh = hashedShingles(docs, n)
    val hot = hotHashes(sh, minDocs)
    // ONE aggregate serves both measures: the broadcast LEFT join tags
    // each (doc, hash) row with hot membership, and n_boiler is just
    // count(tag) in the same groupBy that counts n_shingles — the earlier
    // sizes-agg + semi-join-agg + outer-join form paid two extra stages
    // over the same rows for the same answer (measured 1.32 → 0.86 s at
    // sf0.1 once the bench forced the full result).
    sh.join(broadcast(hot.withColumn("_hot", lit(1))), Seq("_h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"), count(col("_hot")).as("n_boiler"))
      .select(col("doc_id"), col("n_shingles"), col("n_boiler"),
        (col("n_boiler").cast("double") /
          col("n_shingles")).as("boilerplate_frac"))
  }

  /** Persist the boilerplate hotlist as reusable state: every n-gram
    * identity hash ([[graft.functions.WordNgramHashes]] — the format
    * version in the StateCache marker tracks the hash family, bumped
    * round 17 for the xxhash64→poly switch) whose df reaches `minDocs`,
    * with its df — the maintenance half of the incremental passage-
    * cleaning pattern (the text-domain analogue of the q83 signature
    * index and the IVF centroid table: corpus-wide state is built once,
    * then daily batches probe it). One corpus scan, one 8-byte-keyed
    * aggregate, hotlist-sized output.
    */
  def writeHotlist(docs: DataFrame, dir: String, minDocs: Int = 3,
                   n: Int = 3): Unit =
    hashedShingles(docs, n)
      .groupBy(col("_h")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocs)
      .write.mode("overwrite").parquet(dir)

  /** Per-doc boilerplate fraction of a DELTA against a persisted
    * [[writeHotlist]] hotlist — the incremental form of
    * [[boilerplateFraction]]: the corpus never re-aggregates; each batch
    * is one shingle pass over the delta plus a broadcast membership
    * probe (the q86 single-aggregate shape). Same freshness trade as
    * every index-probe operator here (q83 signatures, IVF centroids):
    * n-grams that become hot only BECAUSE of recent deltas are missed
    * until the next hotlist rebuild; flagged fractions are exact with
    * respect to the state as written.
    */
  def boilerplateAgainstHotlist(spark: org.apache.spark.sql.SparkSession,
                                dir: String, delta: DataFrame,
                                n: Int = 3): DataFrame = {
    val hot = spark.read.parquet(dir).select(col("_h"), lit(1).as("_hot"))
    hashedShingles(delta, n)
      .join(broadcast(hot), Seq("_h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"), count(col("_hot")).as("n_boiler"))
      .select(col("doc_id"), col("n_shingles"), col("n_boiler"),
        (col("n_boiler").cast("double") /
          col("n_shingles")).as("boilerplate_frac"))
  }

  /** Repeated spans of a DELTA against a persisted [[writeHotlist]]
    * hotlist — incremental [[TextDedup.repeatedSpans]]: positions whose
    * n-gram is hot IN THE STATE chain into maximal intervals exactly as
    * the batch form does, but the corpus-side df aggregate is replaced
    * by the broadcast probe, so per-batch cost is one delta scan + a
    * delta-bounded window. Combined with [[TextDedup.scrubRepeatedSpans]]'s
    * rebuild this is the production shape of streaming passage cleaning:
    * scrub each arriving batch against last night's hotlist.
    */
  def spansAgainstHotlist(spark: org.apache.spark.sql.SparkSession,
                          dir: String, delta: DataFrame, n: Int = 3,
                          minSpanTokens: Int = 3): DataFrame =
    TextDedup.explodeRanges(
      hotlistRanges(spark, dir, delta, n, minSpanTokens))

  /** The incremental detector in array form ([[TextDedup.chainSpanRanges]]
    * over the state-probed hits) — the per-batch twin of the batch
    * pipeline's spanRangesOf.
    */
  private def hotlistRanges(spark: org.apache.spark.sql.SparkSession,
                            dir: String, delta: DataFrame, n: Int,
                            minSpanTokens: Int): DataFrame = {
    val hot = spark.read.parquet(dir).select(col("_h"))
    TextDedup.chainSpanRanges(
      TextDedup.hashedShinglesWithPos(delta, n)
        .join(broadcast(hot), Seq("_h"), "left_semi"), n, minSpanTokens)
  }

  /** Incremental passage SCRUB: each delta document rebuilt without its
    * state-hot spans — [[spansAgainstHotlist]] detection +
    * [[TextDedup.scrubRepeatedSpans]]'s gap-slicing rebuild, composed.
    * This is the per-batch body of streaming passage cleaning: scrub
    * every arriving batch against last night's hotlist, rebuild the
    * hotlist on the maintenance cadence.
    */
  def scrubAgainstHotlist(spark: org.apache.spark.sql.SparkSession,
                          dir: String, delta: DataFrame,
                          n: Int = 3): DataFrame =
    TextDedup.scrubRanges(delta,
      hotlistRanges(spark, dir, delta, n, minSpanTokens = n))

  /** Relative quality filtering (the complement of [[curate]]'s absolute
    * threshold: "keep each source's best quarter", robust to sources
    * whose score DISTRIBUTIONS differ — an absolute cutoff keeps
    * everything from an easy domain and nothing from a hard one). Keeps
    * the top `keepFrac` of each stratum by quality percent_rank, ties
    * broken by doc_id so the kept set is fully deterministic.
    *
    * Cross-engine exactness: quality is the q33 integer-ratio score and
    * percent_rank is (rank−1)/(n−1) of exact integers — both
    * correctly-rounded single divisions, bit-identical in any engine.
    * Scale: one window per stratum (the [[capPerStratum]] shape) —
    * partition count scales with stratum cardinality, each ranks only
    * its own stratum. Single-doc strata have percent_rank 0 and drop
    * (no "best quarter" of one document).
    */
  def qualityQuantileFilter(docs: DataFrame, keepFrac: Double = 0.25,
                            stratumCol: String = "source"): DataFrame = {
    require(keepFrac > 0 && keepFrac <= 1, s"keepFrac in (0,1], got $keepFrac")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(col("quality").asc, col("doc_id").asc)
    docs.select(col("doc_id"), col(stratumCol),
        TextAnalysis.qualityExpr(col("text")).as("quality"))
      .withColumn("q_rank", percent_rank().over(w))
      .filter(col("q_rank") >= 1.0 - keepFrac)
  }

  /** Corpus version diff (the dataset-versioning primitive: what changed
    * between snapshot v1 and snapshot v2): one row per doc_id present in
    * either version with a different state — `added` (v2 only),
    * `removed` (v1 only), `changed` (both, text differs by md5).
    * Unchanged documents produce NO row, so the output is
    * delta-sized — the property that makes the diff usable as a change
    * feed (feed `added`+`changed` to the incremental probes, `removed`
    * to downstream retractions).
    *
    * Shape: each side collapses to (doc_id, md5(text)) map-side — 48-byte
    * rows, never text — then ONE full outer join on doc_id classifies
    * every id. At 100 TB both sides shuffle once on the key; text never
    * moves.
    */
  def corpusDiff(v1: DataFrame, v2: DataFrame): DataFrame = {
    val a = v1.select(col("doc_id"), md5(col("text")).as("_h1"))
    val b = v2.select(col("doc_id"), md5(col("text")).as("_h2"))
    a.join(b, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("_h1").isNull, "added")
          .when(col("_h2").isNull, "removed")
          .when(col("_h1") =!= col("_h2"), "changed"))
      .filter(col("status").isNotNull)
      .select(col("doc_id"), col("status"))
  }

  /** Overlapping token-window chunking (the RAG/context-window prep step):
    * one row per chunk of `chunkSize` tokens, windows starting every
    * `chunkSize - overlap` tokens, the final window short if the document
    * ends mid-chunk. Emits (doc_id, chunk_id, n_chunk_tokens, chunk_text)
    * with chunk ids contiguous from 0 per document.
    *
    * Pure map-side: tokenize → explode the window-START index (an int
    * sequence, not the token array — the explode multiplies rows by
    * chunks-per-doc, not tokens-per-doc) → slice and re-join each window.
    * Zero shuffles at any corpus size.
    */
  def chunk(docs: DataFrame, chunkSize: Int = 64, overlap: Int = 16): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got chunkSize=$chunkSize overlap=$overlap")
    val stride = chunkSize - overlap
    docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("_toks"))
      .filter(size(col("_toks")) >= 1)
      .withColumn("_start", explode(expr(s"sequence(1, size(_toks), $stride)")))
      .select(
        col("doc_id"),
        expr(s"CAST((_start - 1) DIV $stride AS INT)").as("chunk_id"),
        least(lit(chunkSize), size(col("_toks")) - col("_start") + 1)
          .cast("int").as("n_chunk_tokens"),
        concat_ws(" ", expr(s"slice(_toks, _start, $chunkSize)")).as("chunk_text"))
  }

  /** Scale twin of [[contamination]] for the case the eval set is small
    * enough to broadcast (the normal case: benchmarks are MBs, the corpus
    * is TBs): identical output, but the TRAIN side — the 100 TB side —
    * is consumed once by a map-side broadcast semi-join and NEVER
    * shuffles. [[contamination]] shuffles both shingle sets on the
    * shingle key; here the only exchanges are over eval-sized data (the
    * surviving train shingles are a subset of the eval set by
    * construction, so the second-stage distinct and broadcast are
    * eval-bounded too).
    */
  def contaminationBroadcast(evalDocs: DataFrame, trainDocs: DataFrame,
                             n: Int = 3): DataFrame = {
    val evalSh = hashedShingles(evalDocs, n)
    val evalKeys = evalSh.select(col("_h")).distinct()
    // Which eval n-grams appear in train — computed FROM the train scan
    // (raw per-occurrence hashes: the broadcast semi-join is
    // duplicate-invariant, so the train side skips its distinct shuffle
    // as well, and the codegen'd hash walk means the train corpus never
    // materializes a shingle string — the round-8 re-key).
    val present = trainDocs
      .select(explode(graft.functions.WordNgramHashesMath
        .wordNgramHashesCol(col("text"), n)).as("_h"))
      .join(broadcast(evalKeys), Seq("_h"), "left_semi")
      .distinct()
    evalSh.join(broadcast(present.withColumn("_hit", lit(1))),
        Seq("_h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        count(col("_hit")).as("n_contaminated"))
      .select(col("doc_id"), col("n_shingles"), col("n_contaminated"),
        (col("n_contaminated").cast("double") /
          col("n_shingles")).as("contamination"))
  }

  /** Temperature-based mixture reweighting (the multilingual/multi-domain
    * sampling rule: keep-rate per stratum ∝ n_s^α, α = 1/2, normalized so
    * the largest stratum keeps everything) — flattens the corpus mixture
    * toward under-represented strata without an explicit rate table.
    *
    * Determinism contract: α is FIXED at 1/2 because `sqrt` and division
    * are IEEE-754 correctly-rounded on every engine (an arbitrary `pow`
    * is not), so the per-stratum threshold floor(65536·√(n_s/n_max)) is
    * bit-identical cross-engine and the keep decision — a string compare
    * of the salted md5 bucket against the 5-hex-digit threshold — is
    * exactly reproducible. The 5-digit padding makes threshold 0x10000
    * ("keep all", the largest stratum) compare correctly against 4-digit
    * buckets.
    *
    * Scale: one count aggregate over the corpus, a broadcast of the
    * V-row threshold table back onto the scan, and a map-side filter —
    * the corpus itself never shuffles.
    */
  def temperatureSample(docs: DataFrame, stratumCol: String = "lang",
                        salt: String = "graft"): DataFrame = {
    val thr = format_string("%05x",
      floor(lit(65536) * (sqrt(col("_n").cast("double")) /
        sqrt(col("_nmax").cast("double")))).cast("bigint"))
    // `_nmax` windows over the V-row rate table, never the corpus; the
    // onePartitionKey marker makes the bounded single partition explicit
    // (no WindowExec partition warning)
    val rates = onePartitionKey(
      docs.groupBy(col(stratumCol)).agg(count(lit(1)).as("_n")))
      .withColumn("_nmax", max(col("_n")).over(Window.partitionBy(col("_p"))))
      .select(col(stratumCol), thr.as("_thr"))
    val bucket = substring(
      md5(concat(col("doc_id").cast("string"), lit(":" + salt))), 1, 4)
    docs.join(broadcast(rates), Seq(stratumCol))
      .withColumn("_bucket", bucket)
      .filter(concat(lit("0"), col("_bucket")) < col("_thr"))
      .select(col("doc_id"), col(stratumCol), col("_bucket").as("bucket_hex"))
  }

  /** Deterministic corpus shuffle (the training-order step after packing:
    * break source/time locality so consecutive training examples are not
    * corpus neighbors): round-robin shard assignment (`doc_id % N`
    * scatters id-adjacent documents across shards) plus a contiguous
    * position inside each shard obtained by ranking `md5(doc_id ':'
    * salt)` (doc_id breaks the astronomically-unlikely hash tie, and the
    * hash ORDER is what randomizes within-shard sequence). Re-running
    * reproduces the permutation; re-salting re-rolls it — the same
    * resumability contract as [[deterministicSplit]]. Hash-derived shard
    * ids were considered and rejected: hex-to-int spelling is
    * SQL-dialect-specific (the [[deterministicSplit]] trade), and
    * modulo on ids gives the same interleave with exact balance.
    *
    * Scale: one hash projection plus one window PER SHARD — shards rank
    * in parallel and the largest partition is corpus/numShards, so size
    * numShards to the cluster exactly as [[packSequences]] does. A single
    * global permutation (one total order) is deliberately not offered:
    * it would serialize the corpus through one reducer, and shard-local
    * order + shard-level interleave by the loader is the standard
    * contract.
    */
  def globalShuffle(docs: DataFrame, numShards: Int = 8,
                    salt: String = "graft"): DataFrame = {
    require(numShards > 0)
    val h = md5(concat(col("doc_id").cast("string"), lit(":" + salt)))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("_h").asc, col("doc_id").asc)
    docs
      .select(col("doc_id"), h.as("_h"),
        (col("doc_id") % numShards).cast("int").as("shard"))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  /** Explicit-weight dataset mixing (the Pile/Dolma-style "mixture table"
    * step, the complement of [[temperatureSample]]'s implicit ∝n^α rule):
    * given a target weight per stratum and a total document budget, keep
    * each stratum at rate `min(1, w_s · budget / n_s)` — the rate that
    * makes the SAMPLED corpus approach the target mixture, capped at 1
    * where a stratum is too small to fill its share (no upsampling; an
    * epoch-repeat factor is the loader's job, not the sampler's).
    *
    * Determinism contract (same as [[stratifiedSample]]/[[temperatureSample]]):
    * the rate is a chain of individually correctly-rounded IEEE-754 ops
    * (one multiply, one divide, `least`, one multiply, `floor`), so the
    * 5-hex-digit threshold is bit-identical cross-engine, and the keep
    * decision is a string compare of the salted md5 bucket against it.
    * Strata absent from `weights` get weight 0 and are dropped.
    *
    * Scale: one count aggregate over the corpus, a broadcast of the
    * stratum-row rate table back onto the scan, and a map-side filter —
    * the corpus never shuffles.
    */
  def mixtureSample(docs: DataFrame, weights: Map[String, Double],
                    budget: Long, stratumCol: String = "source",
                    salt: String = "graft"): DataFrame =
    mixtureByMeasure(docs, weights, budget, stratumCol, salt, count(lit(1)))

  /** [[mixtureSample]] at TOKEN granularity: the same
    * `min(1, w_s · budget / m_s)` rate equation with `m_s` the stratum's
    * total whitespace-token count and `budget` a TOKEN budget. A trainer
    * consumes tokens, not documents — under per-stratum length skew
    * (code vs chat, books vs tweets) a document-budget mixture misses
    * the token target by exactly the mean-length ratio. The keep
    * decision stays per-DOCUMENT (the atomic sampling unit); the sampled
    * stratum's expected token mass is rate · m_s.
    *
    * Determinism: the token count is an exact long over the same split
    * both engines tokenize with; the rate chain is [[mixtureSample]]'s
    * chain. Scale: identical shape — one count aggregate, a broadcast
    * rate table, a map-side filter; the corpus never shuffles.
    */
  def tokenMixtureSample(docs: DataFrame, weights: Map[String, Double],
                         tokenBudget: Long, stratumCol: String = "source",
                         salt: String = "graft"): DataFrame =
    mixtureByMeasure(docs, weights, tokenBudget, stratumCol, salt,
      sum(size(TextAnalysis.tokens(col("text")))))

  private def mixtureByMeasure(docs: DataFrame, weights: Map[String, Double],
                               budget: Long, stratumCol: String, salt: String,
                               measure: Column): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ >= 0) && budget > 0,
      s"need non-negative weights and budget > 0: $weights, $budget")
    val wcol = weights.foldLeft(lit(null).cast("double")) {
      case (acc, (s, w)) => when(col(stratumCol) === s, lit(w)).otherwise(acc)
    }
    // the null-weight filter must run BEFORE least(): both Spark's least
    // and SQL LEAST skip nulls, so an unlisted stratum would otherwise
    // silently resolve to rate 1.0 instead of being dropped
    val thr = format_string("%05x",
      floor(lit(65536) * least(lit(1.0),
        col("_w") * lit(budget.toDouble) / col("_n").cast("double")))
        .cast("bigint"))
    val rates = docs.groupBy(col(stratumCol)).agg(measure.as("_n"))
      .withColumn("_w", wcol)
      .filter(col("_w").isNotNull)
      .select(col(stratumCol), thr.as("_thr"))
    val bucket = substring(
      md5(concat(col("doc_id").cast("string"), lit(":" + salt))), 1, 4)
    docs.join(broadcast(rates), Seq(stratumCol))
      .withColumn("_bucket", bucket)
      .filter(concat(lit("0"), col("_bucket")) < col("_thr"))
      .select(col("doc_id"), col(stratumCol), col("_bucket").as("bucket_hex"))
  }

  /** Pairwise token-vocabulary Jaccard between strata (the dataset-overlap
    * matrix a mixture designer reads before setting [[mixtureSample]]
    * weights: two "different" sources sharing 0.9 of their vocabulary are
    * one source). Output: one row per unordered stratum pair that shares
    * at least one token — (stratum_a, stratum_b, n_a, n_b, n_inter,
    * jaccard), with a < b lexically and jaccard = |A∩B| / |A∪B| computed
    * as one division of exact longs (cross-engine deterministic).
    *
    * Scale: the distinct (stratum, token) set is bounded by
    * strata × vocabulary, not by corpus rows — the only corpus-sized step
    * is the dedup of exploded tokens, one 2-column shuffle. That set
    * feeds THREE consumers (per-stratum sizes, both sides of the pair
    * join), so it is materialized ONCE via `localCheckpoint` — the q86
    * lesson holds here verbatim: exchange reuse does not unify the
    * consumers, and the declarative form re-scanned and re-exploded the
    * corpus four times (measured; PlanSpec pins the zero-rescan shape).
    * The pair join is keyed by token; a token shared by k strata expands
    * to k² pair rows, so the join output is vocab × strata², far below
    * all-pairs of documents. Strata counts are assumed small (sources,
    * languages); this is a diagnostic over the catalog, not a
    * per-document operator.
    */
  def sourceOverlap(docs: DataFrame, stratumCol: String = "source"): DataFrame = {
    val st = docs
      .select(col(stratumCol).as("stratum"),
        explode(TextAnalysis.tokens(col("text"))).as("token"))
      .distinct()
      .localCheckpoint()
    val sizes = st.groupBy(col("stratum")).agg(count(lit(1)).as("_n"))
    val pairs = st.select(col("stratum").as("stratum_a"), col("token"))
      .join(st.select(col("stratum").as("stratum_b"), col("token")), Seq("token"))
      .filter(col("stratum_a") < col("stratum_b"))
      .groupBy(col("stratum_a"), col("stratum_b"))
      .agg(count(lit(1)).as("n_inter"))
    pairs
      .join(broadcast(sizes.select(col("stratum").as("stratum_a"),
        col("_n").as("n_a"))), Seq("stratum_a"))
      .join(broadcast(sizes.select(col("stratum").as("stratum_b"),
        col("_n").as("n_b"))), Seq("stratum_b"))
      .select(col("stratum_a"), col("stratum_b"), col("n_a"), col("n_b"),
        col("n_inter"),
        (col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter"))).as("jaccard"))
  }

  /** Sequence packing: assign each document a byte-free token offset and
    * a pack (training-batch) id of capacity `maxTokens`, the
    * concatenate-then-chunk layout pretraining loaders use (a document
    * whose span crosses a boundary belongs to the pack where it starts).
    *
    * Runs inside `numShards` hash shards: the running sum is a window
    * per shard ordered by doc_id, so shards pack in parallel and the
    * biggest partition is corpus/numShards — at scale, size numShards to
    * the cluster, not the data. Token count is the whitespace count of
    * [[TextAnalysis.tokenCounts]] (n_ws_tokens), kept identical so both
    * report the same totals.
    */
  def packSequences(docs: DataFrame, maxTokens: Int = 2048,
                    numShards: Int = 8): DataFrame = {
    require(maxTokens > 0 && numShards > 0)
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"),
        (col("doc_id") % numShards).cast("int").as("shard"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("start_offset", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("pack_id", expr(s"start_offset DIV $maxTokens"))
  }

  /** End-to-end corpus build — the production artifact a pretraining-data
    * user actually ships, chaining the five individually-certified stages
    * in their canonical order:
    *
    *   1. [[curate]] — C4/Gopher-style lang-id + quality + repetition
    *      gates (the q72 stage);
    *   2. near-dup removal — [[TextDedup.nearDupPairs]] →
    *      [[TextDedup.survivors]] over the CURATED set (the q81 stage:
    *      MinHash/LSH candidates, exact-Jaccard verify, connected
    *      components, loser anti-join);
    *   3. decontamination — the GPT-3-style exact-overlap rule: ANY
    *      distinct `contamN`-gram shared with the `benchmark` frame
    *      disqualifies the document (the q68/q79 membership algebra with
    *      the sides REVERSED: the keep decision is per TRAIN candidate,
    *      and the benchmark — small by definition — is the broadcast
    *      side, so the corpus never shuffles for this stage). `contamN`
    *      is deliberately WIDER than the dedup shingle width: short
    *      n-grams are shared vocabulary, not evidence of leakage — at
    *      sf0.1 the median doc shares 61% of its TRIgrams with the
    *      benchmark slice but only 4% of docs share any 5-gram. A doc
    *      shorter than `contamN` tokens has no n-grams and is trivially
    *      clean. The decision is an integer count = 0 — no float;
    *   4. token-budget mixture sampling — [[tokenMixtureSample]] (the
    *      q111 stage: per-source keep rates `min(1, w_s·budget/m_s)`
    *      decided on salted-md5 hex buckets);
    *   5. [[packSequences]] — concatenate-then-chunk offsets and pack
    *      ids inside hash shards (the q67 stage).
    *
    * Every stage keeps its own certified scale posture (curate: two
    * corpus scans; dedup: Σdf² banded candidates; decontaminate:
    * broadcast benchmark keys + map-side probe; mixture: broadcast rate
    * table + map-side filter; pack: shard-local windows), and the
    * stage interfaces are doc_id semi-joins — only 8-byte keys shuffle
    * between stages. The value of registering the CHAIN as one query is
    * interface-drift detection: the per-stage oracles cannot see a
    * survivor set wired to the wrong input or a rate table computed over
    * the wrong denominator population (the mixture rates here MUST be
    * computed over the decontaminated survivors, not the raw corpus —
    * exactly the class of bug a composed oracle pins).
    */
  def corpusBuild(docs: DataFrame, benchmark: DataFrame,
                  weights: Map[String, Double], tokenBudget: Long,
                  dedupThreshold: Double = 0.5, contamN: Int = 5,
                  maxTokens: Int = 2048, numShards: Int = 8): DataFrame = {
    sampleAndPack(corpusBuildClean(docs, benchmark, dedupThreshold, contamN),
      weights, tokenBudget, maxTokens, numShards)
  }

  /** Stages 4–5 of [[corpusBuild]] over an already-CLEAN population: the
    * mixture rates MUST be computed over the decontaminated survivors —
    * `clean` is both the rate denominator population and the probe side
    * (the exact interface the composed q220 oracle and TextSpec's wiring
    * test pin). One spelling shared by [[corpusBuild]] and the streaming
    * assembly ([[graft.streaming.CorpusStream.corpusBuildFromIngest]])
    * so the two entry points cannot drift.
    */
  private[graft] def sampleAndPack(clean: DataFrame,
                                   weights: Map[String, Double],
                                   tokenBudget: Long, maxTokens: Int,
                                   numShards: Int): DataFrame = {
    val sampledIds = tokenMixtureSample(clean, weights, tokenBudget)
      .select(col("doc_id"))
    packSequences(clean.join(sampledIds, Seq("doc_id"), "left_semi"),
      maxTokens, numShards)
  }

  /** Stages 1–3 of [[corpusBuild]] — curate, near-dup removal,
    * decontamination — returning the CLEAN survivor frame every
    * downstream rate must be computed over. Split out (round 19) because
    * two consumers need exactly this population: [[corpusBuild]] (which
    * samples and packs it) and the streaming ingest twin's replay-parity
    * contract ([[graft.streaming.CorpusStream.corpusBuildIngestQuery]]),
    * which must converge to this batch set under any batch chop.
    */
  def corpusBuildClean(docs: DataFrame, benchmark: DataFrame,
                       dedupThreshold: Double = 0.5,
                       contamN: Int = 5): DataFrame = {
    // Curate and dedup shingle at the family-wide width 3 (curate's
    // default and the ONLY width nearDupPairs speaks — a configurable
    // dedup n here would be a lie, the round-18 review finding);
    // contamN parameterizes just the decontamination stage.
    require(contamN >= 3,
      "corpusBuild: contamN must be >= the dedup shingle width 3 (short " +
        s"n-grams are shared vocabulary, not leakage), got $contamN")
    // Stage outputs are consumed 2-3× each downstream (deduped by the
    // decontamination probe AND the anti-join; clean by the mixture's
    // rate aggregate, its probe side, and the pack input), so each is
    // materialized ONCE — the q86/sourceOverlap lesson: exchange reuse
    // does not unify consumers, and without the checkpoints the
    // two-scan curate pipeline re-executes per consumer.
    val curated = docs.join(
      curate(docs).select(col("doc_id")), Seq("doc_id"), "left_semi")
      .localCheckpoint()
    val deduped = TextDedup.survivors(curated,
      TextDedup.nearDupPairs(curated, dedupThreshold))
      .localCheckpoint()
    val dirtyIds = contaminatedIds(deduped, benchmarkKeys(benchmark, contamN),
      contamN)
    deduped.join(dirtyIds, Seq("doc_id"), "left_anti")
      .localCheckpoint()
  }

  /** Distinct hashed `contamN`-gram keys of the benchmark frame — the
    * FROZEN broadcast side of the decontamination probe (tiny by
    * definition: eval sets are bounded by hand-curation, so the corpus
    * never shuffles for this stage). Benchmark membership rides the
    * 8-byte hashed-shingle identity (the q79 re-key).
    */
  def benchmarkKeys(benchmark: DataFrame, contamN: Int = 5): DataFrame =
    hashedShingles(benchmark, contamN).select(col("_h")).distinct()

  /** Ids of `docs` sharing at least one distinct `contamN`-gram with
    * `benchKeys` — the GPT-3-style exact-overlap disqualification rule;
    * the decision is an integer count = 0, no float. One map-side
    * broadcast semi-join over the docs' hashed shingles; only the tiny
    * contaminated-id set is ever aggregated or anti-joined. Per-doc
    * independent given the frozen keys, which is what lets the
    * streaming ingest apply it batch-by-batch with no chop sensitivity.
    */
  def contaminatedIds(docs: DataFrame, benchKeys: DataFrame,
                      contamN: Int = 5): DataFrame =
    hashedShingles(docs, contamN)
      .join(broadcast(benchKeys), Seq("_h"), "left_semi")
      .select(col("doc_id")).distinct()

  /** Directed n-gram containment pairs — `|A ∩ B| / |A| ≥ tauNum/tauDen`
    * over distinct word n-gram sets. The ASYMMETRIC cousin of the Jaccard
    * dedup family (Broder's containment, the quote/mirror/wrapper
    * detector): a short document fully quoted inside a long one has
    * containment 1.0 but Jaccard ≈ |A|/|B|, so MinHash resemblance never
    * flags it (TextSpec pins exactly such a pair: contained, flagged
    * here, invisible to the q30 threshold).
    *
    * Exactness contract: the threshold is the integer cross-multiply
    * `n_inter · tauDen ≥ tauNum · n_a` — no float touches the decision,
    * so the output is hash-exact against a string-shingle oracle (hashes
    * are engine-internal identity, the q109↔q85 relation; a 64-bit
    * collision altering a count has probability ~(distinct shingles)²/2⁶⁵,
    * immaterial below ~10¹² shingles).
    *
    * Scale: candidate generation is the inverted shingle index
    * (Σ_shingle df² pairs, never corpus n²). `maxDf` drops shingles
    * hotter than the bound from candidate generation AND from `n_a`
    * (both sides of the ratio, so a pure-boilerplate quote does not
    * dilute scores) — the stop-hash trade, off by default so the default
    * output is exact set semantics.
    */
  def containmentPairs(docs: DataFrame, n: Int = 3,
                       tauNum: Int = 4, tauDen: Int = 5,
                       maxDf: Int = Int.MaxValue): DataFrame = {
    require(tauNum > 0 && tauDen >= tauNum,
      s"containmentPairs: need 0 < tauNum <= tauDen, got $tauNum/$tauDen")
    val all = hashedShingles(docs, n)
    val pruned =
      if (maxDf == Int.MaxValue) all
      else {
        val hot = all.groupBy(col("_h")).agg(count(lit(1)).as("_df"))
          .filter(col("_df") > maxDf).select(col("_h"))
        all.join(broadcast(hot), Seq("_h"), "left_anti")
      }
    // THREE consumers read the shingle frame (sizes, both join sides) —
    // materialize it once (the audioNearDup/dedupClusters sharing
    // discipline) instead of paying the tokenize+hash byte walk three
    // times. At toy SF the query is per-stage-constant-bound (measured
    // round 13: 3.2 → 3.0 s at sf0.1, where candidates are only 2.8M
    // pairs), but at 100 TB three corpus-wide text walks are real I/O —
    // the materialization is the same move the oracle's CTE makes.
    //
    // The frame is REPARTITIONED BY `_h` before materializing: (a) the
    // pair generator is a self-join on `_h`, so hash-partitioning the
    // checkpoint means BOTH join sides arrive co-partitioned — one
    // shuffle of the shingle frame total instead of two post-checkpoint
    // exchanges of the same rows; (b) a small corpus (one parquet row
    // group — the sf0.1 file is a single 600 KB split) would otherwise
    // carry its ONE input partition through the checkpoint, and the
    // 2.8M-pair probe + partial aggregate would run on one core of 32
    // (measured: 2.9 s → parallel after the spread). Width = the
    // session's parallelism floor so toy inputs fan out; at scale
    // shuffle.partitions governs, as for every keyed shuffle here.
    val par = docs.sparkSession.sparkContext.defaultParallelism
      .max(docs.sparkSession.sessionState.conf.numShufflePartitions)
    val sh = pruned.repartition(par, col("_h")).localCheckpoint()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_a"))
    sh.as("a")
      .join(sh.as("b"), col("a._h") === col("b._h") &&
        col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
      .join(sizes.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"))
      .filter(col("n_inter") * tauDen >= col("n_a") * tauNum)
      .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_inter"))
  }

  /** The [[containmentPairs]] inverted index as AT-REST state: distinct
    * `(doc_id, _h)` shingle pairs as a catalog table bucketed (and
    * file-sorted) on `_h` — the [[writeShingleTable]] posture applied to
    * the PAIR table the containment scan self-joins. With the rows at
    * rest in `_h` buckets, [[containmentOverTable]]'s candidate join
    * reads BOTH sides in place (zero Exchange on either join input,
    * PlanSpec-pinned); the only shuffle left is the semantically
    * required pair aggregate. This is the 100 TB boilerplate-scan
    * layout: the corpus shingles once at ingest, and every containment
    * sweep after that starts from the bucket files instead of re-paying
    * the corpus-wide text walk plus the self-join exchange. Rebuild (or
    * re-ingest through [[writeShinglePairTable]]) when the corpus
    * changes; shingle width and bucket count ride the catalog.
    */
  def writeShinglePairTable(docs: DataFrame, table: String, n: Int = 3,
                            nBuckets: Int = 8): Unit = {
    val spark = docs.sparkSession
    graft.sources.Tables.clearOrphanedWarehouseDir(spark, table)
    hashedShingles(docs, n) // distinct per doc by construction
      .write.mode("overwrite")
      .bucketBy(nBuckets, "_h").sortBy("_h")
      .format("parquet").saveAsTable(table)
    graft.sources.Tables.setTableMetaInts(spark, table, "graft.shinglepair",
      "n" -> n, "nbuckets" -> nBuckets)
  }

  /** Overlap-safe ingest into the bucketed pair table: a doc-level
    * anti-join against the table's own doc_ids is the replay guard
    * (re-sent batches append nothing — the [[appendShingleTable]]
    * contract at doc granularity, since the pair table's unit of ingest
    * is a document, not a hash). The fresh rows append THROUGH the
    * catalog with the table's bucket spec, so
    * [[containmentOverTable]]'s exchange-free candidate join survives
    * every append; files accumulate per bucket — rebuild via
    * [[writeShinglePairTable]] when file counts matter. The guard scan
    * reads the table's doc_id column only (column pruning), the
    * documented cost of the bucketed layout's append side.
    */
  def appendShinglePairTable(spark: org.apache.spark.sql.SparkSession,
                             table: String, delta: DataFrame): Unit = {
    val Seq(n, nBuckets) = graft.sources.Tables.tableMetaInts(spark, table,
      "graft.shinglepair", Seq("n", "nbuckets"),
      "Corpus.writeShinglePairTable")
    val fresh = delta.join(
      spark.table(table).select(col("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
    hashedShingles(fresh, n)
      .write.mode("append")
      .bucketBy(nBuckets, "_h").sortBy("_h")
      .format("parquet").saveAsTable(table)
  }

  /** Directed containment over the at-rest pair table — the exact
    * [[containmentPairs]] algebra (integer cross-multiply threshold,
    * identical output) with candidate generation exchange-free on both
    * sides of the self-join. Fails loudly on a table not built by
    * [[writeShinglePairTable]].
    */
  def containmentOverTable(spark: org.apache.spark.sql.SparkSession,
                           table: String,
                           tauNum: Int = 4, tauDen: Int = 5): DataFrame = {
    require(tauNum > 0 && tauDen >= tauNum,
      s"containmentOverTable: need 0 < tauNum <= tauDen, got $tauNum/$tauDen")
    graft.sources.Tables.tableMetaInts(spark, table, "graft.shinglepair",
      Seq("n", "nbuckets"), "Corpus.writeShinglePairTable")
    val sh = spark.table(table)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_a"))
    sh.as("a")
      .join(sh.as("b"), col("a._h") === col("b._h") &&
        col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
      .join(sizes.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"))
      .filter(col("n_inter") * tauDen >= col("n_a") * tauNum)
      .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_inter"))
  }

  /** Per-document n-gram novelty: of a document's distinct word n-grams,
    * how many appear in NO earlier document (doc_id order = ingest
    * order)? The marginal-contribution score data curation ranks by —
    * a mirror site re-crawled late scores ~0 novel even when no single
    * pair crosses a dedup threshold. Exact integers end to end: distinct
    * (doc, shingle) pairs → min doc_id per shingle (one shingle-keyed
    * aggregate, vocab-of-shingles sized) → joined back and counted. Two
    * keyed shuffles, no corpus self-join — cheaper than any pair
    * generator, which is the point: novelty is the dedup SIGNAL you can
    * afford on every ingest batch.
    */
  def ngramNovelty(docs: DataFrame, n: Int = 3): DataFrame = {
    val sh = hashedShingles(docs, n)
    val firstSeen = sh.groupBy(col("_h")).agg(min(col("doc_id")).as("_first"))
    sh.join(firstSeen, Seq("_h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("_first") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
  }

  /** Sidecar carrying a shingle index's build width `n` — the
    * [[graft.ops.FuzzyJoin]] `_FUZZY_META` discipline: probes and appends
    * read THIS, so a 3-gram index can never silently answer a 5-gram
    * probe (the widths produce disjoint hash universes and novelty would
    * read 100%).
    */
  private val ShingleMetaFile = "_SHINGLE_META"
  // Forgotten-doc_id replay ledger for the refcounted shingle index —
  // the `_` prefix hides it from the index's own parquet listing.
  private val ForgottenDocsDir = "_FORGOTTEN_DOCS"

  /** The sixth member of the delta-vs-index family (text q83, vectors
    * q93, frames q132, audio q133, names q144 — now shingle NOVELTY):
    * the persisted set of every distinct shingle hash the corpus has
    * ever contained. [[noveltyAgainstIndex]] scores an ingest batch
    * against it WITHOUT the corpus rescan [[ngramNovelty]] pays, and
    * [[appendShingleIndex]] is overlap-safe by construction (an
    * anti-join admits only genuinely new hashes, so replaying a batch
    * appends nothing — the replay guard and the append are the same
    * join). 100 TB posture: the per-batch probe is one hash-keyed join
    * of batch shingles against the index — pin the index as a bucketed
    * catalog table (the S8 path) to make that join exchange-free on the
    * index side, or swap in the q87 bloom-filter state when one-sided
    * error is acceptable (novelty UNDERcounts by the false-positive
    * rate, never overcounts).
    */
  def writeShingleIndex(docs: DataFrame, dir: String, n: Int = 3): Unit = {
    val spark = docs.sparkSession
    hashedShingles(docs, n).select(col("_h")).distinct()
      .write.mode("overwrite").parquet(dir)
    writeShingleMeta(spark, dir, n)
  }

  private def shingleIndexN(spark: org.apache.spark.sql.SparkSession,
                            dir: String): Int = {
    val p = new org.apache.hadoop.fs.Path(dir, ShingleMetaFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"shingle index at $dir lacks $ShingleMetaFile — rebuild it with " +
        "Corpus.writeShingleIndex (round-12 format)")
    val in = fs.open(p)
    try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
      "UTF-8").trim.toInt
    finally in.close()
  }

  /** Append a batch's genuinely-new shingle hashes; re-sent batches
    * append nothing (the anti-join IS the replay guard).
    */
  def appendShingleIndex(spark: org.apache.spark.sql.SparkSession,
                         dir: String, delta: DataFrame): Unit = {
    val n = shingleIndexN(spark, dir)
    hashedShingles(delta, n).select(col("_h")).distinct()
      .join(spark.read.parquet(dir), Seq("_h"), "left_anti")
      .write.mode("append").parquet(dir)
  }

  /** Per-doc novelty of an ingest batch against the at-rest index:
    * (doc_id, n_shingles, n_novel) where novel = absent from the index.
    * Shingle width comes from the sidecar, never a guess.
    */
  def noveltyAgainstIndex(spark: org.apache.spark.sql.SparkSession,
                          dir: String, delta: DataFrame): DataFrame = {
    val n = shingleIndexN(spark, dir)
    val idx = spark.read.parquet(dir).withColumn("_seen", lit(1))
    hashedShingles(delta, n)
      .join(idx, Seq("_h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("_seen").isNull, 1L).otherwise(0L)).as("n_novel"))
  }

  /** The shingle index as a catalog table BUCKETED AND SORTED BY `_h` —
    * the exchange-free probe posture (q88/S8, the
    * [[graft.ops.FuzzyJoin.writeVariantTable]] layout applied to the
    * novelty family). [[noveltyAgainstIndex]]'s probe join re-shuffles
    * the at-rest hash set on `_h` every batch (the index side of a
    * too-big-to-broadcast join); with `_h` buckets the index is read in
    * place and only the batch's own shingles shuffle — and the APPEND's
    * anti-join rides the same bucket alignment, so BOTH consumers of
    * this layout are index-exchange-free (unlike the fuzzy family,
    * where path partitioning and bucketing serve different consumers).
    * Shingle width and bucket count ride the catalog as table
    * properties — the `_SHINGLE_META` sidecar in catalog terms; probes
    * never guess and never aggregate index rows for metadata.
    */
  def writeShingleTable(docs: DataFrame, table: String, n: Int = 3,
                        nBuckets: Int = 8): Unit = {
    val spark = docs.sparkSession
    graft.sources.Tables.clearOrphanedWarehouseDir(spark, table)
    hashedShingles(docs, n).select(col("_h")).distinct()
      .write.mode("overwrite")
      .bucketBy(nBuckets, "_h").sortBy("_h")
      .format("parquet").saveAsTable(table)
    graft.sources.Tables.setTableMetaInts(spark, table, "graft.shingle",
      "n" -> n, "nbuckets" -> nBuckets)
  }

  /** (shingle width n, bucket count) of a shingle TABLE from its catalog
    * properties ([[graft.sources.Tables.tableMetaInts]]); fails loudly
    * on tables not built by [[writeShingleTable]].
    */
  def shingleTableMeta(spark: org.apache.spark.sql.SparkSession,
                       table: String): (Int, Int) = {
    val Seq(n, nb) = graft.sources.Tables.tableMetaInts(spark, table,
      "graft.shingle", Seq("n", "nbuckets"), "Corpus.writeShingleTable")
    (n, nb)
  }

  /** Overlap-safe append to the bucketed shingle table — the
    * [[appendShingleIndex]] contract (the anti-join IS the replay
    * guard; re-sent batches append nothing) with the anti-join itself
    * bucket-aligned on the index side. Appends write THROUGH the
    * catalog with the table's own bucket spec, so the exchange-free
    * probe survives every append (files accumulate per bucket; rebuild
    * via [[writeShingleTable]] when file counts matter).
    */
  def appendShingleTable(spark: org.apache.spark.sql.SparkSession,
                         table: String, delta: DataFrame): Unit = {
    val (n, nBuckets) = shingleTableMeta(spark, table)
    hashedShingles(delta, n).select(col("_h")).distinct()
      .join(spark.table(table), Seq("_h"), "left_anti")
      .write.mode("append")
      .bucketBy(nBuckets, "_h").sortBy("_h")
      .format("parquet").saveAsTable(table)
  }

  // ---- Refcounted (forgettable) shingle index ----------------------------
  //
  // The hash-set index ([[writeShingleIndex]]) is append-only: a hash,
  // once admitted, can never leave, because the set does not know how
  // many remaining documents still contain it. Takedowns (opt-outs,
  // DMCA, GDPR erasure) need the DELETE half, so this variant stores
  // (hash, refcount) as a LOG-STRUCTURED ledger (the CorpusStream label
  // -store discipline): appends add positive per-hash doc counts,
  // [[forgetShingles]] appends NEGATIVE ones, the current state is the
  // per-hash SUM with non-positive rows gone, and
  // [[compactShingleIndexRc]] bounds the log. Forgetting a document's
  // shingles decrements exactly what ingesting it added, so
  // forget ∘ append ≡ never-ingested BIT-EXACTLY (spec-pinned, and
  // q198's oracle rebuilds the corpus-minus-forgotten state in SQL).
  // Ingest contract: each document is appended exactly ONCE (the frame
  // -index contract) — refcounts merge additively, so the APPEND side
  // has no anti-join replay guard; wrap appends in a replay-guarded
  // stream when the source is at-least-once. The FORGET side is guarded
  // here: takedown queues are at-least-once by nature, and a replayed
  // decrement would silently drive shared hashes toward zero (the
  // `n_docs > 0` read filter hides the residue). [[forgetShingles]]
  // keeps a forgotten-doc_id ledger (`_FORGOTTEN_DOCS` sidecar, hidden
  // from the parquet listing) and drops already-forgotten ids before
  // decrementing — the [[graft.streaming.CorpusStream.forgetDocs]]
  // pattern. Compaction clears the sidecar along with the tomb rows
  // (the erasure is already physical here), so the exact replay guard
  // covers takedowns replayed BEFORE the next compaction; a replay
  // arriving after fails LOUD at the following compaction's
  // negative-fold check instead of vanishing silently.

  /** Build the refcounted index: rows `(_h, n_docs)` — how many ingested
    * docs contain each distinct hash — plus the same `_SHINGLE_META`
    * width sidecar as the set form.
    */
  def writeShingleIndexRc(docs: DataFrame, dir: String, n: Int = 3): Unit = {
    val spark = docs.sparkSession
    hashedShingles(docs, n).groupBy(col("_h"))
      .agg(count(lit(1)).as("n_docs"))
      .write.mode("overwrite").parquet(dir)
    writeShingleMeta(spark, dir, n)
  }

  /** Append a (never-before-ingested) batch's per-hash doc counts. */
  def appendShingleIndexRc(spark: org.apache.spark.sql.SparkSession,
                           dir: String, delta: DataFrame): Unit =
    hashedShingles(delta, shingleIndexN(spark, dir)).groupBy(col("_h"))
      .agg(count(lit(1)).as("n_docs"))
      .write.mode("append").parquet(dir)

  /** Forget previously-ingested documents: append the NEGATIVE of what
    * ingesting them added. The caller passes the documents' TEXTS (the
    * corpus store still holds them at takedown time) — the decrement
    * must shingle exactly what the ingest shingled.
    *
    * Replay-guarded: doc_ids already in the `_FORGOTTEN_DOCS` sidecar
    * ledger are dropped before decrementing, so an at-least-once
    * takedown queue can re-deliver freely between compactions. Order is
    * decrement-then-ledger: a crash in the window makes the RETRY
    * double-decrement (detected at the next compaction's negative-fold
    * check), whereas ledger-first would make the retry a silent no-op
    * and leak the doc's shingles forever.
    */
  def forgetShingles(spark: org.apache.spark.sql.SparkSession,
                     dir: String, docs: DataFrame): Unit = {
    val n = shingleIndexN(spark, dir)
    val ledger = s"$dir/$ForgottenDocsDir"
    val fresh = (if (graft.sources.Tables.pathExists(spark, ledger))
        docs.join(spark.read.parquet(ledger), Seq("doc_id"), "left_anti")
      else docs).localCheckpoint() // pin BEFORE the writes below mutate
                                   // the very ledger the anti-join reads
    if (!fresh.isEmpty) {
      hashedShingles(fresh, n).groupBy(col("_h"))
        .agg((-count(lit(1))).as("n_docs"))
        .write.mode("append").parquet(dir)
      fresh.select(col("doc_id")).distinct()
        .write.mode("append").parquet(ledger)
    }
  }

  /** The current hash set with live refcounts: per-hash ledger sum,
    * non-positive rows gone. Every consumer reads THIS view — raw
    * ledger rows are not a set (duplicate `_h`, negatives).
    */
  def readShingleIndexRc(spark: org.apache.spark.sql.SparkSession,
                         dir: String): DataFrame =
    spark.read.parquet(dir).groupBy(col("_h"))
      .agg(sum(col("n_docs")).as("n_docs"))
      .filter(col("n_docs") > 0)

  /** Fold the ledger to one row per live hash (forgetting leaves tomb
    * rows behind; compaction bounds reads). View-equivalence and
    * re-appendability spec-pinned.
    *
    * Fails LOUD if any hash folds NEGATIVE: a negative sum means a
    * decrement with no matching ingest — a takedown applied twice
    * (post-compaction replay that slipped the ledger) or a forget of a
    * never-ingested document. The `n_docs > 0` read filter would hide
    * the residue forever; the maintenance boundary is where it must
    * surface. The overwrite also clears the `_FORGOTTEN_DOCS` replay
    * ledger — the tomb rows it guarded are physically gone.
    */
  def compactShingleIndexRc(spark: org.apache.spark.sql.SparkSession,
                            dir: String): Unit = {
    val n = shingleIndexN(spark, dir)
    val raw = spark.read.parquet(dir).groupBy(col("_h"))
      .agg(sum(col("n_docs")).as("n_docs"))
      .localCheckpoint()
    val negatives = raw.filter(col("n_docs") < 0).count()
    require(negatives == 0L,
      s"compactShingleIndexRc: $negatives hashes in $dir fold negative — " +
        "a takedown was applied twice or a never-ingested document was " +
        "forgotten; the index no longer equals any ingest history. " +
        "Rebuild from the corpus store (writeShingleIndexRc).")
    raw.filter(col("n_docs") > 0).write.mode("overwrite").parquet(dir)
    writeShingleMeta(spark, dir, n) // overwrite clears the sidecar
  }

  /** [[noveltyAgainstIndex]] over the refcounted index's CURRENT view —
    * a forgotten document's unique shingles read as novel again, which
    * is exactly the takedown semantics (the corpus genuinely no longer
    * contains them).
    */
  def noveltyAgainstRcIndex(spark: org.apache.spark.sql.SparkSession,
                            dir: String, delta: DataFrame): DataFrame = {
    val n = shingleIndexN(spark, dir)
    val idx = readShingleIndexRc(spark, dir)
      .select(col("_h"), lit(1).as("_seen"))
    hashedShingles(delta, n)
      .join(idx, Seq("_h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("_seen").isNull, 1L).otherwise(0L)).as("n_novel"))
  }

  private def writeShingleMeta(spark: org.apache.spark.sql.SparkSession,
                               dir: String, n: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, ShingleMetaFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s"$n\n".getBytes("UTF-8")) finally out.close()
  }

  /** [[noveltyAgainstIndex]] against the bucketed catalog table: same
    * output contract, but the index side of the probe join reads its
    * buckets in place — ZERO Exchange on the at-rest hash set
    * (PlanSpec-pinned); the one shuffle is the batch's own shingles.
    */
  def noveltyAgainstTable(spark: org.apache.spark.sql.SparkSession,
                          table: String, delta: DataFrame): DataFrame = {
    val (n, _) = shingleTableMeta(spark, table)
    val idx = spark.table(table).withColumn("_seen", lit(1))
    hashedShingles(delta, n)
      .join(idx, Seq("_h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("_seen").isNull, 1L).otherwise(0L)).as("n_novel"))
  }

  /** Percentile-rank normalization within strata: `pr = (rank−1)/(n−1)`
    * (the `percent_rank` identity, ties sharing a rank) — maps a raw
    * score onto [0,1] per stratum so thresholds compare across languages
    * or sources of very different scale. The division is one
    * correctly-rounded IEEE op on two integers, so the output is
    * hash-exact cross-engine with no margin caveat. Single-member strata
    * yield 0.0 (both engines' percent_rank convention). Scale: one
    * window per stratum — partitions are stratum-sized; for corpus-scale
    * strata prefer [[winsorize]]'s broadcast-bounds shape or bucket the
    * window key.
    */
  def percentileRank(docs: DataFrame, valueCol: String = "n_chars",
                     strataCol: String = "lang"): DataFrame =
    docs.select(col("doc_id"), col(strataCol), col(valueCol))
      .withColumn("pr", percent_rank().over(
        Window.partitionBy(col(strataCol)).orderBy(col(valueCol))))

  /** k-anonymity release gate: keep only rows whose quasi-identifier
    * combination (`keyCols`) is shared by at least `k` rows — the
    * group-size privacy floor a corpus export applies AFTER
    * [[graft.text.TextAnalysis.redact]] scrubs direct identifiers (a
    * unique (lang, source, day) combo re-identifies even with the text
    * clean). Pure integer decision, hash-exact. Scale: one count
    * aggregate keyed by the quasi-identifier (combos-sized output)
    * broadcast back as a semi-join — the corpus itself never shuffles;
    * for high-cardinality combos Catalyst/AQE falls back to a keyed
    * join, still one shuffle each side.
    */
  def kAnonymityFilter(docs: DataFrame, keyCols: Seq[String],
                       k: Int): DataFrame = {
    require(keyCols.nonEmpty && k >= 1,
      s"kAnonymityFilter: need keys and k >= 1, got $keyCols / $k")
    val big = docs.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= k)
      .select(keyCols.map(col): _*)
    docs.join(broadcast(big), keyCols, "left_semi")
  }

  /** Weighted sampling WITHOUT replacement, k winners, inclusion
    * probability ∝ `weightCol` — Efraimidis–Spirakis (2006, public):
    * each row draws `u ∈ (0,1)` and keys by `u^(1/w)`; the k largest keys
    * are exactly a weighted sample without replacement. One pass, no
    * rejection loop, no sequential state — THE distributed weighted
    * sampler (the classic alternatives either sample WITH replacement or
    * need a serial pass over cumulative weights).
    *
    * Determinism: `u` is the first 12 hex digits of the salted md5 over
    * doc_id (the [[deterministicSplit]] coin), divided by 2⁴⁸ — exact in
    * both engines (power-of-two division). The key's `pow` is NOT
    * correctly-rounded cross-engine (the [[temperatureSample]] caveat),
    * but here it only ORDERS rows: selection flips only if the k-th and
    * (k+1)-th keys sit within cross-engine ulp noise, and LangModelSpec's
    * sampler leg measures that boundary gap and pins it ≥ 1e-9 — eleven
    * orders above 1-ulp at these magnitudes. Ties (impossible for
    * distinct doc_ids, but cheap) break by doc_id.
    *
    * Scale: one projection plus a global top-k — TakeOrderedAndProject,
    * the per-partition-heap-then-merge physical op, never a global sort.
    */
  def weightedSample(docs: DataFrame, weightCol: String = "n_chars",
                     k: Int = 100, salt: String = "graft"): DataFrame = {
    require(k > 0, s"weightedSample: k must be positive, got $k")
    val u = conv(substring(
      md5(concat(col("doc_id").cast("string"), lit(":" + salt))), 1, 12),
      16, 10).cast("double") / lit(math.pow(2, 48))
    docs
      .withColumn("_es_key", pow(u, lit(1.0) / col(weightCol).cast("double")))
      .orderBy(col("_es_key").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("lang"), col("source"), col(weightCol))
  }

  /** Winsorize a numeric column within strata: clamp to the stratum's
    * [lo, hi] interpolated percentiles — the outlier-robust normalization
    * step before length/quality features feed a learned gate (one
    * 100k-char document otherwise owns the scale of its whole stratum).
    * Percentile parity with DuckDB's `quantile_cont` is already pinned by
    * q130; the clamp is `least/greatest` on two doubles — deterministic
    * expressions, no sums, so the full output is hash-exact. Scale: one
    * per-stratum aggregate (strata-sized output, broadcast back) plus a
    * map-side clamp — the corpus never shuffles.
    */
  def winsorize(docs: DataFrame, valueCol: String = "n_chars",
                strataCol: String = "lang", lo: Double = 0.05,
                hi: Double = 0.95): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi,
      s"winsorize: need 0 <= lo < hi <= 1, got $lo/$hi")
    val bounds = docs.groupBy(col(strataCol)).agg(
      expr(s"percentile($valueCol, $lo)").as("p_lo"),
      expr(s"percentile($valueCol, $hi)").as("p_hi"))
    docs.join(broadcast(bounds), Seq(strataCol))
      .select(col("doc_id"), col(strataCol), col(valueCol),
        col("p_lo"), col("p_hi"),
        least(greatest(col(valueCol).cast("double"), col("p_lo")),
          col("p_hi")).as("clamped"))
  }
}
