package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: fuse a dense (embedding-cosine) ranking with a sparse
  * (keyword-overlap) ranking by Reciprocal Rank Fusion —
  * `rrf(d) = Σ_r 1/(k₀ + rank_r(d))` (Cormack et al. 2009, public; k₀=60
  * is the paper's constant). RRF is the standard fusion for exactly this
  * engine's situation: the two scores live on incomparable scales
  * (cosine ∈ [-1,1], overlap ∈ ℕ), and rank-space fusion needs no score
  * normalization, no training, and no tuning beyond k₀.
  *
  * Determinism contract: both input ranks are integers from
  * deterministically tie-broken orderings (cosine parity with DuckDB is
  * pinned by q37's hash-exact history; overlap is an integer count), and
  * `1/(k₀+rank)` is a correctly-rounded IEEE division of integers — so
  * the fused score is ONE addition of two bit-identical doubles,
  * bit-exact cross-engine with no measured-margin caveat needed (unlike
  * the ppl/E-S float decisions, there is no accumulated sum here).
  *
  * Scale posture: [[hybridRrfTopK]] is the EXACT form — probes broadcast
  * onto the corpus for both modalities, the corpus never self-joins, and
  * all three rankings are windows partitioned by probe (per-probe
  * parallel). Its grid is corpus × nProbes, the brute-force regime
  * (q37's). At 100 TB the production form is [[rrfFuse]]: run each
  * retriever's own scale path (IVF top-N for dense, an inverted-index
  * top-N for sparse), then fuse just the retrieved lists — RRF over the
  * UNION of top-Ns, absent-from-one-list docs simply contributing one
  * term, which is how the paper defines it. RetrievalSpec pins that the
  * fused head agrees with the exact grid once N covers it.
  */
object Retrieval {

  /** Distinct (doc_id, token) pairs — the sparse side's unit.
    * Deduplicated PER DOCUMENT with `array_distinct` BEFORE the explode:
    * (doc_id, token) uniqueness only needs within-document dedup, so the
    * global `.distinct()` this replaces (round 20) was a corpus-scale
    * Exchange + aggregate pair spent re-checking uniqueness across
    * documents that can never collide — the guide §2.4 "distinct on
    * data that is already unique" accidental shuffle. Row-identical
    * output, zero shuffle.
    */
  private def docTokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(array_distinct(graft.text.TextAnalysis.tokens(col("text"))))
        .as("token"))

  /** (probe_id, doc_id, kw_overlap) for every pair sharing ≥ 1 token —
    * the ONE definition of the sparse modality's candidate generation
    * (probe tokens broadcast, corpus touched only via the token
    * equi-join), shared by the exact grid and the production top-N
    * retriever so tokenization/self-exclusion can never diverge them.
    */
  private def overlapCounts(docs: DataFrame, nProbes: Int): DataFrame = {
    val toks = docTokens(docs)
    val probeToks = toks.filter(col("doc_id") < nProbes)
      .select(col("doc_id").as("probe_id"), col("token"))
    toks.join(broadcast(probeToks), Seq("token"))
      .filter(col("doc_id") =!= col("probe_id"))
      .groupBy(col("probe_id"), col("doc_id"))
      .agg(count(lit(1)).as("kw_overlap"))
  }

  /** Exact hybrid top-k: every candidate ranked by BOTH modalities, then
    * RRF-fused. `emb` supplies the dense side keyed by vec_id; `docs` the
    * sparse side keyed by doc_id; the corpus identity is vec_id = doc_id
    * (the aligned-tables contract). Probes are the ids below `nProbes`,
    * playing both roles (their vector, their token set).
    */
  def hybridRrfTopK(emb: DataFrame, docs: DataFrame, nProbes: Int = 3,
                    k: Int = 10, rrfK: Int = 60): DataFrame = {
    val cand = emb.select(col("vec_id").as("doc_id"),
      col("embedding").as("n_emb"))
    val probes = emb.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"))
    val overlap = overlapCounts(docs, nProbes)
    val grid = cand
      .join(broadcast(probes), col("doc_id") =!= col("probe_id"))
      .withColumn("cosine", Similarity.cosine(col("p_emb"), col("n_emb")))
      .join(overlap, Seq("probe_id", "doc_id"), "left")
      .withColumn("kw_overlap", coalesce(col("kw_overlap"), lit(0L)))
    val byProbe = Window.partitionBy(col("probe_id"))
    val rv = row_number().over(
      byProbe.orderBy(col("cosine").desc, col("doc_id")))
    val rk = row_number().over(
      byProbe.orderBy(col("kw_overlap").desc, col("doc_id")))
    val ranked = grid
      .withColumn("rank_vec", rv)
      .withColumn("rank_kw", rk)
      .withColumn("rrf",
        lit(1.0) / (lit(rrfK) + col("rank_vec")) +
          lit(1.0) / (lit(rrfK) + col("rank_kw")))
    ranked
      .withColumn("rank_rrf", row_number().over(
        byProbe.orderBy(col("rrf").desc, col("doc_id"))))
      .filter(col("rank_rrf") <= k)
      .select(col("probe_id"), col("doc_id"), col("rank_vec"),
        col("rank_kw"), col("kw_overlap"), col("rrf"), col("rank_rrf"))
  }

  /** Sparse retriever scale path: per-probe top-`n` by keyword overlap
    * through the inverted index — the corpus is touched ONLY via the
    * token-keyed equi-join (each probe's tokens broadcast), so cost is
    * Σ_token df(token_probe) candidate rows, never corpus × probes.
    * Rank is deterministic (overlap desc, doc_id asc). Docs sharing no
    * token with the probe cannot rank (the inverted index never sees
    * them) — exactly the retriever contract [[rrfFuse]]'s union
    * semantics expects.
    */
  def sparseTopN(docs: DataFrame, nProbes: Int = 3, n: Int = 20): DataFrame = {
    overlapCounts(docs, nProbes)
      .withColumn("rank", row_number().over(Window.partitionBy(col("probe_id"))
        .orderBy(col("kw_overlap").desc, col("doc_id"))))
      .filter(col("rank") <= n)
      .select(col("probe_id"), col("doc_id"), col("rank"))
  }

  /** Production fusion: RRF over two already-retrieved ranked lists —
    * `(probe_id, doc_id, rank)` each, typically per-retriever top-N from
    * the scale paths (IVF dense, inverted-index sparse). Docs present in
    * only one list contribute only that list's term (the paper's union
    * semantics). Output mirrors [[hybridRrfTopK]] minus the raw scores.
    */
  def rrfFuse(dense: DataFrame, sparse: DataFrame, k: Int = 10,
              rrfK: Int = 60): DataFrame = {
    val d = dense.select(col("probe_id"), col("doc_id"),
      col("rank").as("rank_vec"))
    val s = sparse.select(col("probe_id"), col("doc_id"),
      col("rank").as("rank_kw"))
    val term = (r: org.apache.spark.sql.Column) =>
      when(r.isNotNull, lit(1.0) / (lit(rrfK) + r)).otherwise(lit(0.0))
    val byProbe = Window.partitionBy(col("probe_id"))
    d.join(s, Seq("probe_id", "doc_id"), "full_outer")
      .withColumn("rrf", term(col("rank_vec")) + term(col("rank_kw")))
      .withColumn("rank_rrf", row_number().over(
        byProbe.orderBy(col("rrf").desc, col("doc_id"))))
      .filter(col("rank_rrf") <= k)
      .select(col("probe_id"), col("doc_id"), col("rank_vec"),
        col("rank_kw"), col("rrf"), col("rank_rrf"))
  }

  /** Cross-encoder-style RERANK — the second stage of production
    * retrieval: the first stage over-retrieves a candidate pool per
    * probe (here [[rrfFuse]]'s top-N), and the reranker re-scores each
    * (probe, candidate) PAIR with a scorer that sees both sides jointly
    * — the defining property of a cross-encoder versus the bi-encoder /
    * keyword stages, which score sides independently and only meet in
    * rank space. The deterministic stand-in for the neural pair-scorer
    * keeps that property: `score = wCos·cosine(p, d) + (1−wCos)·
    * tokenJaccard(p, d)` — a pair-joint interaction in embedding space
    * plus a pair-joint set interaction over the documents' token sets.
    *
    * Scale posture: everything is candidate-bounded. The pair list is
    * |probes|×N rows and BROADCASTS into every corpus-sized side: two
    * id-keyed joins fetch the embeddings, a semi-join prunes the token
    * explode to candidate documents before any aggregation, and the
    * intersection count touches only candidate-token rows. The corpus is
    * never re-scanned per pair and never self-joined — rerank cost grows
    * with the candidate pool, not the corpus, which is exactly why the
    * expensive scorer is affordable as a SECOND stage (the two-stage
    * contract from the neural-retrieval literature: cheap recall first,
    * expensive precision on the short list).
    *
    * Determinism: cosine is the q37-pinned double; Jaccard is ONE
    * correctly-rounded division of exact integer counts; the blend is
    * two multiplies and one add in both engines, and ranks tie-break on
    * doc_id — hash-exact cross-engine, no measured-margin caveat.
    */
  def rerank(cands: DataFrame, emb: DataFrame, docs: DataFrame,
             k: Int = 10, wCos: Double = 0.5): DataFrame = {
    require(wCos >= 0 && wCos <= 1, s"wCos must be in [0, 1], got $wCos")
    val pairs = cands.select(col("probe_id"), col("doc_id"),
      col("rank_rrf").as("rank_first"))
    val pe = emb.select(col("vec_id").as("probe_id"),
      col("embedding").as("p_emb"))
    val ne = emb.select(col("vec_id").as("doc_id"),
      col("embedding").as("n_emb"))
    val cosined = ne
      .join(broadcast(pe.join(broadcast(pairs), Seq("probe_id"))),
        Seq("doc_id"))
      .withColumn("cosine", Similarity.cosine(col("p_emb"), col("n_emb")))
      .select(col("probe_id"), col("doc_id"), col("rank_first"),
        col("cosine"))
    // token features, candidate-pruned BEFORE the explode aggregates:
    // only documents appearing in the pair list (either side) keep rows
    val toks = docTokens(docs)
    val wanted = pairs.select(col("probe_id").as("doc_id"))
      .union(pairs.select(col("doc_id"))).distinct()
    val candToks = toks.join(broadcast(wanted), Seq("doc_id"), "left_semi")
      .localCheckpoint()
    val sizes = candToks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"))
    val inter = broadcast(pairs.select(col("probe_id"), col("doc_id")))
      .join(candToks.select(col("doc_id").as("probe_id"), col("token")),
        Seq("probe_id"))
      .join(candToks, Seq("doc_id", "token"), "left_semi")
      .groupBy(col("probe_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_inter"))
    cosined
      .join(inter, Seq("probe_id", "doc_id"), "left")
      .withColumn("n_inter", coalesce(col("n_inter"), lit(0L)))
      .join(broadcast(sizes.select(col("doc_id").as("probe_id"),
        col("n_tok").as("n_ptok"))), Seq("probe_id"))
      .join(broadcast(sizes.select(col("doc_id"),
        col("n_tok").as("n_dtok"))), Seq("doc_id"))
      .withColumn("jaccard", col("n_inter").cast("double") /
        (col("n_ptok") + col("n_dtok") - col("n_inter")).cast("double"))
      .withColumn("score",
        lit(wCos) * col("cosine") + lit(1.0 - wCos) * col("jaccard"))
      .withColumn("rank", row_number().over(Window
        .partitionBy(col("probe_id"))
        .orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("doc_id"), col("rank_first"),
        col("n_inter"), col("cosine"), col("jaccard"), col("score"),
        col("rank"))
  }
}
