package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators (SURVEY.md §4.4 posture; north-star scale).
  *
  * AQE's skew-join splitting handles most hot keys at runtime; these are
  * the explicit forms for when the skew is known and extreme (a handful of
  * keys holding half of 100 TB):
  *
  *  - [[saltedAgg]]: two-phase aggregation through a synthetic salt — the
  *    hot key's rows spread over `salts` reducers in phase 1, and phase 2
  *    combines `salts` partial rows per key (trivial). Only associative
  *    aggregates compose this way; decimal sums and counts do.
  *  - [[saltedJoin]]: replicate the SMALL side `salts`× with an explicit
  *    salt column, salt the big side by hash, join on (key, salt) — the hot
  *    key's big-side rows land on `salts` different reducers.
  */
object Skew {

  /** Two-phase salted sum/count per key. Output: key columns + `sum_<col>`
    * (decimal-exact, surfaced double) + `n`. Equal to the direct groupBy —
    * verified by the oracle — but with no single-reducer hot key.
    *
    * Determinism design: a row-position salt (monotonically_increasing_id,
    * rand) is NOT retry-safe on shuffle-derived input — a re-attempted map
    * task can emit different salts and partial-stage retry then double-
    * counts or drops rows (the SPARK-23207 class of bug). The salt is a
    * content hash of the projected row instead: deterministic under
    * retry, and a hot key's DISTINCT rows spread across `salts` reducers.
    * Its one apparent weakness — byte-identical duplicate rows share a
    * salt — is no weakness at all: the salted stage's own MAP-SIDE
    * partial aggregation collapses identical rows to one partial per
    * (key, salt) before anything shuffles, so no reducer ever sees the
    * hot key's row count. An earlier form pre-aggregated by the full
    * projected row for exactly that duplicate-collapse, which shipped
    * |distinct (key, value)| rows through an EXTRA exchange — with a
    * high-cardinality value column that first shuffle was as wide as the
    * data and collapsed nothing (measured 4× of the whole query at
    * sf0.1). Two exchanges total, both carrying at most
    * tasks × |keys| × salts partial rows.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], valueCol: String,
                salts: Int = 16): DataFrame = {
    // the output reads only keys + value, so the content-hash salt works
    // on exactly those columns — any other column would spread rows that
    // the map-side partial could otherwise collapse
    val proj = (keys :+ valueCol).distinct
    val slim = df.select(proj.map(col): _*)
    val salted = slim.withColumn("_salt",
      pmod(xxhash64(proj.map(col): _*), lit(salts)))
    // money flows as integer cents split into quotient/remainder long
    // partials (the Agg.unitsSum shape stretched across the two salted
    // stages — the per-salt partials carry (_pq, _pr) longs and the final
    // stage recombines once per key; decimal aggregation buffers would
    // pay per-row BigDecimal on BOTH stages)
    val u = Agg.cents(col(valueCol))
    val partial = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(sum(Agg.unitsQuot(u, 2)).as("_pq"),
        sum(Agg.unitsRem(u, 2)).as("_pr"),
        count(lit(1)).as("_pn"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(Agg.unitsValue(sum(col("_pq")), sum(col("_pr")), 2)
        .cast("double").as(s"sum_$valueCol"),
        sum(col("_pn")).as("n"))
  }

  /** Salted broadcast-free join for a skewed big side against a small-but-
    * not-broadcastable right side. `right` is replicated `salts`×. The big
    * side's salt is a content hash: deterministic (retry-safe); distinct
    * rows of a hot key spread. Byte-identical duplicate rows share a salt —
    * pre-aggregate such duplicates (see [[saltedAgg]]) before a join if
    * that is the skew shape.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val replicated = small.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
