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
    * counts or drops rows (the SPARK-23207 class of bug). Instead:
    *  1. pre-aggregate by the full PROJECTED row — keys + value, the only
    *     columns the output reads (map-side combine collapses the worst
    *     case, a hot key of identical values, before any reducer sees
    *     it);
    *  2. salt the now-distinct rows by content hash (deterministic, and
    *     distinct rows spread);
    *  3. weighted two-phase aggregation.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], valueCol: String,
                salts: Int = 16): DataFrame = {
    // the output reads only keys + value, so the row-content pre-agg and
    // the content-hash salt work on exactly those columns — any other
    // column would widen the first shuffle for nothing (and LESS content
    // collapses MORE: rows differing only in dropped columns merge into
    // one weighted row here instead of surviving to the salted stage)
    val proj = (keys :+ valueCol).distinct
    val slim = df.select(proj.map(col): _*)
    val weighted = slim.groupBy(proj.map(col): _*)
      .agg(count(lit(1)).as("_cnt"))
    val salted = weighted.withColumn("_salt",
      pmod(xxhash64(proj.map(col): _*), lit(salts)))
    // money flows as integer cents split into quotient/remainder long
    // partials (the Agg.unitsSum shape stretched across the two salted
    // stages — the per-salt partials carry (_pq, _pr) longs and the final
    // stage recombines once per key; decimal aggregation buffers would
    // pay per-row BigDecimal on BOTH stages)
    val u = Agg.cents(col(valueCol)) * col("_cnt")
    val partial = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(sum(Agg.unitsQuot(u, 2)).as("_pq"),
        sum(Agg.unitsRem(u, 2)).as("_pr"),
        sum(col("_cnt")).as("_pn"))
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
      pmod(xxhash64(big.columns.map(col): _*), lit(salts)))
    val replicated = small.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
