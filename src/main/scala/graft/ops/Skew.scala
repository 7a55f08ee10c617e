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
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], valueCol: String,
                salts: Int = 16): DataFrame = {
    // Row-position salt, not a content hash: the classic hot key is a pile
    // of IDENTICAL rows, which a content hash sends to ONE salt — exactly
    // the case salting exists to break. Any distribution yields the same
    // aggregate, so nondeterminism across retries is harmless here.
    val salted = df.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val partial = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(sum(Agg.money(col(valueCol))).as("_psum"),
        count(lit(1)).as("_pn"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_psum")).cast("double").as(s"sum_$valueCol"),
        sum(col("_pn")).as("n"))
  }

  /** Salted broadcast-free join for a skewed big side against a small-but-
    * not-broadcastable right side. `right` is replicated `salts`×.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val replicated = small.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
