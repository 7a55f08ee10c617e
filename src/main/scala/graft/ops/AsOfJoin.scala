package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY.md §2.3 J6): for each probe row, the most recent quote
  * row with quote.time <= probe.time, per key. Inner semantics: probes with
  * no preceding quote are dropped (matches DuckDB ASOF JOIN).
  *
  * Implementation is the scalable union+window form, NOT a range cross join:
  * tag both sides, union, and take `last(quote_col, ignoreNulls)` over a
  * (key, time)-sorted running frame. One hash shuffle on the key + one
  * per-partition sort — the same cost envelope as a sort-merge join, with no
  * candidate-pair explosion regardless of how many probes share a key. This
  * is the plan that survives 100 TB; a `probe.t >= quote.t` theta-join would
  * degenerate to a broadcast nested loop.
  *
  * Caller contract: probe and quote column names must be disjoint apart from
  * `keys` (rename before calling); quote rows are totally ordered within a
  * key by `quoteTime`.
  */
object AsOfJoin {

  def asOf(probes: DataFrame, quotes: DataFrame, keys: Seq[String],
           probeTime: String, quoteTime: String): DataFrame = {
    val pOnly = probes.columns.filterNot(keys.contains)
    val qOnly = quotes.columns.filterNot(keys.contains)

    val pSide = probes.select(
      keys.map(col) ++
        pOnly.map(col) ++
        qOnly.map(c => lit(null).cast(quotes.schema(c).dataType).as(c)) ++
        Seq(col(probeTime).as("_t"), lit(1).as("_is_probe")): _*)
    // A NULL-time quote can never satisfy probe.t >= quote.t (ASOF
    // semantics); without this filter it would sort to the frame start
    // (nulls-first) and become a universal fallback match.
    val qSide = quotes.filter(col(quoteTime).isNotNull).select(
      keys.map(col) ++
        pOnly.map(c => lit(null).cast(probes.schema(c).dataType).as(c)) ++
        qOnly.map(col) ++
        Seq(col(quoteTime).as("_t"), lit(0).as("_is_probe")): _*)

    // Quote sorts before probe at equal time (_is_probe asc) → ">=" semantics.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc, col("_is_probe").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // Fill the quote columns as ONE struct, not column-by-column: per-column
    // last(ignoreNulls) would backfill a NULL field of the matched quote
    // from an OLDER quote, synthesizing a row that never existed — and
    // per-column isNotNull match detection would drop probes whose true
    // match merely had a null field.
    val unioned = pSide.unionByName(qSide)
      .withColumn("_quote",
        when(col("_is_probe") === 0, struct(qOnly.map(col): _*)))
      .withColumn("_quote", last(col("_quote"), ignoreNulls = true).over(w))
    unioned
      .filter(col("_is_probe") === 1 && col("_quote").isNotNull)
      .select(keys.map(col) ++ pOnly.map(col) ++
        qOnly.map(c => col(s"_quote.$c").as(c)): _*)
  }
}
