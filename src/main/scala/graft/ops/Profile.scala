package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling: per-column null/distinct/min/max statistics in one
  * declared aggregation — the discovery-side sibling of the enforcement
  * gate ([[graft.ops.Constraints]]): the gate checks rules you already
  * know; the profiler tells you which rules to write.
  *
  * Output is long format, one row per profiled column: `col_name`,
  * `n_rows`, `n_null`, `n_distinct`, `min_s`, `max_s` (plus the group
  * column for [[profileBy]]). Min/max are computed on the NATIVE type
  * (so `9 < 10` for numerics) and cast to string afterwards for the
  * uniform schema — cross-engine stable for integer and string columns
  * (profile DOUBLE columns through an explicit rounding projection
  * first; double→string formatting is not part of the parity contract).
  *
  * Scale posture: one scan either way. The exact form's multiple
  * `COUNT(DISTINCT)`s make Catalyst plan an Expand (one duplicated row
  * per distinct-aggregate — ×cols input amplification before the
  * map-side partial dedup); that is the standard Spark plan and fine
  * into the low-terabyte range, but at 100 TB profile with
  * `exact = false`: `approx_count_distinct` (HLL++) keeps the single
  * no-Expand pass and every other statistic stays exact. ProfileSpec
  * pins the approx form's distinct estimates within HLL rsd of the
  * exact form; q137's registered twin is the q136 exact profile.
  */
object Profile {

  /** Per-column stats over `cols` (default: every column). */
  def profile(df: DataFrame, cols: Seq[String] = Nil,
              exact: Boolean = true): DataFrame = {
    val cs = if (cols.nonEmpty) cols else df.columns.toSeq
    profiled(df, None, cs, exact)
      .select(col("col_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_s"), col("max_s"))
  }

  /** [[profile]] per stratum: the same statistics with one row per
    * (group, column) — "is source X's doc_id range disjoint from source
    * Y's", "which segment carries the nulls". Grouped instead of global,
    * otherwise the identical single-aggregation + stack pivot.
    */
  def profileBy(df: DataFrame, groupCol: String, cols: Seq[String],
                exact: Boolean = true): DataFrame = {
    require(!cols.contains(groupCol),
      s"profileBy: group column $groupCol cannot be profiled")
    profiled(df, Some(groupCol), cols, exact)
  }

  /** The shared core: one (optionally grouped) aggregation of all four
    * stats per column, pivoted long by a `stack()` generator over the
    * one-row-per-group stats frame — never a second scan.
    */
  private def profiled(df: DataFrame, groupCol: Option[String],
                       cs: Seq[String], exact: Boolean): DataFrame = {
    require(cs.nonEmpty, "profile: no columns")
    // the stack() pivot embeds column names in an expr string: backticks
    // would escape the quoting and quotes would corrupt the label
    // literal — refuse loudly rather than build a broken projection
    (cs ++ groupCol).foreach(c =>
      require(!c.contains("`") && !c.contains("'"),
        s"profile: column name must not contain backticks/quotes: $c"))
    val nd: String => Column =
      if (exact) c => countDistinct(col(c))
      else c => approx_count_distinct(col(c))
    val aggs: Seq[Column] = cs.flatMap { c =>
      Seq(count(col(c)).as(s"nn_$c"), nd(c).as(s"nd_$c"),
        min(col(c)).cast("string").as(s"mn_$c"),
        max(col(c)).cast("string").as(s"mx_$c"))
    } :+ count(lit(1)).as("n_rows")
    val stats = groupCol match {
      case Some(g) => df.groupBy(col(g)).agg(aggs.head, aggs.tail: _*)
      case None => df.agg(aggs.head, aggs.tail: _*)
    }
    val stacked = cs.map(c => s"'$c', `nn_$c`, `nd_$c`, `mn_$c`, `mx_$c`")
      .mkString(", ")
    stats.select(groupCol.map(col).toSeq ++ Seq(col("n_rows"),
      expr(s"stack(${cs.size}, $stacked) AS " +
        "(col_name, n_non_null, n_distinct, min_s, max_s)")): _*)
      .select(groupCol.map(col).toSeq ++ Seq(col("col_name"), col("n_rows"),
        (col("n_rows") - col("n_non_null")).as("n_null"),
        col("n_distinct"), col("min_s"), col("max_s")): _*)
  }
}
