package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Key-dedup operators (SURVEY.md §2.4 A1, §2.5 W1).
  *
  * The reference deduplicates with `dropDuplicates(["event_key"])`
  * (REF glue_jobs/silver/wistia_transform_silver.py:54), which keeps an
  * ARBITRARY row per key — fine single-node, non-deterministic on a cluster
  * where partition order varies run to run. [[firstWins]] is the
  * deterministic form: a rank over an explicit tiebreak order.
  */
object Dedup {

  /** A1 as the reference wrote it: arbitrary winner. One shuffle on `keys`. */
  def arbitrary(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** W1: deterministic winner — first row per key under `order`. Same single
    * shuffle as [[arbitrary]] (the window and the filter share the hash
    * partitioning on `keys`), so determinism costs only the per-partition
    * sort, not an extra exchange.
    */
  def firstWins(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** W1 via hash aggregation: when the tiebreak order is ALL-ASCENDING the
    * winner is `min(struct(order..., rest...))` — a partial+final hash
    * aggregate with map-side combine and NO per-partition sort. Measured
    * ~10× faster than the window form on the 600k-row dedup (the map-side
    * combine also shrinks shuffle traffic to one row per key per mapper,
    * which the window form cannot do). Caveats: struct comparison sorts
    * nulls first (like `asc_nulls_first`); and equivalence with
    * [[firstWins]] holds only when keys+ascOrder is already a TOTAL order —
    * for a partial ascOrder this form appends the remaining columns as
    * implicit tiebreaks (fully deterministic), while the window form's
    * winner would be partition-dependent.
    */
  def firstWinsViaMin(df: DataFrame, keys: Seq[String],
                      ascOrder: Seq[String]): DataFrame = {
    val valueCols = df.columns.filterNot(keys.contains)
    val ordered = ascOrder ++ valueCols.filterNot(ascOrder.contains)
    df.groupBy(keys.map(col): _*)
      .agg(min(struct(ordered.map(col): _*)).as("_w"))
      .select(keys.map(col) ++ valueCols.map(c => col(s"_w.$c").as(c)): _*)
      .select(df.columns.map(col(_)).toIndexedSeq: _*)
  }
}
