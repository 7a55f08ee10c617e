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
}
