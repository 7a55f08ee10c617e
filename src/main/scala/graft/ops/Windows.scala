package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Agg.dsum

/** Window-function operators (SURVEY.md §2.5: W1–W4; W1 lives in [[Dedup]]).
  *
  * None exist in the reference code, but they are the engine-native form of
  * its reporting semantics: "top videos by engagement" (docx Business
  * Objective), day-over-day engagement movement, and the 7-day production
  * window (docx FR8).
  *
  * Determinism rule (same as Dedup.firstWins): every orderBy used under a
  * ranking function must be a total order, or the rank is
  * partition-dependent. All helpers here take explicit tiebreak columns.
  */
object Windows {

  /** W2: rank/dense_rank/ntile of rows within a partition. */
  def ranked(df: DataFrame, partition: Seq[String], order: Seq[Column],
             buckets: Int = 4): DataFrame = {
    val w = Window.partitionBy(partition.map(col): _*).orderBy(order: _*)
    df.withColumn("rank", rank().over(w))
      .withColumn("dense_rank", dense_rank().over(w))
      .withColumn("ntile", ntile(buckets).over(w))
  }

  /** W3: day-over-day delta of a daily decimal-exact measure.
    * Input must already be at daily grain; output adds prev/delta columns.
    * The lag and the subtraction stay in decimal, so the surfaced double is
    * engine-independent.
    */
  def dayOverDay(daily: DataFrame, partition: Seq[String], dateCol: String,
                 measureCol: String): DataFrame = {
    val w = Window.partitionBy(partition.map(col): _*).orderBy(col(dateCol))
    daily
      .withColumn("prev_" + measureCol, lag(col(measureCol), 1).over(w))
      .withColumn("delta",
        col(measureCol) - coalesce(col("prev_" + measureCol), lit(0.0)))
  }

  /** W4: trailing k-row rolling sum of a daily measure (rows-based frame;
    * with contiguous days this is the k-day rolling window — the docx FR8
    * 7-day production window when k=7).
    */
  def rollingSum(daily: DataFrame, partition: Seq[String], dateCol: String,
                 measureCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(partition.map(col): _*)
      .orderBy(col(dateCol)).rowsBetween(-(k - 1), 0)
    daily.withColumn(s"rolling_${k}", sum(col(measureCol)).over(w))
  }

  /** Daily decimal-exact order totals — shared input for W3/W4 demos. */
  def dailyOrderTotals(orders: DataFrame): DataFrame =
    orders.groupBy(to_date(col("o_orderdate")).as("dt"))
      .agg(dsum(col("o_totalprice")).as("day_total"),
        count(lit(1)).as("n_orders"))
}
