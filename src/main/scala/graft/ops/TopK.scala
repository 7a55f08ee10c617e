package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sort / limit / top-k operators (SURVEY.md §2.6: O1–O3).
  *
  * `orderBy(...).limit(k)` plans as `TakeOrderedAndProject`: each partition
  * keeps a k-row heap and only k rows per partition reach the driver — no
  * global sort ever materializes, which is why this form scales to 100 TB
  * while `orderBy().collect()` does not.
  */
object TopK {

  /** O3: global top-k under a total order. */
  def global(df: DataFrame, order: Seq[Column], k: Int): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** Top-k per group: rank within partition + filter. One shuffle on the
    * partition keys; the sort is per-partition.
    */
  def perGroup(df: DataFrame, partition: Seq[String], order: Seq[Column],
               k: Int): DataFrame = {
    val w = Window.partitionBy(partition.map(col): _*).orderBy(order: _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .withColumnRenamed("_rn", "rank_in_group")
  }
}
