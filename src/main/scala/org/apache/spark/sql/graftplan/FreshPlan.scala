package org.apache.spark.sql.graftplan

import org.apache.spark.sql.{DataFrame, Row}

/** Plan hygiene for iterative fixpoints (lives under `org.apache.spark.sql`
  * solely for `private[sql]` access to `internalCreateDataFrame`).
  *
  * Since SPARK-39834, the `LogicalRDD` a `localCheckpoint` produces
  * carries the ORIGIN plan's statistics. Inside a fixpoint loop that is a
  * correctness-adjacent scale bug: every round's self-joins multiply
  * `sizeInBytes` estimates, the checkpoint preserves the product, and the
  * next round multiplies it again — the estimate's BIT LENGTH doubles or
  * worse per round (measured: 22 → 43 → 85 → … bits on a 1-join round).
  * A single fixpoint of 5–6 rounds leaves megabit-sized BigInt stats
  * (milliseconds of driver BigInteger math per plan); COMPOSING two
  * fixpoints — e.g. resuming incremental clustering from a labeling that
  * was itself produced by a fixpoint — squares that again and the driver
  * spends minutes inside `SizeInBytesOnlyStatsPlanVisitor` multiplying
  * astronomically large integers before a single task runs.
  *
  * [[localCheckpointFresh]] therefore re-wraps the checkpointed RDD in a
  * brand-new `LogicalRDD` with NO origin statistics (zero row conversion
  * — the `InternalRow` RDD is reused as-is). The fresh frame reports the
  * session default `sizeInBytes`, which inside a loop is exactly right:
  * label frames are join spines, never broadcast candidates.
  */
object FreshPlan {

  def localCheckpointFresh(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint()
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    ck.sparkSession.internalCreateDataFrame(
      ck.queryExecution.toRdd, ck.schema, isStreaming = false)
  }
}
