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

  def localCheckpointFresh(df: DataFrame): DataFrame =
    rewrap(df.localCheckpoint())

  /** [[localCheckpointFresh]] with a RELIABLE checkpoint when a directory
    * is given: the blocks land on a real (re-readable) filesystem via
    * `Dataset.checkpoint`, so losing an executor mid-fixpoint recomputes
    * from the checkpoint files instead of killing the query — the 100 TB
    * preemptible-node posture for long iterative jobs. `localCheckpoint`
    * stores blocks ONLY on executors; with `None` (the default and the
    * right choice on a stable cluster or local mode) an executor loss
    * after the cut is fatal for the run, which batch-level retry then
    * pays in full. Same SPARK-39834 stat strip on both paths (reliable
    * checkpoints carry origin statistics exactly like local ones).
    * Measured overhead at sf0.01 (BASELINE.md round-17 note): the
    * per-round write+re-read on local disk.
    */
  def checkpointFresh(df: DataFrame, checkpointDir: Option[String]): DataFrame =
    checkpointDir match {
      case None => localCheckpointFresh(df)
      case Some(dir) => rewrap(reliable(df, dir))
    }

  /** Stat-PRESERVING materializer for loop invariants (edge tables,
    * degree annotations): `localCheckpoint` in local mode, a reliable
    * `checkpoint` under `Some(dir)`. No fresh re-wrap — invariants are
    * materialized once, so their origin statistics never compound, and
    * keeping them lets the planner still auto-broadcast a small
    * materialized side.
    */
  def materialize(df: DataFrame, checkpointDir: Option[String]): DataFrame =
    checkpointDir match {
      case None => df.localCheckpoint()
      case Some(dir) => reliable(df, dir)
    }

  private def reliable(df: DataFrame, dir: String): DataFrame = {
    val sc = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
      .sparkSession.sparkContext
    // setCheckpointDir appends a per-context UUID subdirectory, so the
    // stored value never string-equals `dir` — only (re)set when the
    // current one does not live under the requested root, keeping
    // repeated cuts in one run inside one directory tree.
    val wanted = new org.apache.hadoop.fs.Path(dir).toUri.getPath
    if (!sc.getCheckpointDir.exists(d =>
        new org.apache.hadoop.fs.Path(d).toUri.getPath.startsWith(wanted)))
      sc.setCheckpointDir(dir)
    df.checkpoint()
  }

  private def rewrap(ck0: DataFrame): DataFrame = {
    val ck = ck0.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    ck.sparkSession.internalCreateDataFrame(
      ck.queryExecution.toRdd, ck.schema, isStreaming = false)
  }
}
