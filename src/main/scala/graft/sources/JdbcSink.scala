package graft.sources

import org.apache.spark.sql.DataFrame

/** JDBC warehouse sink parity — the reference's two write shapes
  * re-expressed over Spark's own JDBC source (no connector lock-in):
  *
  *  1. plain APPEND to a fact table (REF
  *     `glue_jobs/silver/wistia_transform_silver.py:57-67`, the
  *     `fact_events` leg);
  *  2. STAGED MERGE — truncate a stage table (the REF `preactions`),
  *     bulk-load it with Spark's distributed JDBC writer, then run
  *     delete-matching + insert-from-stage + truncate-stage as ONE
  *     warehouse transaction (REF `wistia_transform_silver.py:93-107`
  *     `postactions: CALL sp_upsert_dim_media()`, whose body is
  *     `redshift/seed_data/wistia_stored_procedures.py:3-42` — inlined
  *     here as portable ANSI SQL so no stored procedure needs to
  *     pre-exist).
  *
  * This is the JDBC twin of [[graft.ops.Upsert]]'s parquet parity ops
  * (q07/q08): same delete-matching key semantics, same
  * upsert ≡ rebuild contract, warehouse-side execution.
  *
  * Scale posture: the only data-proportional step is the stage load,
  * which Spark parallelizes per partition (`numPartitions`/`batchsize`
  * ride `options`); the merge itself runs INSIDE the warehouse as set
  * SQL — no row ever comes back through the driver. The driver holds
  * one control connection for the bracketing statements, exactly like
  * the reference's preactions/postactions.
  */
object JdbcSink {

  /** Distributed append. `options` passes through to the Spark JDBC
    * writer (`driver`, `numPartitions`, `batchsize`, credentials, ...).
    */
  def append(df: DataFrame, url: String, table: String,
             options: Map[String, String] = Map.empty): Unit =
    df.write.mode("append").format("jdbc")
      .option("url", url).option("dbtable", table)
      .options(options)
      .save()

  /** Staged merge into `target` keyed on `keys`: rows whose key matches
    * a staged row are replaced, everything else is untouched —
    * upsert ≡ rebuild, the q07 contract. The stage is truncated before
    * the load (a crashed previous run must not leak rows into this
    * merge) and after the merge commits (the stored procedure's own
    * step 3). DELETE + INSERT run as ONE transaction, so a reader of
    * `target` never observes the deleted-but-not-reinserted state and a
    * crash mid-merge rolls back to pre-merge. The post-merge stage
    * truncate runs as a SEPARATE follow-up statement ON PURPOSE:
    * TRUNCATE implicitly commits on the primary targets (Redshift,
    * MySQL), so bundling it into the merge transaction would silently
    * move the commit point on those engines and only honor the
    * documented atomicity on Derby/Postgres. A crash between the merge
    * commit and the truncate leaves stale stage rows, which the NEXT
    * run's pre-load truncate clears before they can affect any merge —
    * the stage is never read outside this bracket.
    */
  def stagedMerge(df: DataFrame, url: String, target: String, stage: String,
                  keys: Seq[String],
                  options: Map[String, String] = Map.empty): Unit = {
    require(keys.nonEmpty, "stagedMerge: need at least one key column")
    val missing = keys.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"stagedMerge: key columns ${missing.mkString(", ")} not in frame " +
        s"(${df.columns.mkString(", ")})")
    // preaction: an empty stage is the precondition the merge SQL
    // assumes — run it OUTSIDE the merge transaction (Redshift TRUNCATE
    // auto-commits anyway; portable form keeps the same visible order)
    execute(url, options, s"TRUNCATE TABLE $stage")
    append(df, url, stage, options)
    val cols = df.columns.mkString(", ")
    val keyMatch = keys.map(k => s"$stage.$k = $target.$k")
      .mkString(" AND ")
    executeTxn(url, options,
      // ANSI EXISTS form of Redshift's DELETE ... USING — runs
      // unchanged on Derby/Postgres/Redshift
      s"DELETE FROM $target WHERE EXISTS " +
        s"(SELECT 1 FROM $stage WHERE $keyMatch)",
      s"INSERT INTO $target ($cols) SELECT $cols FROM $stage")
    // outside the txn: TRUNCATE auto-commits on Redshift/MySQL, so
    // inside it would move the engines' real commit point (scaladoc)
    execute(url, options, s"TRUNCATE TABLE $stage")
  }

  /** Run statements on one auto-committed control connection — the DDL
    * / preaction hook (idempotent DDL stays the caller's text, as in
    * the reference's seed scripts).
    */
  def execute(url: String, options: Map[String, String],
              sql: String*): Unit =
    withConnection(url, options) { conn =>
      conn.setAutoCommit(true)
      val st = conn.createStatement()
      try sql.foreach(st.execute) finally st.close()
    }

  /** Run statements as ONE transaction: all-or-nothing, rollback on any
    * failure — the stored-procedure body's atomicity.
    */
  def executeTxn(url: String, options: Map[String, String],
                 sql: String*): Unit =
    withConnection(url, options) { conn =>
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      try {
        sql.foreach(st.execute)
        conn.commit()
      } catch {
        case e: Throwable =>
          try conn.rollback() catch { case _: Throwable => () }
          throw e
      } finally st.close()
    }

  private def withConnection[A](url: String, options: Map[String, String])
      (f: java.sql.Connection => A): A = {
    options.get("driver").foreach(Class.forName)
    val props = new java.util.Properties()
    options.get("user").foreach(props.setProperty("user", _))
    options.get("password").foreach(props.setProperty("password", _))
    val conn = java.sql.DriverManager.getConnection(url, props)
    try f(conn) finally conn.close()
  }
}
