package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.Agg
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers a named query here
  * plus (when SQL-expressible) an ANSI-SQL oracle that DuckDB runs on the
  * same parquet tables. Column names and value determinism are part of the
  * contract: every float column is computed decimal-exact and surfaced as
  * DOUBLE in both engines so the driver's hash compare is stable.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Agg.dailyEngagement(t(spark, "/root/testdata/sf0.001", "events"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A3–A6: partial+final hash agg, decimal-exact measures (TPC-H Q1 shape).
    "q01_pricing_summary" -> ((s, dir) => Agg.pricingSummary(t(s, dir, "lineitem"))),
    // A3–A5 + A4 distinct: the reference's declared-but-unbuilt gold rollup.
    "q02_daily_engagement" -> ((s, dir) => Agg.dailyEngagement(t(s, dir, "events"))),
    // A2/T3: event-time high-water mark (watermark advance).
    "q03_high_water" -> ((s, dir) => Agg.highWater(t(s, dir, "events"))),
    // A7: rollup (per-group, per-flag subtotal, grand total).
    "q04_rollup" -> ((s, dir) => Agg.returnFlagRollup(t(s, dir, "lineitem")))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1.00 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_daily_engagement" ->
      """SELECT event_type, CAST(ts AS DATE) AS dt,
        |  COUNT(*) AS load_count,
        |  COUNT(*) FILTER (WHERE value > 5.0) AS play_count,
        |  CAST(COUNT(*) FILTER (WHERE value > 5.0) AS DOUBLE) / COUNT(*) AS play_rate,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / 3600.0 AS hours_watched,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS engagement,
        |  COUNT(DISTINCT user_id) AS visitors
        |FROM events
        |GROUP BY event_type, CAST(ts AS DATE)""".stripMargin,
    "q03_high_water" ->
      "SELECT MAX(ts) AS high_water, COUNT(*) AS n_events FROM events",
    "q04_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin
  )
}
