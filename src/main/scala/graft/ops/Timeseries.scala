package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series shaping over the event stream: per-entity calendar
  * resampling with carry-forward, and robust (median/MAD) outlier
  * flagging over daily rollups.
  *
  * The reference's analytics stop at observed-day rollups
  * (REF redshift/seed_data/wistia_redshift_schemas.py:43-52 — the gold
  * daily rollup q02 re-expresses); feature pipelines downstream of such a
  * store need the OTHER days too: a per-entity dense daily matrix where a
  * day with no events still has a row (zero counts, carried-forward
  * totals). That gap-fill is the classic training-data "as-of feature
  * join" precursor, so it is built here as a first-class operator rather
  * than left to each consumer.
  *
  * Scale posture (100 TB): everything happens at the DAILY grain — the
  * raw stream is touched exactly once by one (entity, day) hash
  * aggregation with map-side partials; the spine, the fill window, and
  * the median/MAD passes all run over entities × active-days rows, which
  * is state-sized (bounded by the calendar), not event-sized. The spine
  * is generated distributively with `sequence()` per entity — each row
  * explodes only its own [min, max] span, no driver loop, no global
  * calendar table to cross join.
  */
object Timeseries {

  /** Dense per-entity daily matrix with forward-fill.
    *
    * One row per (entity, calendar day) between that entity's first and
    * last active day: `n_events` (0 on gap days), `day_total` (exact
    * decimal day sum, NULL on gap days), `filled_total` (last observed
    * `day_total` at or before the day — carry-forward), and
    * `is_observed` 1/0. The leading day is always observed (the span
    * starts at the entity's first event), so `filled_total` is never
    * NULL — a guarantee consumers can rely on (TimeseriesSpec pins it).
    *
    * Shuffle audit: (1) hash agg on (entity, day) — the only pass over
    * the raw stream; (2) span agg + spine explode on entity; (3) the
    * spine⋈daily join and the fill window share the entity-keyed
    * partitioning. `is_observed` is BIGINT 0/1, not BOOLEAN, so the
    * cross-engine hash compare stays on integer bytes.
    */
  def resampleDaily(events: DataFrame,
                    entityCol: String = "user_id"): DataFrame = {
    val e = col(entityCol)
    val daily = events
      .groupBy(e, to_date(col("ts")).as("d"))
      .agg(Agg.dsum(col("value")).as("day_total"),
        count(lit(1)).as("n_events"))
    val spine = daily
      .groupBy(e)
      .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(e, explode(sequence(col("d0"), col("d1"))).as("d"))
    val fill = Window.partitionBy(e).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .join(daily, Seq(entityCol, "d"), "left")
      .select(e, col("d"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("day_total"),
        last(col("day_total"), ignoreNulls = true).over(fill)
          .as("filled_total"),
        when(col("n_events").isNotNull, 1L).otherwise(0L).cast("long")
          .as("is_observed"))
  }

  /** Days whose daily total is a robust outlier for their event type:
    * |day_total − median| > k · MAD, with the deviation surfaced as
    * `robust_z` = |x − med| / MAD. Median/MAD instead of mean/stddev so
    * the flagged anomalies cannot drag the threshold toward themselves —
    * the standard robust-statistics posture for data-quality monitoring
    * over pipeline output.
    *
    * Exactness: `day_total` is the decimal-exact day sum as DOUBLE, both
    * medians are exact interpolated percentiles (`percentile`, the q130
    * ≡ `quantile_cont` cross-engine precedent), and the flag compares
    * IEEE doubles — bit-stable against the DuckDB oracle.
    *
    * Scale: both percentile passes run over the DAILY table (types ×
    * days rows); the raw stream is scanned once by the same (type, day)
    * aggregation as [[resampleDaily]]. The median and MAD frames are
    * types-count rows and broadcast back — no window over the stream, no
    * second scan.
    */
  def robustOutliers(events: DataFrame, k: Double = 2.5): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(Agg.dsum(col("value")).as("day_total"))
    val med = daily.groupBy(col("event_type"))
      .agg(expr("percentile(day_total, 0.5)").as("med"))
    val mad = daily
      .join(broadcast(med), Seq("event_type"))
      .groupBy(col("event_type"), col("med"))
      .agg(expr("percentile(abs(day_total - med), 0.5)").as("mad"))
    daily
      .join(broadcast(mad), Seq("event_type"))
      .filter(abs(col("day_total") - col("med")) > lit(k) * col("mad"))
      .select(col("event_type"), col("d"), col("day_total"), col("med"),
        col("mad"),
        (abs(col("day_total") - col("med")) / col("mad")).as("robust_z"))
  }
}
