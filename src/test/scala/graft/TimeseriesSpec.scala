package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._

import graft.ops.Timeseries

/** Pins for [[graft.ops.Timeseries]]: spine density/bounds, the
  * carry-forward semantics on a hand-built gapped fixture, and the
  * median/MAD flag algebra.
  */
class TimeseriesSpec extends SparkSpec {

  import spark.implicits._

  private def ev(rows: (Long, String, String, Double)*) =
    rows.toDF("user_id", "tss", "event_type", "value")
      .select(col("user_id"), to_timestamp(col("tss")).as("ts"),
        col("event_type"), col("value"))

  test("resampleDaily: dense spine, zero-filled gaps, carry-forward") {
    // user 1: days 1,2,5 active (gap 3-4); user 2: one day only.
    val out = Timeseries.resampleDaily(ev(
      (1L, "2024-01-01 10:00:00", "view", 3.0),
      (1L, "2024-01-01 11:00:00", "view", 4.0),
      (1L, "2024-01-02 09:00:00", "view", 10.0),
      (1L, "2024-01-05 09:00:00", "view", 2.5),
      (2L, "2024-01-03 09:00:00", "view", 7.0)))
      .orderBy("user_id", "d")
      .select("user_id", "d", "n_events", "day_total", "filled_total",
        "is_observed")
      .collect()

    assert(out.length === 6) // 5 days for user 1, 1 day for user 2
    val u1 = out.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getDate(1).toString).toSeq ===
      Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04",
        "2024-01-05"))
    assert(u1.map(_.getLong(2)).toSeq === Seq(2L, 1L, 0L, 0L, 1L))
    // day_total NULL on gap days; filled_total carries the last observed.
    assert(u1.map(r => Option(r.get(3))).toSeq ===
      Seq(Some(7.0), Some(10.0), None, None, Some(2.5)))
    assert(u1.map(_.getDouble(4)).toSeq ===
      Seq(7.0, 10.0, 10.0, 10.0, 2.5))
    assert(u1.map(_.getLong(5)).toSeq === Seq(1L, 1L, 0L, 0L, 1L))
  }

  test("resampleDaily: filled_total never NULL (span starts observed)") {
    val events = Tables.orEvents(spark)
    val out = Timeseries.resampleDaily(events)
    assert(out.filter(col("filled_total").isNull).count() === 0L)
    // Spine completeness: per user, rows == span days, no dup days.
    val bad = out.groupBy("user_id")
      .agg(count(lit(1)).as("n"), countDistinct(col("d")).as("nd"),
        (datediff(max(col("d")), min(col("d"))) + 1).as("span"))
      .filter(col("n") =!= col("span") || col("nd") =!= col("n"))
    assert(bad.count() === 0L)
  }

  test("resampleDailyInterp: linear blend between endpoints, observed kept") {
    // user 1: totals 10 on day 2 and 40 on day 5 -> gaps at 20, 30.
    val out = Timeseries.resampleDailyInterp(ev(
      (1L, "2024-01-02 10:00:00", "view", 10.0),
      (1L, "2024-01-05 09:00:00", "view", 40.0)))
      .orderBy("d")
      .select("d", "n_events", "day_total", "interp_total", "is_observed")
      .collect()
    assert(out.map(_.getDate(0).toString).toSeq ===
      Seq("2024-01-02", "2024-01-03", "2024-01-04", "2024-01-05"))
    assert(out.map(r => Option(r.get(2))).toSeq ===
      Seq(Some(10.0), None, None, Some(40.0)))
    assert(out.map(_.getDouble(3)).toSeq === Seq(10.0, 20.0, 30.0, 40.0))
    assert(out.map(_.getLong(4)).toSeq === Seq(1L, 0L, 0L, 1L))
  }

  test("dailyTrend: exact slope/intercept on a perfectly linear series") {
    // day totals 10, 12, 14, 16 on consecutive days: slope exactly 2.0
    // dollars/day; intercept follows at the epoch origin.
    val rows = Seq(10.0, 12.0, 14.0, 16.0).zipWithIndex.map { case (v, i) =>
      (1L, f"2024-01-${i + 1}%02d 10:00:00", "view", v)
    }
    val out = Timeseries.dailyTrend(ev(rows: _*)).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(1) === 4L)
    assert(r.getDouble(2) === 2.0)
    // fitted value back at the first day recovers the first total
    val x0 = java.time.LocalDate.of(2024, 1, 1).toEpochDay.toDouble
    assert(math.abs(r.getDouble(3) + 2.0 * x0 - 10.0) < 1e-6)
  }

  test("dailyTrend: sums are partitioning-invariant (exact partials)") {
    val events = Tables.orEvents(spark)
    def m(df: org.apache.spark.sql.DataFrame) =
      Timeseries.dailyTrend(df).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
          r.getDouble(3))).toMap
    assert(m(events.repartition(1)) === m(events.repartition(13,
      col("event_id"))))
  }

  test("robustOutliers: flags exactly the |x-med| > k*MAD days") {
    // One type, 7 days: six totals near 10, one at 100.
    val rows = Seq(10.0, 10.5, 9.5, 10.0, 11.0, 9.0, 100.0).zipWithIndex
      .map { case (v, i) =>
        (1L, f"2024-01-${i + 1}%02d 10:00:00", "view", v)
      }
    val out = Timeseries.robustOutliers(ev(rows: _*), k = 2.5)
      .select("d", "day_total", "robust_z").collect()
    assert(out.map(_.getDate(0).toString).toSeq === Seq("2024-01-07"))
    assert(out.head.getDouble(1) === 100.0)
    // med = 10.0, mad = 0.5 -> z = 180
    assert(out.head.getDouble(2) === 180.0)
  }

  test("robustOutliers: symmetric — flags low days too") {
    val rows = Seq(10.0, 10.5, 9.5, 10.0, 11.0, 9.0, 0.5).zipWithIndex
      .map { case (v, i) =>
        (1L, f"2024-01-${i + 1}%02d 10:00:00", "view", v)
      }
    val out = Timeseries.robustOutliers(ev(rows: _*), k = 2.5).collect()
    assert(out.map(_.getAs[Date]("d").toString).toSeq === Seq("2024-01-07"))
  }

  test("robustOutliers: zero-MAD series flags deviants with NULL robust_z") {
    // six identical totals and one spike: med = 10, MAD = 0 — the spike
    // is flagged (any deviation beats k·0) but has no robust scale;
    // robust_z must be NULL in BOTH engines (Spark would otherwise say
    // IEEE Inf where DuckDB says NULL).
    val rows = Seq(10.0, 10.0, 10.0, 10.0, 10.0, 10.0, 99.0).zipWithIndex
      .map { case (v, i) =>
        (1L, f"2024-01-${i + 1}%02d 10:00:00", "view", v)
      }
    val out = Timeseries.robustOutliers(ev(rows: _*)).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Date]("d").toString === "2024-01-07")
    assert(out.head.isNullAt(out.head.fieldIndex("robust_z")))
  }

  test("dailyTrend: single-day series has NULL slope, not 0/0") {
    val out = Timeseries.dailyTrend(
      ev((1L, "2024-01-01 10:00:00", "view", 5.0))).collect()
    assert(out.length === 1)
    assert(out.head.getLong(1) === 1L)
    assert(out.head.isNullAt(2) && out.head.isNullAt(3))
  }

  private object Tables {
    /** Small deterministic events frame with per-user gaps. */
    def orEvents(s: org.apache.spark.sql.SparkSession) = {
      import s.implicits._
      (1 to 200).map { i =>
        val day = 1 + (i * 7 % 23) // gappy per-user day pattern
        val uid = (i % 13).toLong
        (i.toLong, Timestamp.valueOf(f"2024-01-$day%02d 08:00:00"),
          uid, "view", (i % 50) / 2.0)
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
    }
  }
}
