package graft

import org.apache.spark.sql.functions._

import graft.ops.{SetOps, TopK, Windows}

/** W2–W4 windows, O3 top-k, U2 set ops. */
class WindowsTopKSpec extends SparkSpec {
  import spark.implicits._

  test("ranked assigns rank/dense_rank/ntile under a total order (W2)") {
    val df = Seq(("a", 1, 30.0), ("a", 2, 30.0), ("a", 3, 10.0), ("b", 4, 5.0))
      .toDF("grp", "id", "score")
    val out = Windows.ranked(df, Seq("grp"), Seq($"score".desc, $"id".asc))
      .orderBy("grp", "rank").collect()
    assert(out.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3, 1))
    assert(out.map(_.getAs[Int]("dense_rank")).toSeq == Seq(1, 2, 3, 1))
  }

  test("dayOverDay computes lag deltas with 0-fill on the first day (W3)") {
    val daily = Seq(("2025-01-01", 10.0, 1L), ("2025-01-02", 25.0, 2L), ("2025-01-03", 5.0, 1L))
      .toDF("dt", "day_total", "n_orders")
    val out = Windows.dayOverDay(daily, Seq.empty, "dt", "day_total")
      .orderBy("dt").collect()
    assert(out.map(_.getAs[Double]("delta")).toSeq == Seq(10.0, 15.0, -20.0))
    assert(out(0).isNullAt(out(0).fieldIndex("prev_day_total")))
  }

  test("rollingSum covers a trailing k-row frame (W4)") {
    val daily = (1 to 10).map(i => (f"2025-01-$i%02d", 1.0)).toDF("dt", "v")
    val out = Windows.rollingSum(daily, Seq.empty, "dt", "v", 7)
      .orderBy("dt").collect()
    assert(out.map(_.getAs[Double]("rolling_7")).toSeq ==
      Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 7.0, 7.0, 7.0))
  }

  test("year-bucketed windows: identical to the global form across year boundaries and gap years") {
    // years 2023, 2024, 2026 with 2025 ABSENT: the 2026 rows' frames must
    // reach back to 2024's tail, exactly like the global order does
    val days = Seq.tabulate(4)(i => f"2023-12-${28 + i}%02d") ++
      Seq.tabulate(4)(i => f"2024-01-${i + 1}%02d") ++
      Seq.tabulate(4)(i => f"2026-03-${i + 1}%02d")
    val daily = days.zipWithIndex.map { case (d, i) => (d, (i + 1).toDouble) }
      .toDF("dt", "v")
    val wAll = org.apache.spark.sql.expressions.Window.orderBy(col("dt"))

    val lagRef = daily.withColumn("prev_v", lag(col("v"), 1).over(wAll))
      .withColumn("delta", col("v") - coalesce(col("prev_v"), lit(0.0)))
      .select($"dt", $"prev_v", $"delta")
      .as[(String, Option[Double], Double)].collect().toSet
    val lagOut = Windows.dayOverDay(daily, Seq.empty, "dt", "v")
      .select($"dt", $"prev_v", $"delta")
      .as[(String, Option[Double], Double)].collect().toSet
    assert(lagOut == lagRef, "dayOverDay diverged from the global window")

    val rollRef = daily.withColumn("rolling_3",
        sum(col("v")).over(wAll.rowsBetween(-2, 0)))
      .select($"dt", $"rolling_3").as[(String, Double)].collect().toSet
    val rollOut = Windows.rollingSum(daily, Seq.empty, "dt", "v", 3)
      .select($"dt", $"rolling_3").as[(String, Double)].collect().toSet
    assert(rollOut == rollRef, "rollingSum diverged from the global window")

    // and the year-bucketed plan must NOT move everything to one partition:
    // every window exchange hashes on the year bucket
    val p = Windows.rollingSum(daily, Seq.empty, "dt", "v", 3)
      .queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition"),
      "year-bucketed windows must never plan a single-partition exchange:\n" +
        p.take(1200))
  }

  test("TopK.global plans as TakeOrderedAndProject (O3, no global sort)") {
    val df = (1 to 100).map(i => (i.toLong, (i * 37 % 100).toDouble)).toDF("id", "v")
    val top = TopK.global(df, Seq($"v".desc, $"id".asc), 5)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
    assert(top.collect().length == 5)
  }

  test("TopK.perGroup keeps k rows per group with in-group rank") {
    val df = Seq(("a", 1, 5.0), ("a", 2, 4.0), ("a", 3, 3.0), ("b", 4, 1.0))
      .toDF("grp", "id", "v")
    val out = TopK.perGroup(df, Seq("grp"), Seq($"v".desc, $"id".asc), 2)
    assert(out.count() == 3)
    assert(out.filter($"grp" === "a").agg(max("rank_in_group")).as[Int].head() == 2)
  }

  test("scalableCumSum matches a global-window reference across many partitions") {
    val rnd = new scala.util.Random(13)
    // duplicate keys included: RANGE-frame tie semantics must match
    val rows = Seq.fill(500)((rnd.nextInt(80).toLong, rnd.nextInt(5).toLong,
      rnd.nextInt(3).toLong))
    val df = rows.toDF("k", "a", "b")
    val got = Windows.scalableCumSum(df, "k", Seq("a", "b"), numPartitions = 7)
      .select("k", "cum_a", "cum_b").distinct()
      .as[(Long, Long, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("k"))
    val want = df.withColumn("cum_a", sum($"a").over(w))
      .withColumn("cum_b", sum($"b").over(w))
      .select("k", "cum_a", "cum_b").distinct()
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want)
    // row count preserved (one output row per input row)
    assert(Windows.scalableCumSum(df, "k", Seq("a"), 7).count() == 500)
    // empty input stays empty
    assert(Windows.scalableCumSum(df.limit(0), "k", Seq("a"), 7).isEmpty)
  }

  test("scalableCumSumBy matches per-group windows; groups straddle partitions") {
    val rnd = new scala.util.Random(29)
    // 3 groups over 600 rows across 7 range partitions: every group
    // spans several partition boundaries, so the per-(partition, group)
    // offset carry is exercised, not just the single-group delegate path
    val rows = Seq.fill(600)((s"g${rnd.nextInt(3)}",
      rnd.nextInt(60).toLong, rnd.nextInt(5).toLong))
    val df = rows.toDF("g", "k", "a")
    val got = Windows.scalableCumSumBy(df, Seq("g"), "k", Seq("a"), 7)
      .select("g", "k", "cum_a").distinct()
      .as[(String, Long, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("k"))
    val want = df.withColumn("cum_a", sum($"a").over(w))
      .select("g", "k", "cum_a").distinct()
      .as[(String, Long, Long)].collect().toSet
    assert(got == want)
    assert(Windows.scalableCumSumBy(df, Seq("g"), "k", Seq("a"), 7)
      .count() == 600)
  }

  test("set ops: distinct union / intersect / except semantics (U2)") {
    val a = Seq(1, 2, 2, 3).toDF("k")
    val b = Seq(2, 3, 4).toDF("k")
    assert(SetOps.unionDistinct(a, b).as[Int].collect().toSet == Set(1, 2, 3, 4))
    assert(SetOps.intersect(a, b).as[Int].collect().toSet == Set(2, 3))
    assert(SetOps.except(a, b).as[Int].collect().toSet == Set(1))
    assert(SetOps.unionAll(a, b).count() == 7)
  }
}
