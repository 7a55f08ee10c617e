package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

import graft.ops.Joins
import graft.sources.Tables

/** J1–J5 joins; also asserts the star join actually plans as a broadcast
  * hash join (the 100 TB posture: no shuffle of the fact side).
  */
class JoinsSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("starJoin broadcasts the dim side") {
    val li = Tables.load(spark, sf, "lineitem")
    val pt = Tables.load(spark, sf, "part")
    val out = Joins.starJoin(li.withColumnRenamed("l_partkey", "p_partkey"), pt, "p_partkey")
    out.collect()
    val plan: SparkPlan = out.queryExecution.executedPlan
    assert(collectWithSubqueries(plan) { case b: BroadcastHashJoinExec => b }.nonEmpty,
      s"expected BroadcastHashJoinExec in:\n${plan.toString.take(2000)}")
  }

  test("anti + semi partition the customer set") {
    val cust = Tables.load(spark, sf, "customer")
    val ord = Tables.load(spark, sf, "orders")
    val anti = Joins.antiJoin(cust, ord, $"c_custkey" === $"o_custkey").count()
    val semi = Joins.semiJoin(cust, ord, $"c_custkey" === $"o_custkey").count()
    assert(anti + semi == cust.count())
  }

  test("customerOrderSummary zero-fills customers without orders") {
    val cust = Seq((1L, "a", "SEG"), (2L, "b", "SEG")).toDF("c_custkey", "c_name", "c_mktsegment")
    val ord = Seq((10L, 1L, 100.0)).toDF("o_orderkey", "o_custkey", "o_totalprice")
    val out = Joins.customerOrderSummary(cust, ord)
      .orderBy("c_custkey").collect()
    assert(out(0).getAs[Long]("order_count") == 1L)
    assert(out(0).getAs[Double]("total_spent") == 100.0)
    assert(out(1).getAs[Long]("order_count") == 0L)
    assert(out(1).getAs[Double]("total_spent") == 0.0)
  }

  test("revenueByNation returns one row per nation in the region") {
    val out = Joins.revenueByNation(
      Tables.load(spark, sf, "lineitem"), Tables.load(spark, sf, "orders"),
      Tables.load(spark, sf, "customer"), Tables.load(spark, sf, "supplier"),
      Tables.load(spark, sf, "nation"), Tables.load(spark, sf, "region"),
      "ASIA")
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("revenue") > 0))
  }

  test("funnelConversion: strict order, greedy-earliest chain, dropouts excluded") {
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    val ev = Seq(
      // u1: clean chain
      (1L, "view", 1), (1L, "click", 2), (1L, "purchase", 3),
      // u2: click precedes first view — no click after t1, excluded
      (2L, "click", 1), (2L, "view", 2), (2L, "purchase", 3),
      // u3: no purchase, excluded
      (3L, "view", 1), (3L, "click", 2),
      // u4: same-timestamp step — strict > excludes it
      (4L, "view", 1), (4L, "click", 1), (4L, "purchase", 2),
      // u5: greedy earliest — t1=1, earliest later click=3 (not 10),
      // earliest purchase after 3 is 4
      (5L, "view", 1), (5L, "click", 10), (5L, "view", 2),
      (5L, "click", 3), (5L, "purchase", 4))
      .map { case (u, et, m) => (u, et, ts(m)) }
      .toDF("user_id", "event_type", "ts")
    val got = Joins.funnelConversion(ev, Seq("view", "click", "purchase"))
      .select($"user_id", $"t1", $"t2", $"t3")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, java.sql.Timestamp)]
      .collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got.keySet == Set(1L, 5L), s"got ${got.keySet}")
    assert(got(1L) == ((ts(1), ts(2), ts(3))))
    assert(got(5L) == ((ts(1), ts(3), ts(4))))
  }

  test("funnelPairsCapped quarantines the quadratic key, exact elsewhere") {
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    // u1: honest — 2 views × 1 purchase in horizon = 2 pairs
    // u9: a bot — 5 views and 5 purchases interleaved = 25 pairs uncapped
    val ev = (
      Seq((1L, "view", 1), (1L, "view", 2), (1L, "purchase", 3)) ++
      (0 until 5).flatMap(i =>
        Seq((9L, "view", 2 * i + 1), (9L, "purchase", 2 * i + 2)))
    ).map { case (u, et, m) => (u, et, ts(m)) }
      .toDF("user_id", "event_type", "ts")
    val uncapped = Joins.funnelPairs(ev, "view", "purchase")
    assert(uncapped.filter($"user_id" === 9L).count() == 15) // Σ (5-i)
    val capped = Joins.funnelPairsCapped(ev, "view", "purchase",
      maxPerSide = 4)
    // the honest user's pairs are untouched; the bot emits none
    assert(capped.filter($"user_id" === 1L).count() == 2)
    assert(capped.filter($"user_id" === 9L).count() == 0)
    val quarantine = Joins.funnelQuarantine(ev, "view", "purchase",
      maxPerSide = 4).as[(Long, Long, Long)].collect().toSeq
    assert(quarantine == Seq((9L, 5L, 5L)))
    // the guard must be a BROADCAST anti-join — no new wide shuffle
    val plan = capped.queryExecution.executedPlan
    val anti = collectWithSubqueries(plan) {
      case j: BroadcastHashJoinExec if j.joinType.sql == "LEFT ANTI" => j
    }
    assert(anti.nonEmpty, s"expected a broadcast left-anti guard:\n$plan")
  }

  test("waitingSuppliers: sole-late on multi-supplier orders only") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    // order 1 (F): suppliers 10 late, 20 on time -> supplier 10 counts
    // order 2 (F): both suppliers late -> nobody counts (NOT EXISTS fails)
    // order 3 (F): single supplier, late -> nobody (EXISTS fails)
    // order 4 (O): late sole supplier but order not finished -> nobody
    val li = Seq(
      (1L, 10L, ts("2024-06-01")), (1L, 20L, ts("2024-01-05")),
      (2L, 10L, ts("2024-06-01")), (2L, 20L, ts("2024-06-02")),
      (3L, 30L, ts("2024-06-01")),
      (4L, 10L, ts("2024-06-01")))
      .toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val ord = Seq((1L, "F", ts("2024-01-01")), (2L, "F", ts("2024-01-01")),
      (3L, "F", ts("2024-01-01")), (4L, "O", ts("2024-01-01")))
      .toDF("o_orderkey", "o_orderstatus", "o_orderdate")
    val supp = Seq((10L, "S10"), (20L, "S20"), (30L, "S30"))
      .toDF("s_suppkey", "s_name")
    val out = Joins.waitingSuppliers(li, ord, supp)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq === Seq(("S10", 1L)))
  }

  test("smallQuantityRevenue: floor contract on non-integral qty, <=2 fact scans, no forced broadcast") {
    // Both parts separate floor from round-to-nearest (the DuckDB CAST
    // convention the old cast("long") only accidentally agreed with):
    // part 1, qty 4.7: floor->4 keeps the line (5*4*3=60 < 61); round->5
    // drops it (5*5*3=75 < 62 fails). part 2, qty 2.5 sits exactly on
    // the .5 boundary: floor->2 keeps (5*2*2=20 < 21); round->3 drops
    // (5*3*2=30 < 22 fails).
    val li = Seq(
      (1L, 4.7, 100.0), (1L, 20.0, 200.0), (1L, 37.0, 300.0),
      (2L, 2.5, 50.0), (2L, 19.0, 75.0))
      .toDF("l_partkey", "l_quantity", "l_extendedprice")
    val part = Seq((1L, "B1"), (2L, "B2")).toDF("p_partkey", "p_brand")
    val out = Joins.smallQuantityRevenue(li, part)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    // part 1: floor sums 4+20+37=61; kept lines: 5*4*3=60<61 only
    // part 2: floor sums 2+19=21;   kept lines: 5*2*2=20<21 only
    assert(out === Map("B1" -> ((1L, 100.0 / 7)), "B2" -> ((1L, 50.0 / 7))))

    // plan posture on real parquet: the decorrelated form scans the
    // fact at most twice (classic correlated plan pays three), and the
    // per-part aggregate side carries NO forced broadcast hint — AQE
    // may pick broadcast at this size, but a shuffled fallback must
    // remain legal at 100 TB (the hint would force OOM instead).
    val fact = Tables.load(spark, sf, "lineitem")
    val dim = Tables.load(spark, sf, "part")
    val q = Joins.smallQuantityRevenue(fact, dim)
    val nFactScans = q.queryExecution.executedPlan.toString
      .linesIterator.count(l => l.contains("FileScan") && l.contains("lineitem"))
    assert(nFactScans <= 2, s"expected <=2 lineitem scans, got $nFactScans")
    val hinted = q.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    // exactly one hint: the true catalog dim (part); none on the aggregate
    assert(hinted.size === 1,
      s"only the part dim may be broadcast-hinted, found ${hinted.size}")
    assert(q.count() > 0)
  }

  test("inactiveHighBalance: exact average boundary, anti-join, nation filter") {
    // threshold set: positive balances 10.00, 20.00, 30.00 -> avg 20.00.
    // cents*n > sum  <=>  bal > 20 exactly; customer 2 sits ON the
    // average (2000*3 = 6000, not >) and must be excluded — the integer
    // cross-multiply keeps the boundary exact where a float avg could
    // wobble. Customer 3 (30.00) clears it but has an order -> anti-
    // joined away. Customer 4 (25.00) clears and is orderless -> kept.
    // Customer 4's only order predates the cutoff (LAPSED -> kept);
    // customer 5 is outside the nation set; customer 6 has a negative
    // balance (excluded from the average AND below it).
    val cust = Seq(
      (1L, 10.00, 3), (2L, 20.00, 3), (3L, 30.00, 3),
      (4L, 25.00, 7), (5L, 999.00, 2), (6L, -5.00, 7))
      .toDF("c_custkey", "c_acctbal", "c_nationkey")
    val ord = Seq((100L, 3L, "2001-06-01"), (101L, 4L, "2000-02-01"))
      .toDF("o_orderkey", "o_custkey", "_d")
      .select(col("o_orderkey"), col("o_custkey"),
        to_timestamp(col("_d")).as("o_orderdate"))
    val out = Joins.inactiveHighBalance(cust, ord, nations = Seq(3, 7),
        since = "2001-01-01")
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(out === Map(7 -> ((1L, 25.00))),
      s"only the lapsed above-average in-set customer survives: $out")
  }

  test("topRevenueSupplier keeps ALL tied leaders; window filters; exact units") {
    // suppliers 1 and 2 tie EXACTLY (10.00 @ 5% twice == 19.00 once:
    // 1000*95*2 == 1900*100... pick values that tie in exact units:
    // s1: 10.00 @ 0% + 9.00 @ 0% = 19.00; s2: 19.00 @ 0% -> tie.
    // s3 below; s1 has an out-of-window line that must not count.
    def ts(d: String) = java.sql.Timestamp.valueOf(d + " 00:00:00")
    val li = Seq(
      (1L, 10.00, 0.00, ts("1996-02-01")),
      (1L, 9.00, 0.00, ts("1996-03-01")),
      (1L, 999.00, 0.00, ts("1997-01-01")), // outside window
      (2L, 19.00, 0.00, ts("1996-02-15")),
      (3L, 1.00, 0.50, ts("1996-02-20")))
      .toDF("l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    val supp = Seq((1L, "S1"), (2L, "S2"), (3L, "S3"))
      .toDF("s_suppkey", "s_name")
    val out = Joins.topRevenueSupplier(li, supp,
        from = "1996-01-01", until = "1996-04-01")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet
    assert(out === Set((1L, "S1", 19.00), (2L, "S2", 19.00)),
      s"both exact-tied leaders must survive: $out")
  }

  test("customerOrderDistribution keeps the zero-order bucket") {
    val cust = Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("c_custkey", "c_name")
    val ord = Seq((10L, 1L), (11L, 1L), (12L, 2L))
      .toDF("o_orderkey", "o_custkey")
    val out = Joins.customerOrderDistribution(cust, ord)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // customer 3 has NO orders — the k=0 bucket must exist (the outer
    // join is the point of the shape; an inner join would drop it)
    assert(out === Map(0L -> 1L, 1L -> 1L, 2L -> 1L), s"got $out")
  }

  test("largeVolumeCustomers: threshold on floored qty, value-ranked, ties deterministic") {
    def ts(d: String) = java.sql.Timestamp.valueOf(d + " 00:00:00")
    // order 1: qty 10.9+10.9 -> floor sums to 20 (NOT 22): below 20? no,
    // > 20 is false at exactly 20 -> excluded; order 2: 21 -> included;
    // order 3: 25 but no customer row -> inner join drops it is NOT
    // desired — give every order a customer; orders 2 and 4 tie on
    // totalprice, the earlier date wins the ordering.
    val li = Seq((1L, 10.9), (1L, 10.9), (2L, 21.0), (4L, 30.0))
      .toDF("l_orderkey", "l_quantity")
    val ord = Seq(
      (1L, 1L, 50.0, ts("1996-01-01")),
      (2L, 1L, 99.0, ts("1996-02-01")),
      (4L, 2L, 99.0, ts("1996-01-15")))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val cust = Seq((1L, "C1"), (2L, "C2")).toDF("c_custkey", "c_name")
    val out = Joins.largeVolumeCustomers(li, ord, cust, minQty = 20,
        topK = 10)
      .collect().map(r => (r.getLong(2), r.getString(0), r.getLong(5)))
    assert(out.toSeq === Seq((4L, "C2", 30L), (2L, "C1", 21L)),
      s"tie on totalprice breaks to the earlier date: ${out.toSeq}")
  }

  test("pointInTimeJoin: each probe gets the one version valid at its ts") {
    import graft.ops.Upsert
    // user 1 flips view->click->view; flip at 10:00 has a same-ts pair
    // (view id 4, click id 5) producing a zero-duration view version
    // that must never capture a probe.
    val changes = Seq(
      (1L, "view", "2024-01-01 08:00:00", 1L),
      (1L, "view", "2024-01-01 09:00:00", 2L),
      (1L, "click", "2024-01-01 09:30:00", 3L),
      (1L, "view", "2024-01-01 10:00:00", 4L),
      (1L, "click", "2024-01-01 10:00:00", 5L),
      (2L, "buy", "2024-01-01 08:30:00", 6L))
      .toDF("user_id", "event_type", "tss", "event_id")
      .select(col("user_id"), col("event_type"),
        to_timestamp(col("tss")).as("ts"), col("event_id"))
    val hist = Upsert.scd2FromChanges(changes, Seq("user_id"),
      "event_type", "ts", tieCols = Seq("event_id"))
    val probes = Seq(
      (1L, "2024-01-01 08:30:00"), // inside view v1
      (1L, "2024-01-01 09:30:00"), // exactly at click v2's valid_from
      (1L, "2024-01-01 10:00:00"), // at the same-ts flip: open click v4
      (1L, "2024-01-01 23:00:00"), // open version
      (2L, "2024-01-01 09:00:00"))
      .toDF("user_id", "tss")
      .select(col("user_id"), to_timestamp(col("tss")).as("ts"))
    val out = Joins.pointInTimeJoin(probes,
        hist.withColumnRenamed("event_type", "state"),
        Seq("user_id"), "ts", Seq("version", "state"))
      .orderBy("user_id", "ts")
      .select("user_id", "ts", "version", "state").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString.substring(11, 16),
        r.getLong(2), r.getString(3)))
    // exactly one match per probe — intervals partition the timeline
    assert(out.length === 5)
    assert(out.toSeq === Seq(
      (1L, "08:30", 1L, "view"),
      (1L, "09:30", 2L, "click"),
      (1L, "10:00", 4L, "click"),
      (1L, "23:00", 4L, "click"),
      (2L, "09:00", 1L, "buy")))
  }
}
