package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Agg.{dsum, money, rate}

/** Join operators (SURVEY.md §2.3: J1–J5; J6/J7 live in their own modules).
  *
  * The reference's only joins are merge-procedure semi/anti joins
  * (REF wistia_stored_procedures.py:9-11,54-57) plus the implied star join
  * of fact_events to its dims (schema FKs, wistia_redshift_schemas.py:21,29).
  * Dims are tiny relative to the fact (2 media vs millions of events), so the
  * star join broadcasts — zero shuffle on the fact side at any scale.
  */
object Joins {

  /** J3: fact ⋈ broadcast(dim). The explicit hint keeps the plan broadcast
    * even if stats mislead AQE; dims that outgrow the threshold fall back to
    * sort-merge automatically when the hint is dropped.
    */
  def starJoin(fact: DataFrame, dim: DataFrame, key: String): DataFrame =
    fact.join(broadcast(dim), Seq(key), "inner")

  /** J4 composed: local-supplier revenue by nation within a region — the
    * classic TPC-H Q5 shape over the testdata star schema. All dims
    * broadcast; the only shuffles are lineitem⋈orders (both sides keyed on
    * the join column) and the final aggregation.
    */
  def revenueByNation(lineitem: DataFrame, orders: DataFrame,
                      customer: DataFrame, supplier: DataFrame,
                      nation: DataFrame, region: DataFrame,
                      regionName: String): DataFrame = {
    val one = lit(BigDecimal("1.00")).cast(org.apache.spark.sql.types.DecimalType(4, 2))
    val revenue = money(col("l_extendedprice")) * (one - rate(col("l_discount")))
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === regionName)
      .groupBy(col("n_name"))
      .agg(sum(revenue).cast("double").as("revenue"),
        count(lit(1)).as("n_lineitems"))
  }

  /** J5 left outer: every customer with order count and decimal-exact spend
    * (0 for customers with no orders).
    */
  def customerOrderSummary(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(orders, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .agg(
        count(col("o_orderkey")).as("order_count"),
        coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total_spent"))

  /** J1/J5 anti: rows in `left` with no key match in `right` — the merge
    * procedure's DELETE-matching complement, and the "customers without
    * orders" report.
    */
  def antiJoin(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_anti")

  /** J5 semi: rows in `left` with at least one match (EXISTS). */
  def semiJoin(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_semi")

  /** J6 range join: equi-keys + a range predicate on a time/number column.
    * Keeping at least one equality conjunct is load-bearing at scale: it
    * lets Spark plan a hash/sort-merge join with the range as a cheap
    * post-join filter. A pure range condition (no equality) degenerates to
    * broadcast-nested-loop — if you need that, bucket the range into a join
    * key first (see vector.Similarity for the pattern).
    */
  def rangeJoin(left: DataFrame, right: DataFrame, equiCond: Column,
                rangeCond: Column): DataFrame =
    left.join(right, equiCond && rangeCond)

  /** TPC-H Q21 shape (the hardest classic join pattern): suppliers who
    * were the SOLE late supplier on a multi-supplier finished order,
    * ranked by how many times it happened. The reference SQL needs a
    * correlated EXISTS (another supplier exists on the order) and a
    * correlated NOT EXISTS (no OTHER supplier was late) — three logical
    * scans of lineitem. Spark-first, both correlations fold into TWO
    * COLUMNS of ONE order-keyed aggregate (`n_supp`,
    * `n_late_supp`): a late line qualifies iff its order has ≥2 distinct
    * suppliers and exactly 1 late one (which is then necessarily the
    * line's own). The per-order stats rejoin the late lines on the SAME
    * order key (partitioning reused, AQE flips the stats side to
    * broadcast when small), the supplier dim broadcasts, and the top-k
    * plans as TakeOrderedAndProject. Ties break by name for determinism.
    */
  def waitingSuppliers(lineitem: DataFrame, orders: DataFrame,
                       supplier: DataFrame, lateDays: Int = 60,
                       topK: Int = 10): DataFrame = {
    val lo = lineitem
      .join(orders.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("_late",
        col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"))
    val perOrder = lo.groupBy(col("l_orderkey").as("_ok"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("_late"), col("l_suppkey")))
          .as("n_late_supp"))
    lo.filter(col("_late"))
      .join(perOrder.filter(col("n_supp") >= 2 && col("n_late_supp") === 1),
        col("l_orderkey") === col("_ok"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name")).agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(topK)
  }

  /** TPC-H Q4 shape: order-priority counts over a date window, keeping
    * only orders with at least one line shipped more than `graceDays`
    * after the order date. The correlated EXISTS (inner references
    * `o_orderdate`) becomes a LEFT SEMI join whose inequality rides the
    * order-key equi-join as an extra condition — one hash join, match
    * multiplicity irrelevant by semi-join semantics, no decorrelation
    * machinery. The window filter on orders prunes BEFORE the join.
    */
  def latePriorityCounts(orders: DataFrame, lineitem: DataFrame,
                         from: String, until: String,
                         graceDays: Int = 30): DataFrame =
    orders
      .filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
        col("o_orderdate") < lit(until).cast("timestamp"))
      .join(lineitem,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") +
            expr(s"INTERVAL $graceDays DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))

  /** Point-in-time dimension lookup — the CONSUMER of an SCD2 history
    * ([[graft.ops.Upsert.scd2FromChanges]]): each probe row joins the
    * single history version valid at its timestamp (`valid_from ≤ ts`,
    * and `ts < valid_to` or the version is open). The [[rangeJoin]] rule
    * applies: the dimension keys are the equality conjunct, so this is a
    * hash/sort-merge join with the interval as a post-join filter, and
    * per-probe match work is bounded by that key's version count — the
    * history's intervals partition the key's timeline, so exactly one
    * version matches any in-range probe (zero-duration versions from
    * same-timestamp flips match nothing; their closer does).
    */
  def pointInTimeJoin(probes: DataFrame, history: DataFrame,
                      keys: Seq[String], tsCol: String,
                      histCols: Seq[String]): DataFrame = {
    val p = probes.alias("p")
    val h = history.alias("h")
    val eq = keys.map(k => col(s"p.$k") === col(s"h.$k")).reduce(_ && _)
    val inRange = col(s"p.$tsCol") >= col("h.valid_from") &&
      (col("h.valid_to").isNull || col(s"p.$tsCol") < col("h.valid_to"))
    p.join(h, eq && inRange)
      .select(col("p.*") +: histCols.map(c => col(s"h.$c")): _*)
  }

  /** J6 interval self-join (funnel/attribution): every (fromType → toType)
    * event pair of the same user with `to_ts` inside `[from_ts, from_ts +
    * horizon]` — ALL pairs in the window, not the single nearest match
    * (that is [[graft.ops.AsOfJoin]]'s contract). The equality conjunct on
    * user_id keeps this a hash join with the interval as a post-join
    * filter (the [[rangeJoin]] rule); output is bounded by per-user
    * in-window pair counts, never a cross product.
    *
    * The same plan shape runs unchanged as a watermarked stream-stream
    * join — see [[graft.streaming.EventsStream.funnelPairsStream]], whose
    * full-replay parity with this batch form is spec-pinned. The interval
    * bound on both event-time columns is what lets streaming state expire:
    * an unbounded funnel would accumulate every `fromType` event forever.
    */
  /** Ordered funnel conversion: for each user, the earliest completion of
    * `steps` as a strictly-increasing event-time chain — t1 = first
    * steps(0), t_k = first steps(k−1) AFTER t_{k−1}. Greedy-earliest is
    * COMPLETE for existence: if any ordered chain exists, the earliest
    * one does (each stage's min is ≤ the corresponding event of any
    * witness chain), so the output holds exactly the users who performed
    * the whole sequence in order, with the canonical earliest timestamps.
    *
    * Scale: stage k joins the (filter-pushed) step-k events against the
    * prior stage on user_id and re-aggregates — every shuffle is
    * user-keyed, so the partitioning is reused stage to stage, and the
    * prior-stage side only narrows (funnels converge); when it drops
    * under the broadcast threshold AQE turns the remaining stages into
    * broadcast joins. Cost is one filtered pass over events per step —
    * at 100 TB with `event_type`-partitioned data each pass prunes to
    * its step's partitions.
    */
  def funnelConversion(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnelConversion needs at least one step")
    val first = events.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    steps.zipWithIndex.drop(1).foldLeft(first) { case (prev, (st, i)) =>
      // group on user_id ALONE so every stage reuses the same hash
      // partitioning; the earlier stage timestamps are constant within a
      // user group (prev holds one row per user), so max() carries the
      // value — grouping by (user, t1..ti) instead would re-shuffle on a
      // different composite key at every stage
      val carried = (1 to i).map(j => max(col(s"t$j")).as(s"t$j"))
      events.filter(col("event_type") === st)
        .select(col("user_id"), col("ts"))
        .join(prev, Seq("user_id"))
        .filter(col("ts") > col(s"t$i"))
        .groupBy(col("user_id"))
        .agg(carried.head,
          carried.tail :+ min(col("ts")).as(s"t${i + 1}"): _*)
    }
  }

  def funnelPairs(events: DataFrame, fromType: String, toType: String,
                  horizon: String = "1 hour"): DataFrame = {
    val from = events.filter(col("event_type") === fromType)
      .select(col("user_id"), col("ts").as("from_ts"))
    val to = events.filter(col("event_type") === toType)
      .select(col("user_id").as("_to_uid"), col("ts").as("to_ts"))
    from.join(to,
        col("user_id") === col("_to_uid") &&
        col("to_ts") >= col("from_ts") &&
        col("to_ts") <= col("from_ts") + expr(s"INTERVAL $horizon"))
      .select(col("user_id"), col("from_ts"), col("to_ts"))
  }

  /** The keys [[funnelPairsCapped]] refuses to pair: users contributing
    * more than `maxPerSide` events on EITHER side of the funnel, with
    * their side counts — the investigation/slow-path queue.
    */
  def funnelQuarantine(events: DataFrame, fromType: String, toType: String,
                       maxPerSide: Int): DataFrame =
    events.filter(col("event_type").isin(fromType, toType))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === fromType, 1L).otherwise(0L))
          .as("n_from"),
        sum(when(col("event_type") === toType, 1L).otherwise(0L))
          .as("n_to"))
      .filter(col("n_from") > maxPerSide || col("n_to") > maxPerSide)

  /** [[funnelPairs]] with the hot-key quadratic bound CLOSED. Per user
    * the interval join emits n_from × n_to pairs — one runaway key (a
    * bot, an instrumentation loop replaying views) makes the join
    * quadratic while every honest key stays tiny; at 100 TB that single
    * key is the straggler task that never finishes. Keys over
    * `maxPerSide` on either side emit NO pairs here and surface in
    * [[funnelQuarantine]] instead — quarantine-not-sample, because a
    * capped sample of a bot's pairs is still garbage analytics; the
    * honest output must be exact and the noise must be visible, not
    * diluted.
    *
    * Cost: one user-keyed count aggregate (pre-aggregated map-side, same
    * key as the join's own shuffle) and the hot set — tiny by
    * construction — broadcasts into a left-anti join. No new wide
    * shuffle.
    */
  def funnelPairsCapped(events: DataFrame, fromType: String, toType: String,
                        horizon: String = "1 hour",
                        maxPerSide: Int = 1000): DataFrame =
    funnelPairs(
      events.join(
        broadcast(funnelQuarantine(events, fromType, toType, maxPerSide)
          .select(col("user_id"))),
        Seq("user_id"), "left_anti"),
      fromType, toType, horizon)

  /** J5 extended — TPC-H Q17 shape, per brand: revenue (as the Q17
    * "avg yearly" sum/7) of lineitems whose quantity is below 20% of
    * their part's average quantity. The classic decorrelation trap: the
    * correlated scalar subquery `l_quantity < 0.2 * (SELECT avg(..) WHERE
    * p_partkey = l_partkey)` becomes ONE per-part aggregate joined back —
    * the fact is scanned twice (once to build the averages, once to
    * filter), never once per part.
    *
    * Exactness: the 0.2·avg comparison is the integer cross-multiply
    * `5 · qty · cnt < sum_qty` (quantities are integral longs — no
    * division, no float threshold, no cross-engine boundary noise), and
    * revenue aggregates through [[Agg.dsum]]'s exact scaled-long cents;
    * the final ÷7 is one double division both engines perform on the
    * same exact total. Hash-exact against the oracle's correlated form.
    *
    * The per-part averages frame is |parts touched| rows — catalog-
    * cardinality, so it is left UNHINTED: at bench scale AQE sees the
    * post-aggregate size and broadcasts it anyway; at 100 TB (where
    * |parts| outgrows the threshold) AQE falls back to a shuffled join
    * on l_partkey — the same plan DuckDB runs — instead of a forced
    * OOM-ing broadcast. The dimension join stays hinted: `part` is a
    * true catalog table.
    *
    * Quantity is floor()ed before the integer algebra on BOTH the
    * per-part sum and the cross-multiply filter, matching the oracle's
    * CAST(floor(l_quantity) AS BIGINT): Spark's cast(long) truncates
    * toward zero while DuckDB's CAST rounds to nearest, and the two
    * agree only on integral inputs — floor makes the contract explicit
    * instead of leaning on fixture integrality.
    */
  def smallQuantityRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val qty = floor(col("l_quantity"))
    val perPart = lineitem.groupBy("l_partkey")
      .agg(count(lit(1)).as("_cnt"), sum(qty).as("_sq"))
    lineitem
      .join(perPart, Seq("l_partkey"))
      .filter(qty * 5 * col("_cnt") < col("_sq"))
      .join(broadcast(part.select(col("p_partkey").as("l_partkey"),
        col("p_brand"))), Seq("l_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("small_lines"),
        (dsum(col("l_extendedprice")) / 7).as("avg_yearly"))
  }

  /** TPC-H Q15 shape ("top supplier"): every supplier whose windowed
    * revenue EQUALS the global maximum — the view-then-self-compare
    * pattern (classic SQL creates a revenue view, selects where
    * total = (SELECT MAX FROM view)). Spark-first: the revenue frame is
    * computed ONCE, its 1-row MAX broadcasts back onto it, and equality
    * keeps every tied supplier (ties are the point of the shape — a
    * LIMIT 1 would silently drop co-leaders).
    *
    * Exactness: revenue sums in integer 10⁻⁴ units —
    * `cents(extprice) · (100 − hundredths(discount))` — one long
    * multiply per row, long partial+final SUM, so the MAX-equality
    * decision compares exact integers (a decimal/double revenue would
    * make tie detection engine-dependent). The exported
    * `total_revenue` is one units→double division both engines perform
    * on the same exact integer.
    *
    * Scale: one lineitem scan (date filter pushed to the parquet scan),
    * one supplier-keyed aggregate, a 1-row broadcast, a dim broadcast —
    * no self-join of the fact, no window over the whole frame.
    */
  def topRevenueSupplier(lineitem: DataFrame, supplier: DataFrame,
                         from: String, until: String): DataFrame = {
    val units = Agg.discountedUnits
    // Two consumers read the revenue view (the MAX and the equality
    // probe); it is |suppliers| rows, so materializing it once costs
    // nothing and saves the SECOND full fact scan a naive re-derivation
    // pays — at 100 TB that second scan IS the query's cost.
    val rev = lineitem
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
      .groupBy(col("l_suppkey").as("s_suppkey"))
      .agg(sum(units).as("_u"))
      .localCheckpoint()
    rev.crossJoin(broadcast(rev.agg(max(col("_u")).as("_mx"))))
      .filter(col("_u") === col("_mx"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        Seq("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (col("_u").cast("double") / 10000).as("total_revenue"))
  }

  /** TPC-H Q13 shape ("customer distribution"): how many customers have
    * exactly k orders, INCLUDING k = 0 — the aggregate-of-aggregate
    * pattern over an outer join (the inner left join is what keeps the
    * zero-order customers in the distribution; an inner join silently
    * drops the most interesting bucket). Scale: the first aggregate
    * keys on the customer (full width), the second on the tiny
    * order-count domain — map-side partial aggregation collapses the
    * second shuffle to |distinct counts| rows per mapper, so the
    * narrow-domain key is NOT a skew hazard.
    */
  def customerOrderDistribution(customer: DataFrame,
                                orders: DataFrame): DataFrame =
    customer
      .join(orders.select(col("o_custkey").as("c_custkey"),
        col("o_orderkey")), Seq("c_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))

  /** TPC-H Q18 shape ("large volume customers"): orders whose total line
    * quantity exceeds `minQty`, decorated with their customer and ranked
    * by order value — the HAVING-filtered aggregate joined back to its
    * parents + top-k. Quantity floors through the same contract as
    * [[smallQuantityRevenue]] (explicit, not fixture-coincidence); the
    * per-order aggregate's survivors are a tiny fraction, so AQE
    * broadcasts them onto orders; the top-k plans as
    * TakeOrderedAndProject with (date, orderkey) tie-breaks for
    * determinism.
    */
  def largeVolumeCustomers(lineitem: DataFrame, orders: DataFrame,
                           customer: DataFrame, minQty: Long = 200,
                           topK: Int = 100): DataFrame = {
    val big = lineitem
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(sum(floor(col("l_quantity"))).as("sum_qty"))
      .filter(col("sum_qty") > minQty)
    orders
      .join(big, Seq("o_orderkey"))
      .join(customer.select(col("c_custkey"), col("c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderdate").asc,
        col("o_orderkey").asc)
      .limit(topK)
  }

  /** TPC-H Q6 shape ("forecast revenue change"): the pure
    * filter-and-aggregate — revenue = Σ extprice·discount over a
    * ship-date window, a discount band, and a quantity cap. Every
    * predicate compares integers (discount in hundredths, quantity
    * floored per the q168 contract), so the filtered SET is exact, and
    * the revenue sums in integer 10⁻⁴ units. One scan, every filter
    * pushed; the shape exists to pin that a selective one-table
    * aggregate never grows a join or a shuffle beyond the final 1-row
    * combine.
    */
  def forecastRevenue(lineitem: DataFrame, from: String, until: String,
                      discLo: Long = 5, discHi: Long = 7,
                      maxQty: Long = 24): DataFrame = {
    val hundredths = (rate(col("l_discount")) * 100).cast("long")
    lineitem
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp") &&
        hundredths.between(discLo, discHi) &&
        floor(col("l_quantity")) < maxQty)
      .agg(
        (sum(Agg.cents(col("l_extendedprice")) * hundredths)
          .cast("double") / 10000).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q7 shape ("volume shipping"): trade volume between two named
    * nations in BOTH directions, by supplier nation × customer nation ×
    * ship year. The nation dim joins TWICE (supplier side and customer
    * side — two broadcasts of a 25-row table; supplier and part stay
    * UNHINTED per the q168 discipline — AQE broadcasts them at bench
    * scale, shuffles at 100 TB), the direction filter is
    * the symmetric pair predicate, and volume sums in exact units.
    */
  def nationTradeVolume(lineitem: DataFrame, orders: DataFrame,
                        customer: DataFrame, supplier: DataFrame,
                        nation: DataFrame, n1: String, n2: String,
                        from: String, until: String): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(supplier.select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select(col("n_nationkey").as("s_nationkey"),
        col("n_name").as("supp_nation"))), Seq("s_nationkey"))
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey").as("c_nationkey"),
        col("n_name").as("cust_nation"))), Seq("c_nationkey"))
      .filter((col("supp_nation") === n1 && col("cust_nation") === n2) ||
        (col("supp_nation") === n2 && col("cust_nation") === n1))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg((sum(Agg.discountedUnits).cast("double") / 10000).as("volume"))

  /** TPC-H Q8 shape ("national market share"): of the revenue a REGION's
    * customers spent on a part TYPE per order year, what share came from
    * suppliers of one target nation — the conditional-aggregate ratio
    * (numerator = a `when` inside the same SUM, never a second scan or
    * self-join). Numerator and denominator are exact integer unit sums,
    * so the share is ONE double division of two exact longs — bit-exact
    * cross-engine, no float accumulation.
    */
  def nationalMarketShare(lineitem: DataFrame, orders: DataFrame,
                          customer: DataFrame, supplier: DataFrame,
                          nation: DataFrame, region: DataFrame,
                          part: DataFrame, targetNation: String,
                          regionName: String, pType: String,
                          from: String, until: String): DataFrame =
    lineitem
      .join(part.filter(col("p_type") === pType)
        .select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(orders
        .filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
          col("o_orderdate") < lit(until).cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey").as("c_nationkey"),
        col("n_regionkey"))), Seq("c_nationkey"))
      .join(broadcast(region.filter(col("r_name") === regionName)
        .select(col("r_regionkey").as("n_regionkey"))), Seq("n_regionkey"))
      .join(supplier.select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select(col("n_nationkey").as("s_nationkey"),
        col("n_name").as("supp_nation"))), Seq("s_nationkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(when(col("supp_nation") === targetNation, Agg.discountedUnits)
          .otherwise(lit(0L))).as("_num"),
        sum(Agg.discountedUnits).as("_den"))
      .select(col("o_year"),
        (col("_num").cast("double") / col("_den").cast("double"))
          .as("mkt_share"))

  /** TPC-H Q19 shape ("discounted revenue"): revenue over an OR-of-ANDs
    * join residual — `(brand = A AND qty ∈ r_A) OR (brand = B AND
    * qty ∈ r_B) OR ...` — the disjunctive-predicate pattern optimizers
    * historically mishandled (a naive plan evaluates the whole
    * disjunction as a post-join filter with NO scan-side pruning).
    * Spark-first the predicate stays ONE join condition on the
    * broadcast part dim; Catalyst projects the disjunction onto EACH
    * side's own columns (the qty-range UNION reaches the fact scan, the
    * brand set the dim scan — both visible as DataFilters, PlanSpec-
    * pinned), so each scan is pre-pruned by its side of every disjunct
    * while only the exact cross-side pairing runs post-join. Revenue through the exact
    * scaled-long cents path ([[Agg.dsum]]); quantity floors per the
    * q168 contract.
    */
  def disjunctiveRevenue(lineitem: DataFrame, part: DataFrame,
                         cases: Seq[(String, Long, Long)]): DataFrame = {
    require(cases.nonEmpty, "disjunctiveRevenue: no cases")
    val qty = floor(col("l_quantity"))
    val cond = cases.map { case (brand, lo, hi) =>
      col("p_brand") === brand && qty >= lo && qty <= hi
    }.reduce(_ || _)
    lineitem
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey") && cond)
      .agg(dsum(col("l_extendedprice")).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q22 shape ("global sales opportunity"): customers from a
    * literal market set whose balance beats the positive-balance AVERAGE
    * of that set and who have NO orders — the global-scalar-threshold +
    * NOT-EXISTS pair, the last classic decorrelation shape the suite
    * lacked (Q21 folds correlated EXISTS pairs, Q17 a correlated
    * per-group average, Q4 a riding-inequality semi-join; this one is a
    * GLOBAL scalar + anti-join).
    *
    * "No orders" is measured against a `since` cutoff (lapsed
    * customers) — the classic Q22 spelling is an unconditional NOT
    * EXISTS, but the fixture's order generator covers every customer,
    * so the date-windowed form is what keeps the shape non-vacuous
    * while exercising the identical decorrelation (the anti-join just
    * carries a pushed-down date filter on its build side).
    *
    * Decorrelation: the scalar subquery is ONE 1-row aggregate
    * (count + exact cents sum over positive balances) broadcast onto the
    * filtered dimension; the average comparison is the integer
    * cross-multiply `cents(bal) · n > Σcents` — no division, no float
    * boundary, so the threshold decision is hash-exact cross-engine
    * (the q168/q147 discipline). The NOT EXISTS is a left-anti against
    * the date-filtered orders keyed on the customer key, run AFTER the
    * broadcast filter so the anti-join probes only threshold survivors.
    * Output money is the exact scaled-long cents sum surfaced as double
    * ([[Agg.dsum]]).
    *
    * Scale: customer filtered map-side (nation set is a literal IN), the
    * only shuffle is the anti-join against orders (both sides keyed on
    * custkey — AQE picks broadcast iff survivors fit); overflow bound:
    * cents ≤ 10⁶ per row, so `cents · n` needs n < 9·10¹² customers in
    * the market set — documented, not checked, same posture as
    * [[graft.ops.Graph]]'s scale bound.
    */
  def inactiveHighBalance(customer: DataFrame, orders: DataFrame,
                          nations: Seq[Int],
                          since: String = "2001-01-01"): DataFrame = {
    val cust = customer
      .filter(col("c_nationkey").isin(nations.map(Int.box): _*))
    val thr = cust.filter(col("c_acctbal") > 0)
      .agg(count(lit(1)).as("_n"),
        sum(Agg.cents(col("c_acctbal"))).as("_sc"))
    cust
      .crossJoin(broadcast(thr))
      .filter(Agg.cents(col("c_acctbal")) * col("_n") > col("_sc"))
      .join(orders
        .filter(col("o_orderdate") >= lit(since).cast("timestamp"))
        .select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
        dsum(col("c_acctbal")).as("totacctbal"))
  }
}
