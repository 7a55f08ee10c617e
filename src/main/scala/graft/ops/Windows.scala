package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Agg.dsum

/** Window-function operators (SURVEY.md §2.5: W1–W4; W1 lives in [[Dedup]]).
  *
  * None exist in the reference code, but they are the engine-native form of
  * its reporting semantics: "top videos by engagement" (docx Business
  * Objective), day-over-day engagement movement, and the 7-day production
  * window (docx FR8).
  *
  * Determinism rule (same as Dedup.firstWins): every orderBy used under a
  * ranking function must be a total order, or the rank is
  * partition-dependent. All helpers here take explicit tiebreak columns.
  */
object Windows {

  /** W2: rank/dense_rank/ntile of rows within a partition. */
  def ranked(df: DataFrame, partition: Seq[String], order: Seq[Column],
             buckets: Int = 4): DataFrame = {
    val w = Window.partitionBy(partition.map(col): _*).orderBy(order: _*)
    df.withColumn("rank", rank().over(w))
      .withColumn("dense_rank", dense_rank().over(w))
      .withColumn("ntile", ntile(buckets).over(w))
  }

  /** Year-bucketed exact evaluation of a GLOBAL date-ordered window whose
    * frame needs at most `carry` preceding rows: partition by
    * year(dateCol), prepend each year's last `carry` rows to the next
    * PRESENT year's partition (gap years skip forward, exactly like the
    * global order does), evaluate the caller's window expressions
    * per-year, and drop the carry rows. Output-identical to the
    * partition-less window while the shuffle scales with years — this is
    * the asOfBucketed carry pattern at daily grain, and it kills Spark's
    * "No Partition Defined for Window" move-everything-to-one-partition
    * plan (the warning noise BASELINE.md's bench tail used to carry).
    *
    * The distinct-years collect is bounded by the calendar (a daily-grain
    * frame has ~1 row per day; even a century is 100 values) — the same
    * bounded-small-by-construction argument as the IVF centroid collect.
    */
  private def yearBucketed(daily: DataFrame, dateCol: String, carry: Int)(
      eval: (DataFrame, org.apache.spark.sql.expressions.WindowSpec)
        => DataFrame): DataFrame = {
    // CONSUMER-COUNT CONTRACT: `daily` is evaluated three times (the
    // years collect, the base rows, the carry rows). Both materialization
    // forms were measured at sf0.1 and REJECTED: localCheckpoint's eager
    // job costs +0.2 s of pure scheduling and persist's cache boundary
    // +0.12 s of columnar round-trip — more than the re-run of a daily
    // aggregate at any tested SF. At cluster scale the input to this
    // family is an at-rest gold daily table (the medallion design), so
    // the three evaluations are three reads of ~1 row/day parquet, not
    // three corpus scans; a caller windowing over an EXPENSIVE lazy
    // upstream should persist it first.
    val years = daily.select(year(col(dateCol)).as("_yr")).distinct()
      .collect().map(_.getInt(0)).sorted
    val succ: Map[Int, Int] = years.zip(years.drop(1)).toMap
    val base = daily.withColumn("_yr", year(col(dateCol)))
      .withColumn("_is_carry", lit(0))
    val wTail = Window.partitionBy(col("_yr")).orderBy(col(dateCol).desc)
    val carries = base
      .withColumn("_rnd", row_number().over(wTail))
      .filter(col("_rnd") <= carry).drop("_rnd")
      // try_element_at: ANSI mode makes plain element_at THROW on a
      // missing key, and the last year's tail has no successor by design
      .withColumn("_yr", try_element_at(typedLit(succ), col("_yr")))
      .filter(col("_yr").isNotNull) // last year's tail carries nowhere
      .withColumn("_is_carry", lit(1))
    // carry sorts before any real row of equal date cannot happen (dates
    // are unique at daily grain and a carry comes from an earlier year),
    // so ordering by date alone stays total
    val w = Window.partitionBy(col("_yr")).orderBy(col(dateCol))
    eval(base.unionByName(carries), w)
      .filter(col("_is_carry") === 0).drop("_yr", "_is_carry")
  }

  /** W3: day-over-day delta of a daily decimal-exact measure.
    * Input must already be at daily grain; output adds prev/delta columns.
    * The lag and the subtraction stay in decimal, so the surfaced double is
    * engine-independent.
    *
    * With an empty `partition` the global window evaluates through
    * [[yearBucketed]] (carry = 1 row): identical output, year-keyed
    * shuffle instead of a single-partition sort.
    */
  def dayOverDay(daily: DataFrame, partition: Seq[String], dateCol: String,
                 measureCol: String): DataFrame = {
    def eval(df: DataFrame,
             w: org.apache.spark.sql.expressions.WindowSpec): DataFrame =
      df.withColumn("prev_" + measureCol, lag(col(measureCol), 1).over(w))
        .withColumn("delta",
          col(measureCol) - coalesce(col("prev_" + measureCol), lit(0.0)))
    if (partition.nonEmpty)
      eval(daily,
        Window.partitionBy(partition.map(col): _*).orderBy(col(dateCol)))
    else yearBucketed(daily, dateCol, carry = 1)(eval)
  }

  /** W4: trailing k-row rolling sum of a daily measure (rows-based frame;
    * with contiguous days this is the k-day rolling window — the docx FR8
    * 7-day production window when k=7).
    *
    * With an empty `partition` the global window evaluates through
    * [[yearBucketed]] (carry = k−1 rows): identical output, year-keyed
    * shuffle instead of a single-partition sort.
    */
  def rollingSum(daily: DataFrame, partition: Seq[String], dateCol: String,
                 measureCol: String, k: Int): DataFrame = {
    def eval(df: DataFrame,
             w: org.apache.spark.sql.expressions.WindowSpec): DataFrame =
      df.withColumn(s"rolling_${k}",
        sum(col(measureCol)).over(w.rowsBetween(-(k - 1), 0)))
    if (partition.nonEmpty)
      eval(daily,
        Window.partitionBy(partition.map(col): _*).orderBy(col(dateCol)))
    else yearBucketed(daily, dateCol, carry = k - 1)(eval)
  }

  /** Daily decimal-exact order totals — shared input for W3/W4 demos. */
  def dailyOrderTotals(orders: DataFrame): DataFrame =
    orders.groupBy(to_date(col("o_orderdate")).as("dt"))
      .agg(dsum(col("o_totalprice")).as("day_total"),
        count(lit(1)).as("n_orders"))

  /** Global cumulative sums WITHOUT a single-partition sort — the
    * general-orderable-key sibling of [[yearBucketed]] (which is the
    * calendar-axis special case). Adds one `cum_<c>` LONG column per
    * entry of `sumCols` (the inputs must be integral — the offsets
    * round-trip through driver longs, which would not be exact for
    * floats).
    *
    * Plan shape: range-repartition on `orderCol`, cumulate within each
    * partition in parallel (a window PARTITIONED by the physical
    * partition id — never one global sort partition), then add each
    * partition's prior-partitions offset. The per-partition totals land
    * on the driver — bounded by the partition count, the
    * centroid/codebook discipline — and rejoin as one broadcast.
    *
    * Tie semantics: equal `orderCol` values share a cumulative value
    * (the default RANGE frame), i.e. "sum over rows ≤ v" — CDF
    * semantics. The range partitioner assigns equal keys to one
    * partition, so a tie group never straddles an offset boundary.
    */
  def scalableCumSum(df: DataFrame, orderCol: String, sumCols: Seq[String],
                     numPartitions: Int = 0): DataFrame =
    scalableCumSumBy(df, Nil, orderCol, sumCols, numPartitions)

  /** Per-group [[scalableCumSum]]: cumulative sums restart at each
    * distinct `groupCols` combination, still with no single-partition
    * sort and ONE range shuffle for every group at once (range keys =
    * groupCols ++ orderCol, so each group is contiguous across the
    * partition sequence and ties stay inside one partition). A group may
    * straddle partitions — offsets are tracked per (partition, group) —
    * but the per-partition window stays physically local, so a skewed
    * group parallelizes across partitions instead of pinning one task.
    * The driver-side totals are bounded by `numPartitions + |groups| − 1`
    * rows (contiguity: at most one group spans each partition boundary).
    *
    * Group keys must be NON-NULL: the offset rejoin is a plain equi-join
    * and a NULL key would silently lose its cross-partition carry.
    */
  def scalableCumSumBy(df: DataFrame, groupCols: Seq[String],
                       orderCol: String, sumCols: Seq[String],
                       numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions
    // checkpoint pins BOTH consumers (cumulate + totals) to one physical
    // partitioning, and makes spark_partition_id stable by construction
    val parts = df
      .repartitionByRange(n, (groupCols :+ orderCol).map(col): _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val keyCols = "_pid" +: groupCols
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
    val withCum = sumCols.foldLeft(parts)((d, c) =>
      d.withColumn(s"cum_$c", sum(col(c).cast("long")).over(w)))
    val g = groupCols.length
    val totals = parts.groupBy(keyCols.map(col): _*)
      .agg(sum(col(sumCols.head).cast("long")).as(sumCols.head),
        sumCols.tail.map(c => sum(col(c).cast("long")).as(c)): _*)
      .collect()
      .map(r => (r.getInt(0), (1 to g).map(r.get),
        sumCols.indices.map(i => r.getLong(1 + g + i))))
      .sortBy(_._1)
    // each (partition, group)'s offset = that group's totals in
    // strictly-earlier partitions
    val offRows = {
      val acc = scala.collection.mutable.Map
        .empty[Seq[Any], IndexedSeq[Long]]
      totals.map { case (pid, key, t) =>
        val prev = acc.getOrElse(key, sumCols.map(_ => 0L).toIndexedSeq)
        acc(key) = prev.zip(t).map { case (a, b) => a + b }
        org.apache.spark.sql.Row.fromSeq((pid +: key) ++ prev)
      }
    }
    val offSchema = org.apache.spark.sql.types.StructType(
      (org.apache.spark.sql.types.StructField("_pid",
        org.apache.spark.sql.types.IntegerType) +:
        groupCols.map(c => df.schema(c))) ++
        sumCols.map(c => org.apache.spark.sql.types.StructField(s"_off_$c",
          org.apache.spark.sql.types.LongType)))
    val offDf = spark.createDataFrame(
      java.util.Arrays.asList(offRows: _*), offSchema)
    val joined = withCum.join(broadcast(offDf), keyCols, "left")
    sumCols.foldLeft(joined)((d, c) =>
      d.withColumn(s"cum_$c",
        col(s"cum_$c") + coalesce(col(s"_off_$c"), lit(0L))))
      .drop("_pid")
      .drop(sumCols.map(c => s"_off_$c"): _*)
  }
}
