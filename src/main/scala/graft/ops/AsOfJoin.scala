package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY.md §2.3 J6): for each probe row, the most recent quote
  * row with quote.time <= probe.time, per key. Inner semantics: probes with
  * no preceding quote are dropped (matches DuckDB ASOF JOIN).
  *
  * Implementation is the scalable union+window form, NOT a range cross join:
  * tag both sides, union, and take `last(quote_col, ignoreNulls)` over a
  * (key, time)-sorted running frame. One hash shuffle on the key + one
  * per-partition sort — the same cost envelope as a sort-merge join, with no
  * candidate-pair explosion regardless of how many probes share a key. This
  * is the plan that survives 100 TB; a `probe.t >= quote.t` theta-join would
  * degenerate to a broadcast nested loop.
  *
  * Caller contract: probe and quote column names must be disjoint apart from
  * `keys` (rename before calling); quote rows are totally ordered within a
  * key by `quoteTime`.
  */
object AsOfJoin {

  def asOf(probes: DataFrame, quotes: DataFrame, keys: Seq[String],
           probeTime: String, quoteTime: String): DataFrame = {
    val pOnly = probes.columns.filterNot(keys.contains)
    val qOnly = quotes.columns.filterNot(keys.contains)

    val pSide = probes.select(
      keys.map(col) ++
        pOnly.map(col) ++
        qOnly.map(c => lit(null).cast(quotes.schema(c).dataType).as(c)) ++
        Seq(col(probeTime).as("_t"), lit(1).as("_is_probe")): _*)
    // A NULL-time quote can never satisfy probe.t >= quote.t (ASOF
    // semantics); without this filter it would sort to the frame start
    // (nulls-first) and become a universal fallback match.
    val qSide = quotes.filter(col(quoteTime).isNotNull).select(
      keys.map(col) ++
        pOnly.map(c => lit(null).cast(probes.schema(c).dataType).as(c)) ++
        qOnly.map(col) ++
        Seq(col(quoteTime).as("_t"), lit(0).as("_is_probe")): _*)

    // Quote sorts before probe at equal time (_is_probe asc) → ">=" semantics.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc, col("_is_probe").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // Fill the quote columns as ONE struct, not column-by-column: per-column
    // last(ignoreNulls) would backfill a NULL field of the matched quote
    // from an OLDER quote, synthesizing a row that never existed — and
    // per-column isNotNull match detection would drop probes whose true
    // match merely had a null field.
    val unioned = pSide.unionByName(qSide)
      .withColumn("_quote",
        when(col("_is_probe") === 0, struct(qOnly.map(col).toIndexedSeq: _*)))
      .withColumn("_quote", last(col("_quote"), ignoreNulls = true).over(w))
    unioned
      .filter(col("_is_probe") === 1 && col("_quote").isNotNull)
      .select(keys.map(col) ++ pOnly.map(col) ++
        qOnly.map(c => col(s"_quote.$c").as(c)): _*)
  }

  /** FORWARD as-of: each probe matched to the NEAREST quote at or AFTER
    * its time (smallest quote.t ≥ probe.t) — next-event attribution: the
    * campaign a signup is credited to, the next price revision a trade
    * settles against. Same linear union+window plan as [[asOf]] with the
    * time axis REVERSED (descending sort, running frame) — deliberately
    * not a min-over-following frame, which Spark re-evaluates per row
    * (the quadratic shrinking-frame trap the SCD2 restructure removed).
    * Quote still sorts before probe at equal time, so "<=" is inclusive.
    * Same caller contract as [[asOf]].
    */
  def asOfForward(probes: DataFrame, quotes: DataFrame, keys: Seq[String],
                  probeTime: String, quoteTime: String): DataFrame = {
    val pOnly = probes.columns.filterNot(keys.contains)
    val qOnly = quotes.columns.filterNot(keys.contains)
    val pSide = probes.select(
      keys.map(col) ++
        pOnly.map(col) ++
        qOnly.map(c => lit(null).cast(quotes.schema(c).dataType).as(c)) ++
        Seq(col(probeTime).as("_t"), lit(1).as("_is_probe")): _*)
    val qSide = quotes.filter(col(quoteTime).isNotNull).select(
      keys.map(col) ++
        pOnly.map(c => lit(null).cast(probes.schema(c).dataType).as(c)) ++
        qOnly.map(col) ++
        Seq(col(quoteTime).as("_t"), lit(0).as("_is_probe")): _*)
    // desc_nulls_first, not plain desc: a NULL-time probe must sort to the
    // FRAME START and see no quote (dropped — NULL <= t is never true),
    // exactly as asOf's ascending order drops it nulls-first; Spark's
    // default desc puts NULLs last, where the running frame holds every
    // quote and the probe would bind to the key's earliest quote.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").desc_nulls_first, col("_is_probe").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val unioned = pSide.unionByName(qSide)
      .withColumn("_quote",
        when(col("_is_probe") === 0, struct(qOnly.map(col).toIndexedSeq: _*)))
      .withColumn("_quote", last(col("_quote"), ignoreNulls = true).over(w))
    unioned
      .filter(col("_is_probe") === 1 && col("_quote").isNotNull)
      .select(keys.map(col) ++ pOnly.map(col) ++
        qOnly.map(c => col(s"_quote.$c").as(c)): _*)
  }

  /** Scale variant of [[asOf]]: partitions by (key, time-bucket) instead of
    * key alone. The plain form concentrates each key's ENTIRE probe+quote
    * history into one window partition — with low key cardinality (a handful
    * of event types) that is one single-reducer sort per key at 100 TB. Here
    * the time axis is split into `bucketSeconds`-wide buckets, so partition
    * count scales with keys × buckets and each partition sorts only its own
    * slice.
    *
    * Correctness across bucket boundaries: a probe early in bucket b may
    * need the last quote from an earlier bucket. That boundary quote is
    * carried over explicitly — per (key, bucket) take the bucket's last
    * quote (max_by over quoteTime), then a running `last` over the TINY
    * per-bucket summary (one row per key×bucket, ordered by bucket, frame
    * ending at -1) yields the carried-in quote, which is injected into the
    * bucket's partition as an ordinary quote row (its own time is strictly
    * before the bucket start, so it sorts first). Result is row-identical to
    * [[asOf]]; same caller contract.
    */
  def asOfBucketed(probes: DataFrame, quotes: DataFrame, keys: Seq[String],
                   probeTime: String, quoteTime: String,
                   bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive: $bucketSeconds")
    val pOnly = probes.columns.filterNot(keys.contains)
    val qOnly = quotes.columns.filterNot(keys.contains)
    def bucketOf(c: org.apache.spark.sql.Column) =
      floor(unix_timestamp(c.cast("timestamp")) / bucketSeconds)

    val q0 = quotes.filter(col(quoteTime).isNotNull)
    val keyCols = keys.map(col)

    // Last quote per (key, bucket) — one struct row per populated bucket.
    val lastPerBucket = q0
      .withColumn("_bucket", bucketOf(col(quoteTime)))
      .groupBy(keyCols :+ col("_bucket"): _*)
      .agg(max_by(struct(qOnly.map(col).toIndexedSeq: _*), col(quoteTime)).as("_last_q"))

    // Every (key, bucket) either side touches; the carried-in quote for each
    // is the running last over strictly-earlier buckets. This window runs on
    // the per-bucket SUMMARY (|keys| × |buckets| rows), not the data.
    val allBuckets = probes
      .select(keyCols :+ bucketOf(col(probeTime)).as("_bucket"): _*)
      .union(q0.select(keyCols :+ bucketOf(col(quoteTime)).as("_bucket"): _*))
      .distinct()
    val wCarry = Window.partitionBy(keyCols: _*).orderBy(col("_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carried = allBuckets
      .join(lastPerBucket, keys :+ "_bucket", "left")
      .withColumn("_carried", last(col("_last_q"), ignoreNulls = true).over(wCarry))
      .filter(col("_carried").isNotNull)

    val pSide = probes.select(
      keyCols ++ pOnly.map(col) ++
        qOnly.map(c => lit(null).cast(quotes.schema(c).dataType).as(c)) ++
        Seq(col(probeTime).as("_t"), bucketOf(col(probeTime)).as("_bucket"),
          lit(1).as("_is_probe")): _*)
    val qSideIn = q0.select(
      keyCols ++ pOnly.map(c => lit(null).cast(probes.schema(c).dataType).as(c)) ++
        qOnly.map(col) ++
        Seq(col(quoteTime).as("_t"), bucketOf(col(quoteTime)).as("_bucket"),
          lit(0).as("_is_probe")): _*)
    // The carried quote keeps its ORIGINAL time (a field of the struct) —
    // strictly before this bucket's start, so it sorts before every
    // in-bucket row of either side.
    val qSideCarried = carried.select(
      keyCols ++ pOnly.map(c => lit(null).cast(probes.schema(c).dataType).as(c)) ++
        qOnly.map(c => col(s"_carried.$c").as(c)) ++
        Seq(col(s"_carried.$quoteTime").cast(
            quotes.schema(quoteTime).dataType).as("_t"),
          col("_bucket"), lit(0).as("_is_probe")): _*)

    val w = Window.partitionBy(keyCols :+ col("_bucket"): _*)
      .orderBy(col("_t").asc, col("_is_probe").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    pSide.unionByName(qSideIn).unionByName(qSideCarried)
      .withColumn("_quote",
        when(col("_is_probe") === 0, struct(qOnly.map(col).toIndexedSeq: _*)))
      .withColumn("_quote", last(col("_quote"), ignoreNulls = true).over(w))
      .filter(col("_is_probe") === 1 && col("_quote").isNotNull)
      .select(keyCols ++ pOnly.map(col) ++
        qOnly.map(c => col(s"_quote.$c").as(c)): _*)
  }

  /** Append a batch's per-key row counts to a persisted stats table —
    * the piece [[asOfAuto]]'s count probe was substituting for. Fold
    * this into the same daily job that appends the data (the
    * `dailySketches` pattern: one extra map-side-combined aggregate over
    * rows the job already scanned) and the stats stay current without
    * ever rescanning the table. Readers SUM per key across delta rows,
    * so appends never rewrite history; compact the stats table on the
    * data table's compaction cadence if delta count ever matters (it is
    * |keys| × appends rows — tiny).
    */
  def appendKeyStats(batch: DataFrame, keys: Seq[String], dir: String): Unit =
    batch.groupBy(keys.map(col): _*).agg(count(lit(1)).as("_n"))
      .write.mode("append").parquet(dir)

  /** Hottest-key row count summed across the given stats tables
    * ([[appendKeyStats]] output), or None when any directory is missing
    * (caller falls back to scanning). The read costs one pass over
    * |keys| × appends stat rows — independent of data size, which is the
    * point: at 100 TB the dispatch consults kilobytes, not the tables.
    */
  def hottestFromStats(dirs: Seq[String], keys: Seq[String]): Option[Long] =
    dirs match {
      case Nil => None
      case ds =>
        val spark = org.apache.spark.sql.SparkSession.active
        if (!ds.forall(graft.sources.Tables.pathExists(spark, _))) None
        else {
          val hottest = ds.map(spark.read.parquet(_))
            .reduce(_.unionByName(_))
            .groupBy(keys.map(col): _*).agg(sum(col("_n")).as("_n"))
            .agg(max(col("_n"))).head().get(0)
          Some(Option(hottest).map(_.asInstanceOf[Long]).getOrElse(0L))
        }
    }

  /** Stats-fed dispatch between [[asOf]] and [[asOfBucketed]] — the
    * SCALE.md crossover rule ("stay plain while the hottest key fits one
    * task's sort") applied mechanically: the hottest key count across
    * both sides decides, and the bucketed form is chosen only when it
    * exceeds `maxKeyRows`. Both branches are row-identical, so the
    * dispatch can never change results, only the plan (spec-asserted
    * both ways).
    *
    * Where the count comes from, in preference order:
    *  1. `statsDirs` — persisted [[appendKeyStats]] tables (normally one
    *     per side), maintained at ingest. The dispatch then reads
    *     kilobytes of stats instead of scanning either side — the right
    *     mode for repeated dispatches over at-rest tables.
    *  2. Fallback (statsDirs empty or a directory missing): one
    *     partial+final count over both sides' keys — map-side combined
    *     onto |keys| rows, negligible next to the join it sizes, but it
    *     IS a full scan of both inputs; fine when the join follows
    *     immediately, wasteful as a steady state.
    *
    * Caller contract for statsDirs: the stats must cover exactly the
    * rows being joined (same filters); stale stats route, not corrupt —
    * the worst case is a suboptimal plan, never a wrong result.
    *
    * Default threshold 10 M ≈ a few GB at typical row widths, the
    * one-task in-memory sort budget from SCALE.md; tune it with the
    * cluster's task size.
    */
  def asOfAuto(probes: DataFrame, quotes: DataFrame, keys: Seq[String],
               probeTime: String, quoteTime: String, bucketSeconds: Long,
               maxKeyRows: Long = 10000000L,
               statsDirs: Seq[String] = Nil): DataFrame = {
    val keyCols = keys.map(col)
    val hot = hottestFromStats(statsDirs, keys).getOrElse {
      val hottest = probes.select(keyCols: _*)
        .unionByName(quotes.select(keyCols: _*))
        .groupBy(keyCols: _*).agg(count(lit(1)).as("_n"))
        .agg(max(col("_n"))).head().get(0)
      Option(hottest).map(_.asInstanceOf[Long]).getOrElse(0L)
    }
    if (hot > maxKeyRows)
      asOfBucketed(probes, quotes, keys, probeTime, quoteTime, bucketSeconds)
    else
      asOf(probes, quotes, keys, probeTime, quoteTime)
  }
}
