package graft

import org.apache.spark.sql.functions._

import graft.incr.Incremental
import graft.ops.AsOfJoin
import graft.sources.PagedSource
import graft.sources.PagedSource.{Checkpoint, Page, PagedApi}

/** J6 as-of join, T1–T6 incremental watermarks, S1–S4 paged-source algebra. */
class AsOfIncrementalSpec extends SparkSpec {
  import spark.implicits._

  test("asOf picks the latest quote at-or-before each probe, inner semantics (J6)") {
    val probes = Seq(("a", 5L, "p1"), ("a", 10L, "p2"), ("a", 1L, "p0"), ("b", 3L, "p3"))
      .toDF("k", "pt", "tag")
    val quotes = Seq(("a", 4L, 100.0), ("a", 9L, 200.0), ("b", 99L, 300.0))
      .toDF("k", "qt", "v")
    val out = AsOfJoin.asOf(probes, quotes, Seq("k"), "pt", "qt")
      .select("tag", "qt", "v").as[(String, Long, Double)].collect().toSet
    // p0 has no preceding quote -> dropped; b's quote is in the future -> dropped
    assert(out == Set(("p1", 4L, 100.0), ("p2", 9L, 200.0)))
  }

  test("asOf matches a quote at exactly the probe time (>= boundary)") {
    val probes = Seq(("a", 5L)).toDF("k", "pt")
    val quotes = Seq(("a", 5L, 1.0)).toDF("k", "qt", "v")
    val out = AsOfJoin.asOf(probes, quotes, Seq("k"), "pt", "qt").collect()
    assert(out.length == 1 && out.head.getAs[Double]("v") == 1.0)
  }

  test("asOfForward picks the earliest quote at-or-after, mirror of asOf (J6)") {
    val probes = Seq(("a", 5L, "p1"), ("a", 10L, "p2"), ("a", 1L, "p0"), ("b", 3L, "p3"))
      .toDF("k", "pt", "tag")
    val quotes = Seq(("a", 4L, 100.0), ("a", 9L, 200.0), ("b", 99L, 300.0))
      .toDF("k", "qt", "v")
    val out = AsOfJoin.asOfForward(probes, quotes, Seq("k"), "pt", "qt")
      .select("tag", "qt", "v").as[(String, Long, Double)].collect().toSet
    // p1(5) -> next quote 9; p0(1) -> 4; p2(10) has none ahead -> dropped;
    // b's future quote now matches p3
    assert(out == Set(("p1", 9L, 200.0), ("p0", 4L, 100.0),
      ("p3", 99L, 300.0)))
    // "<=" boundary is inclusive
    val eq = AsOfJoin.asOfForward(
      Seq(("a", 5L)).toDF("k", "pt"),
      Seq(("a", 5L, 1.0)).toDF("k", "qt", "v"), Seq("k"), "pt", "qt")
      .collect()
    assert(eq.length == 1 && eq.head.getAs[Double]("v") == 1.0)
    // a NULL-time probe matches nothing (NULL <= t is never true) — under
    // plain desc it would sort to the frame END and bind to the earliest
    // quote (the nulls-last fallback-match hazard)
    val nullProbe = AsOfJoin.asOfForward(
      Seq(("a", Some(5L), "ok"), ("a", None, "nil"))
        .toDF("k", "pt", "tag"),
      Seq(("a", 9L, 1.0)).toDF("k", "qt", "v"), Seq("k"), "pt", "qt")
      .select("tag").collect().map(_.getString(0)).toSeq
    assert(nullProbe == Seq("ok"), s"null-time probe must drop: $nullProbe")
    // mirror property on randomized data: forward(t) == backward(-t)
    val rnd = new scala.util.Random(7)
    val ps = (1 to 120).map(i =>
      ("k" + rnd.nextInt(3), rnd.nextInt(200).toLong, s"p$i"))
      .toDF("k", "pt", "tag")
    val qs = (1 to 60).map(i =>
      ("k" + rnd.nextInt(3), rnd.nextInt(200).toLong, rnd.nextDouble()))
      .toDF("k", "qt", "v")
    // negate, run backward, un-negate — quotes at EQUAL (k, qt) must first
    // collapse per the caller's total-order contract; keep the max v so
    // both directions see the same representative
    val qsDedup = qs.groupBy("k", "qt").agg(max("v").as("v"))
    val fwd = AsOfJoin.asOfForward(ps, qsDedup, Seq("k"), "pt", "qt")
      .select("tag", "qt", "v").as[(String, Long, Double)].collect().toSet
    val mirrored = AsOfJoin.asOf(
      ps.withColumn("pt", -col("pt")),
      qsDedup.withColumn("qt", -col("qt")), Seq("k"), "pt", "qt")
      .select(col("tag"), (-col("qt")).as("qt"), col("v"))
      .as[(String, Long, Double)].collect().toSet
    assert(fwd == mirrored, "forward must equal time-mirrored backward")
  }

  test("asOfBucketed is row-identical to asOf on randomized data, all bucket widths (J6)") {
    // Property check: the bucketed scale variant must agree with the plain
    // form for bucket widths smaller than quote gaps (forces carried-in
    // quotes across many empty buckets), comparable to them, and much
    // larger (single bucket = degenerate case).
    val rnd = new scala.util.Random(20260812L)
    val keys = Seq("a", "b", "c", "d")
    val probes = (1 to 400)
      .map(i => (keys(rnd.nextInt(keys.size)), rnd.nextInt(2000).toLong, s"p$i"))
      .toDF("k", "pt", "tag")
    // caller contract: quote times unique within a key
    val quotes = keys.take(3).flatMap { k => // key "d" gets NO quotes at all
      rnd.shuffle((0 until 2000).toList).take(50)
        .map(qt => (k, qt.toLong, rnd.nextDouble()))
    }.toDF("k", "qt", "v")

    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select("k", "tag", "pt", "qt", "v").collect()
        .map(_.mkString("|")).sorted.toSeq

    val expected = canon(AsOfJoin.asOf(probes, quotes, Seq("k"), "pt", "qt"))
    assert(expected.nonEmpty)
    for (bucket <- Seq(1L, 7L, 64L, 500L, 1000000L)) {
      val got = canon(AsOfJoin.asOfBucketed(probes, quotes, Seq("k"), "pt", "qt",
        bucketSeconds = bucket))
      assert(got == expected, s"bucketSeconds=$bucket diverged from plain asOf")
    }
  }

  test("asOfBucketed edge cases: boundary quotes, equal-ts ties, probe-only buckets (J6)") {
    // bucketSeconds=10; buckets are [0,10) [10,20) [20,30) [30,40) [40,50)
    val probes = Seq(
      ("a", 5L, "equalTs"),        // quote at exactly t=5 → matches it (>=)
      ("a", 10L, "atBucketStart"), // quote at exactly the bucket boundary t=10
      ("a", 25L, "probeOnlyBucket"), // [20,30) has no quotes → carry from t=15
      ("a", 45L, "carriedBoundary"), // [40,50) empty → carry t=30 (a boundary quote)
      ("a", 3L, "noQuoteYet"),     // before every quote → dropped
      ("b", 100L, "keyWithoutQuotes") // dropped
    ).toDF("k", "pt", "tag")
    val quotes = Seq(
      ("a", 5L, 1.0), ("a", 9L, 2.0), ("a", 10L, 2.5),
      ("a", 15L, 3.0), ("a", 30L, 4.0)
    ).toDF("k", "qt", "v")

    val out = AsOfJoin.asOfBucketed(probes, quotes, Seq("k"), "pt", "qt", 10L)
      .select("tag", "qt", "v").as[(String, Long, Double)].collect().toSet
    assert(out == Set(
      ("equalTs", 5L, 1.0),
      ("atBucketStart", 10L, 2.5),
      ("probeOnlyBucket", 15L, 3.0),
      ("carriedBoundary", 30L, 4.0)))
    // and identical to the plain form
    val plain = AsOfJoin.asOf(probes, quotes, Seq("k"), "pt", "qt")
      .select("tag", "qt", "v").as[(String, Long, Double)].collect().toSet
    assert(out == plain)
  }

  test("asOfAuto dispatches by hottest-key cardinality; results identical either way (J6)") {
    val probes = Seq(("a", 5L, "p1"), ("a", 10L, "p2"), ("b", 3L, "p3"))
      .toDF("k", "pt", "tag")
    val quotes = Seq(("a", 4L, 100.0), ("a", 9L, 200.0), ("b", 2L, 300.0))
      .toDF("k", "qt", "v")
    def res(df: org.apache.spark.sql.DataFrame) =
      df.select("tag", "qt", "v").as[(String, Long, Double)].collect().toSet
    def windows(df: org.apache.spark.sql.DataFrame) =
      "Window".r.findAllIn(df.queryExecution.executedPlan.toString).size
    val expected = res(AsOfJoin.asOf(probes, quotes, Seq("k"), "pt", "qt"))
    // generous budget -> plain plan (exactly one window, over the data)
    val plainRoute = AsOfJoin.asOfAuto(probes, quotes, Seq("k"), "pt", "qt",
      bucketSeconds = 10L, maxKeyRows = 1000L)
    assert(windows(plainRoute) == 1, "should have routed to plain asOf")
    assert(res(plainRoute) == expected)
    // hottest key ("a": 2 probes + 2 quotes = 4 rows) over budget ->
    // bucketed plan (carry-over window + data window)
    val bucketRoute = AsOfJoin.asOfAuto(probes, quotes, Seq("k"), "pt", "qt",
      bucketSeconds = 10L, maxKeyRows = 3L)
    assert(windows(bucketRoute) >= 2, "should have routed to asOfBucketed")
    assert(res(bucketRoute) == expected)
    // empty inputs must not crash the stats probe
    assert(AsOfJoin.asOfAuto(probes.limit(0), quotes.limit(0), Seq("k"),
      "pt", "qt", 10L).count() == 0)
  }

  test("asOfAuto consults persisted key stats; routing matches the scan probe") {
    val probes = Seq(("a", 5L, "p1"), ("a", 10L, "p2"), ("b", 3L, "p3"))
      .toDF("k", "pt", "tag")
    val quotes = Seq(("a", 4L, 100.0), ("a", 9L, 200.0), ("b", 2L, 300.0))
      .toDF("k", "qt", "v")
    val dirP = java.nio.file.Files.createTempDirectory("graft-stats-p").toString
    val dirQ = java.nio.file.Files.createTempDirectory("graft-stats-q").toString
    // two delta appends on the probe side: the reader must SUM deltas,
    // not take the last file's count
    AsOfJoin.appendKeyStats(probes.filter($"pt" <= 5), Seq("k"), dirP)
    AsOfJoin.appendKeyStats(probes.filter($"pt" > 5), Seq("k"), dirP)
    AsOfJoin.appendKeyStats(quotes, Seq("k"), dirQ)
    assert(AsOfJoin.hottestFromStats(Seq(dirP, dirQ), Seq("k"))
      .contains(4L), "hottest key 'a' = 2 probe + 2 quote rows across deltas")

    def res(df: org.apache.spark.sql.DataFrame) =
      df.select("tag", "qt", "v").as[(String, Long, Double)].collect().toSet
    def windows(df: org.apache.spark.sql.DataFrame) =
      "Window".r.findAllIn(df.queryExecution.executedPlan.toString).size
    val expected = res(AsOfJoin.asOf(probes, quotes, Seq("k"), "pt", "qt"))
    // identical thresholds to the scan-probe test: stats-fed dispatch
    // must route the same way, without touching either data side
    val plainRoute = AsOfJoin.asOfAuto(probes, quotes, Seq("k"), "pt", "qt",
      bucketSeconds = 10L, maxKeyRows = 1000L, statsDirs = Seq(dirP, dirQ))
    assert(windows(plainRoute) == 1, "stats said under budget -> plain asOf")
    assert(res(plainRoute) == expected)
    val bucketRoute = AsOfJoin.asOfAuto(probes, quotes, Seq("k"), "pt", "qt",
      bucketSeconds = 10L, maxKeyRows = 3L, statsDirs = Seq(dirP, dirQ))
    assert(windows(bucketRoute) >= 2, "stats said over budget -> bucketed")
    assert(res(bucketRoute) == expected)
    // a missing stats dir falls back to the count probe - same routing
    val fallback = AsOfJoin.asOfAuto(probes, quotes, Seq("k"), "pt", "qt",
      bucketSeconds = 10L, maxKeyRows = 3L,
      statsDirs = Seq(dirP, s"$dirQ/never-written"))
    assert(windows(fallback) >= 2, "missing stats must fall back, not misroute")
    assert(res(fallback) == expected)
  }

  test("asOfBucketed partition count scales with keys × buckets, not keys (J6 scale)") {
    // The whole point of the variant: the big window's shuffle key must be
    // (key, bucket). Read it straight from the physical plan.
    val probes = Seq(("a", 5L, "p1"), ("a", 25L, "p2")).toDF("k", "pt", "tag")
    val quotes = Seq(("a", 4L, 1.0), ("a", 24L, 2.0)).toDF("k", "qt", "v")
    val plan = AsOfJoin.asOfBucketed(probes, quotes, Seq("k"), "pt", "qt", 10L)
      .queryExecution.executedPlan.toString
    // the main window's exchange must hash on BOTH k and _bucket
    val twoColPartitioning = """hashpartitioning\(k#\d+[^)]*_bucket""".r
    assert(twoColPartitioning.findFirstIn(plan).isDefined,
      s"expected hashpartitioning(k, _bucket) in the plan:\n${plan.take(3000)}")
  }

  test("newRows gates per key; unseen keys pass entirely (T1)") {
    val batch = Seq(("a", 10L, "x1"), ("a", 20L, "x2"), ("b", 5L, "y1"))
      .toDF("src", "seq", "payload")
      .withColumn("ts", timestamp_micros(col("seq") * 1000000L)).drop("seq")
    val state = Seq(("a", java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(10))))
      .toDF("source_key", "high_water")
    val out = Incremental.newRows(batch, state, "src", "ts")
      .select("payload").as[String].collect().toSet
    assert(out == Set("x2", "y1")) // x1 at ts=10 NOT > watermark 10
  }

  test("runIncremental end-to-end: no row is delivered twice; watermark is monotone (T1-T6)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-incr").toString
    val statePath = s"$dir/state"
    // seq starts at 1: ts == epoch would be excluded by the strict ">" gate
    def batch(lo: Int, hi: Int) = (lo until hi)
      .map(i => (s"src${i % 2}", i.toLong + 1, s"row$i")).toDF("src", "seq", "payload")
      .withColumn("ts", timestamp_micros(col("seq") * 1000000L)).drop("seq")

    val run1 = Incremental.runIncremental(spark, statePath, batch(0, 10), "src", "ts")
      .select("payload").as[String].collect().toSet
    assert(run1.size == 10)
    // overlapping replay: rows 0-9 again plus 10-19 new
    val run2 = Incremental.runIncremental(spark, statePath, batch(0, 20), "src", "ts")
      .select("payload").as[String].collect().toSet
    assert(run2 == (10 until 20).map(i => s"row$i").toSet, "replayed rows must be gated")
    // pure replay: nothing new
    val run3 = Incremental.runIncremental(spark, statePath, batch(0, 20), "src", "ts")
    assert(run3.count() == 0)
    // watermark survived and is the max seen
    val state = spark.read.parquet(statePath)
      .as[(String, java.sql.Timestamp)].collect().toMap
    assert(state("src1").toInstant.getEpochSecond == 20)
    assert(state("src0").toInstant.getEpochSecond == 19)
  }

  test("last-page algebra truth table (REF :188-190,226-229)") {
    // short page -> last
    assert(PagedSource.isLastPage(size = 3, perPage = 50, page = 1, total = None))
    // full page, no total -> not last
    assert(!PagedSource.isLastPage(50, 50, 1, None))
    // full page, total covered -> last
    assert(PagedSource.isLastPage(50, 50, 2, Some(100L)))
    // full page, total not covered -> not last
    assert(!PagedSource.isLastPage(50, 50, 1, Some(100L)))
    // boundary: page*perPage == total -> last
    assert(PagedSource.isLastPage(50, 50, 1, Some(50L)))
  }

  private def fakeApi(pages: Map[Long, Page]): PagedApi = new PagedApi {
    def fetch(page: Long): Page = pages(page)
  }

  test("pull paginates to completion and tracks the received_at high-water (S1/T3)") {
    val api = fakeApi(Map(
      1L -> Page("""[{"received_at":"2025-01-01T00:00:05Z"},{"received_at":"2025-01-01T00:00:02Z"}]""", 2, None, Some(2)),
      2L -> Page("""[{"received_at":"2025-01-01T00:00:01Z"}]""", 1, None, Some(2))))
    val r = PagedSource.pull(api, Checkpoint(), maxPages = 10,
      timeBudgetMillis = 60000, defaultPerPage = 2)
    assert(r.complete)
    assert(r.payloads.length == 2)
    assert(r.checkpoint == Checkpoint(1L, Some("2025-01-01T00:00:05Z")))
  }

  test("pull caps at maxPages and leaves a resume point; resume completes (T2/T4)") {
    val pages = (1L to 5L).map { p =>
      val last = p == 5L
      p -> Page(s"""[{"received_at":"2025-01-01T00:00:0${p}Z"},{"received_at":"2025-01-01T00:00:00Z"}]""",
        if (last) 1 else 2, None, Some(2))
    }.toMap
    val r1 = PagedSource.pull(fakeApi(pages), Checkpoint(), maxPages = 2,
      timeBudgetMillis = 60000, defaultPerPage = 2)
    assert(!r1.complete && r1.checkpoint.nextPage == 3L)
    val r2 = PagedSource.pull(fakeApi(pages), r1.checkpoint, maxPages = 10,
      timeBudgetMillis = 60000, defaultPerPage = 2)
    assert(r2.complete)
    assert(r1.payloads.length + r2.payloads.length == 5)
    assert(r2.checkpoint.lastReceivedAt.contains("2025-01-01T00:00:05Z"))
  }

  // --- S4 retry/backoff truth table (REF wistia_pull_wistia_api.py:83-97) ---

  /** An api that fails `failures` times (with `err`) then succeeds. */
  private class FlakyApi(failures: Int, err: Int => Throwable) extends PagedApi {
    var calls = 0
    def fetch(page: Long): Page = {
      calls += 1
      if (calls <= failures) throw err(calls)
      Page(s"""[{"received_at":"2025-01-01T00:00:0${page}Z"}]""", 1, None, Some(2))
    }
  }

  test("retrying: retryable 5xx sleeps the schedule, 4th failure propagates (S4)") {
    for (status <- Seq(500, 502, 503, 504)) {
      val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
      val api = new FlakyApi(4, _ => PagedSource.HttpStatusFailure(status))
      val e = intercept[PagedSource.HttpStatusFailure] {
        PagedSource.retrying(api, sleep = sleeps += _).fetch(1L)
      }
      assert(e.status == status)
      // 3 backoff steps consumed in order; the 4th failure propagates.
      assert(sleeps.toSeq == Seq(1000L, 2000L, 4000L), s"status $status")
      assert(api.calls == 4, s"status $status: 1 initial + 3 retries")
    }
  }

  test("retrying: success after 2 failures returns the page, 2 sleeps (S4)") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val api = new FlakyApi(2, _ => PagedSource.HttpStatusFailure(503))
    val p = PagedSource.retrying(api, sleep = sleeps += _).fetch(1L)
    assert(p.size == 1 && api.calls == 3)
    assert(sleeps.toSeq == Seq(1000L, 2000L))
  }

  test("retrying: 4xx rethrows immediately with zero sleeps (S4)") {
    for (status <- Seq(400, 401, 403, 404, 429)) {
      val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
      val api = new FlakyApi(1, _ => PagedSource.HttpStatusFailure(status))
      val e = intercept[PagedSource.HttpStatusFailure] {
        PagedSource.retrying(api, sleep = sleeps += _).fetch(1L)
      }
      assert(e.status == status && sleeps.isEmpty && api.calls == 1,
        s"status $status must not retry")
    }
  }

  test("retrying: TransportFailure (no HTTP status) is retried (S4)") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val api = new FlakyApi(1, _ => new PagedSource.TransportFailure("connect reset"))
    val p = PagedSource.retrying(api, sleep = sleeps += _).fetch(1L)
    assert(p.size == 1 && api.calls == 2 && sleeps.toSeq == Seq(1000L))
  }

  test("retrying: non-HTTP, non-transport errors rethrow immediately (S4)") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val api = new FlakyApi(1, _ => new IllegalStateException("bug, not weather"))
    intercept[IllegalStateException] {
      PagedSource.retrying(api, sleep = sleeps += _).fetch(1L)
    }
    assert(sleeps.isEmpty && api.calls == 1)
  }

  test("retrying: backoff schedule resets per fetch, not per pull (S4)") {
    // Each page may consume the full schedule — a pull of N pages must not
    // share one retry budget across pages (matches the reference, which
    // constructs the retry iterator inside the per-request helper).
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    var callsForPage = Map.empty[Long, Int].withDefaultValue(0)
    val api = new PagedApi {
      def fetch(page: Long): Page = {
        callsForPage = callsForPage.updated(page, callsForPage(page) + 1)
        if (callsForPage(page) <= 3) throw PagedSource.HttpStatusFailure(500)
        // page 1 comes back full (not last); page 2 short (last)
        Page(s"""[{"received_at":"2025-01-01T00:00:0${page}Z"}]""",
          if (page == 2L) 1 else 2, None, None)
      }
    }
    val r = PagedSource.pull(PagedSource.retrying(api, sleep = sleeps += _),
      Checkpoint(), maxPages = 10, timeBudgetMillis = 60000, defaultPerPage = 2)
    assert(r.complete && r.payloads.length == 2)
    // both pages each burned the full (1,2,4)s schedule
    assert(sleeps.toSeq == Seq(1000L, 2000L, 4000L, 1000L, 2000L, 4000L))
  }

  test("pull stops on time budget exhaustion (T4)") {
    var clock = 0L
    val api = new PagedApi {
      def fetch(page: Long): Page = {
        clock += 30000 // each fetch "takes" 30s
        Page("""[{"received_at":"2025-01-01T00:00:01Z"},{"received_at":"2025-01-01T00:00:02Z"}]""", 2, None, Some(2))
      }
    }
    val r = PagedSource.pull(api, Checkpoint(), maxPages = 100,
      timeBudgetMillis = 45000, defaultPerPage = 2, now = () => clock)
    assert(!r.complete && r.payloads.length == 2 && r.checkpoint.nextPage == 3L)
  }
}
