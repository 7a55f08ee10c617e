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
