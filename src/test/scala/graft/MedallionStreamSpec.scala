package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Medallion
import graft.pipeline.Medallion.Layout
import graft.sources.PagedSource.{Checkpoint, PullResult}
import graft.streaming.MedallionStream

/** The streaming silver path must reproduce the batch pipeline's fact
  * table, absorb re-delivered duplicates via the watermarked dedup, and
  * resume from its checkpoint without reprocessing.
  */
class MedallionStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ev(key: String, ts: String, media: String): String =
    s"""{"event_key":"$key","received_at":"$ts","percent_viewed":0.5,
       |"visitor_key":"v-$key","media_id":"$media","media_name":"vid"}"""
      .stripMargin.replaceAll("\n", "")

  test("streaming silver path: ingest, dedup within watermark, checkpoint resume") {
    val root = java.nio.file.Files.createTempDirectory("graft-mstream").toString
    val l = Layout(root)
    val fact = s"$root/stream/fact"
    val cp = s"$root/stream/cp"
    val done = Checkpoint()

    // batch 1: two pages, one duplicate event across pages
    Medallion.writeBronzePages(spark, l, "m1", "2025-04-01", PullResult(Seq(
      s"""{"data":[${ev("s1", "2025-04-01T10:00:00Z", "m1")},
         |${ev("s2", "2025-04-01T11:00:00Z", "m1")}]}"""
        .stripMargin.replaceAll("\n", ""),
      s"""[${ev("s2", "2025-04-01T11:00:00Z", "m1")},
         |${ev("s3", "2025-04-01T12:00:00Z", "m1")}]"""
        .stripMargin.replaceAll("\n", "")), done, complete = true))

    val out1 = MedallionStream.runOnce(spark, l.bronzeEvents, fact, cp)
    assert(out1.count() == 3, "duplicate s2 must be absorbed by the stream dedup")
    assert(out1.select("event_key").distinct().count() == 3)

    // batch 2: new bronze partition; restart from checkpoint
    Medallion.writeBronzePages(spark, l, "m1", "2025-04-02", PullResult(Seq(
      s"""{"data":[${ev("s4", "2025-04-02T09:00:00Z", "m1")}]}"""),
      done, complete = true))
    val out2 = MedallionStream.runOnce(spark, l.bronzeEvents, fact, cp)
    assert(out2.count() == 4, "restart must process only the new file")
    assert(out2.select("event_key").distinct().count() == 4)

    // pure restart with nothing new: no growth
    val out3 = MedallionStream.runOnce(spark, l.bronzeEvents, fact, cp)
    assert(out3.count() == 4)

    // streaming output must match the batch pipeline's view of event keys
    val batchKeys = graft.ops.Dedup.firstWins(
      graft.ops.Flatten.factEvents(graft.ops.Flatten.normalizePages(
        spark.read.schema(new org.apache.spark.sql.types.StructType()
          .add("payload", org.apache.spark.sql.types.StringType))
          .json(s"${l.bronzeEvents}/*/*").select("payload"))),
      Seq("event_key"), Seq(col("received_at").desc))
      .select("event_key").as[String].collect().toSet
    val streamKeys = out3.select("event_key").as[String].collect().toSet
    assert(streamKeys == batchKeys)
  }

  test("single-pass silver: one bronze read feeds fact + quarantine; " +
       "anti-join dedup absorbs cross-trigger re-deliveries") {
    val root = java.nio.file.Files.createTempDirectory("graft-mstream1p").toString
    val l = Layout(root)
    val fact = s"$root/sp/fact"
    val quar = s"$root/sp/quarantine"
    val cp = s"$root/sp/cp"
    val done = Checkpoint()

    // trigger 1: duplicate s2 across pages + one corrupt page
    Medallion.writeBronzePages(spark, l, "m1", "2025-04-01", PullResult(Seq(
      s"""{"data":[${ev("s1", "2025-04-01T10:00:00Z", "m1")},
         |${ev("s2", "2025-04-01T11:00:00Z", "m1")}]}"""
        .stripMargin.replaceAll("\n", ""),
      s"""[${ev("s2", "2025-04-01T11:00:00Z", "m1")},
         |${ev("s3", "2025-04-01T12:00:00Z", "m1")}]"""
        .stripMargin.replaceAll("\n", ""),
      """{"oops": not json"""), done, complete = true))

    val out1 = MedallionStream.runOnceSinglePass(spark, l.bronzeEvents, fact, quar, cp)
    assert(out1.count() == 3, "intra-trigger duplicate s2 must be absorbed")
    assert(spark.read.parquet(quar).count() == 1,
      "the corrupt page must land in quarantine from the same pass")

    // trigger 2: s2 re-delivered in a NEW trigger (the case the two-query
    // path handles with dropDuplicatesWithinWatermark state) + new s4
    Medallion.writeBronzePages(spark, l, "m1", "2025-04-02", PullResult(Seq(
      s"""{"data":[${ev("s2", "2025-04-01T11:00:00Z", "m1")},
         |${ev("s4", "2025-04-02T09:00:00Z", "m1")}]}"""
        .stripMargin.replaceAll("\n", "")), done, complete = true))
    val out2 = MedallionStream.runOnceSinglePass(spark, l.bronzeEvents, fact, quar, cp)
    assert(out2.count() == 4, "cross-trigger duplicate s2 must be absorbed by the anti-join")
    assert(out2.select("event_key").distinct().count() == 4)

    // drained restart: no growth in fact or quarantine
    val out3 = MedallionStream.runOnceSinglePass(spark, l.bronzeEvents, fact, quar, cp)
    assert(out3.count() == 4)
    assert(spark.read.parquet(quar).count() == 1)

    // trigger 3: a null-timestamp event (parseable, no received_at) and the
    // SAME corrupt payload genuinely re-occurring in a new trigger
    Medallion.writeBronzePages(spark, l, "m1", "2025-04-03", PullResult(Seq(
      """{"data":[{"event_key":"s5","percent_viewed":0.1,"visitor_key":"v-s5","media_id":"m1","media_name":"vid"}]}""",
      """{"oops": not json"""), done, complete = true))
    val out3b = MedallionStream.runOnceSinglePass(spark, l.bronzeEvents, fact, quar, cp)
    assert(out3b.count() == 5, "null-timestamp event must land in the fact")
    assert(spark.read.parquet(quar).count() == 2,
      "a corrupt page re-occurring in a LATER trigger is a new row (new batch id)")

    // replayed micro-batch (fresh checkpoint over the same bronze) appends
    // nothing: the anti-join makes the foreachBatch sink idempotent — for
    // null-timestamp rows too (null-safe key match, isNull-keeping slice)
    val out4 = MedallionStream.runOnceSinglePass(spark, l.bronzeEvents, fact, quar,
      s"$root/sp/cp-replay")
    assert(out4.count() == 5, "full replay must be absorbed by the anti-join")
    assert(out4.filter(col("received_at").isNull).count() == 1,
      "the null-timestamp event must not duplicate on replay")
    assert(spark.read.parquet(quar).count() == 2,
      "quarantine replay must be absorbed by the (raw_payload, batch_id) anti-join")

    // parity with the batch pipeline's view of event keys
    val batchKeys = graft.ops.Dedup.firstWins(
      graft.ops.Flatten.factEvents(graft.ops.Flatten.normalizePages(
        spark.read.schema(new org.apache.spark.sql.types.StructType()
          .add("payload", org.apache.spark.sql.types.StringType))
          .json(s"${l.bronzeEvents}/*/*").select("payload"))),
      Seq("event_key"), Seq(col("received_at").desc))
      .select("event_key").as[String].collect().toSet
    assert(out4.select("event_key").as[String].collect().toSet == batchKeys)
  }

  test("single-pass silver: a batch of ONLY null-timestamp rows is replay-idempotent") {
    val root = java.nio.file.Files.createTempDirectory("graft-mstreamnull").toString
    val l = Layout(root)
    val fact = s"$root/np/fact"
    val quar = s"$root/np/quarantine"
    // trigger 1 (cp A): a normal event so the fact exists
    Medallion.writeBronzePages(spark, l, "m1", "2025-04-01", PullResult(Seq(
      s"""{"data":[${ev("n1", "2025-04-01T10:00:00Z", "m1")}]}"""),
      Checkpoint(), complete = true))
    MedallionStream.runOnceSinglePass(spark, l.bronzeEvents, fact, quar, s"$root/np/cpA")
    // trigger 2 (cp A): ONLY a null-timestamp event — min(received_at) is
    // null for the batch, the branch that must still anti-join
    Medallion.writeBronzePages(spark, l, "m1", "2025-04-02", PullResult(Seq(
      """{"data":[{"event_key":"n2","percent_viewed":0.2,"visitor_key":"v-n2","media_id":"m1","media_name":"vid"}]}"""),
      Checkpoint(), complete = true))
    val out = MedallionStream.runOnceSinglePass(spark, l.bronzeEvents, fact, quar, s"$root/np/cpA")
    assert(out.count() == 2)
    // replay the null-only page alone (a second bronze root holding just
    // that page, fresh checkpoint — the crash-before-checkpoint shape):
    // the batch's min ts is null and its row is already in the fact —
    // nothing may append
    val l2 = Layout(s"$root/replay")
    Medallion.writeBronzePages(spark, l2, "m1", "2025-04-02", PullResult(Seq(
      """{"data":[{"event_key":"n2","percent_viewed":0.2,"visitor_key":"v-n2","media_id":"m1","media_name":"vid"}]}"""),
      Checkpoint(), complete = true))
    val out2 = MedallionStream.runOnceSinglePass(spark, l2.bronzeEvents, fact, quar, s"$root/np/cpB")
    assert(out2.count() == 2,
      "null-only batch replay must be absorbed by the isNull-slice anti-join")
    assert(out2.filter(col("received_at").isNull).count() == 1)
  }

  test("horizon slice: the literal bound reaches the fact scan as a pushed filter") {
    // The reason the min probe stays a driver-side action: a literal
    // bound row-group-prunes the per-trigger fact read; a scalar-subquery
    // bound (the "fold it into the write pass" alternative) measures as
    // PushedFilters: [] on Spark 4.1. Pin the pushed literal so a future
    // refactor can't silently regress the scan to full-table.
    val dir = java.nio.file.Files.createTempDirectory("graft-slice").toString
    spark.range(100)
      .selectExpr("CAST(id AS STRING) AS event_key",
        "timestamp_micros(id * 1000000) AS received_at")
      .write.mode("overwrite").parquet(dir)
    val plan = MedallionStream.priorFactSlice(spark, dir,
      java.sql.Timestamp.valueOf("1970-01-01 00:00:50"), 10000L)
      .queryExecution.executedPlan.toString
    val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findFirstIn(plan).getOrElse("")
    assert(pushed.contains("GreaterThanOrEqual(received_at"),
      s"horizon bound must be pushed into the parquet scan, got: $pushed")
    // and the slice must still admit null-event-time rows (the pushed Or
    // keeps IsNull alongside the bound)
    assert(pushed.contains("IsNull(received_at"),
      s"null-event-time rows must survive the pushed slice, got: $pushed")
  }
}
