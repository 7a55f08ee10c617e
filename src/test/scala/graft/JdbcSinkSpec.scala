package graft

import org.apache.spark.sql.functions._
import graft.sources.JdbcSink

/** Integration spec for the JDBC sink parity ops against EMBEDDED Derby
  * (ships in Spark's own jars — same process, no network): append,
  * staged merge ≡ rebuild, merge atomicity, stage hygiene.
  */
class JdbcSinkSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftsink;create=true"

  // Derby maps Spark StringType to CLOB on CREATE, which Derby refuses
  // to compare in the merge's key match — so the tables pre-exist with
  // VARCHAR keys, the warehouse-owns-the-DDL posture the reference
  // takes (its tables come from seed scripts, not the writer).
  private lazy val ddl: Unit = JdbcSink.execute(url, Map.empty,
    "CREATE TABLE dim_media (media_id VARCHAR(32), media_name VARCHAR(64), " +
      "duration_seconds DOUBLE)",
    "CREATE TABLE dim_media_stage (media_id VARCHAR(32), " +
      "media_name VARCHAR(64), duration_seconds DOUBLE)",
    "CREATE TABLE fact_events (event_key VARCHAR(32), plays BIGINT)")

  private def readTable(table: String) =
    spark.read.format("jdbc").option("url", url)
      .option("dbtable", table).load()

  test("append: distributed insert lands every row") {
    ddl
    val df = Seq(("e1", 3L), ("e2", 5L)).toDF("event_key", "plays")
    JdbcSink.append(df, url, "fact_events")
    JdbcSink.append(df.filter(col("event_key") === "e1"), url, "fact_events")
    val got = readTable("fact_events").as[(String, Long)].collect().sorted
    assert(got.toSeq == Seq(("e1", 3L), ("e1", 3L), ("e2", 5L)),
      "append is append — no implicit dedup, the fact-table contract")
  }

  test("staged merge: replaced on key match, untouched otherwise, " +
      "stage cleared — upsert == rebuild") {
    ddl
    val base = Seq(("m1", "one", 10.0), ("m2", "two", 20.0))
      .toDF("media_id", "media_name", "duration_seconds")
    JdbcSink.stagedMerge(base, url, "dim_media", "dim_media_stage",
      Seq("media_id"))
    // second wave: m2 updated, m3 new — m1 must survive unchanged
    val wave = Seq(("m2", "two-v2", 21.0), ("m3", "three", 30.0))
      .toDF("media_id", "media_name", "duration_seconds")
    JdbcSink.stagedMerge(wave, url, "dim_media", "dim_media_stage",
      Seq("media_id"))
    val got = readTable("dim_media").as[(String, String, Double)]
      .collect().sortBy(_._1)
    assert(got.toSeq == Seq(("m1", "one", 10.0), ("m2", "two-v2", 21.0),
      ("m3", "three", 30.0)))
    assert(readTable("dim_media_stage").count() == 0,
      "the merge transaction's step 3 clears the stage")
    // a crashed previous run's leftover stage rows must NOT leak into
    // the next merge (the preaction truncate)
    JdbcSink.execute(url, Map.empty,
      "INSERT INTO dim_media_stage VALUES ('m9', 'stale', 99.0)")
    JdbcSink.stagedMerge(
      Seq(("m1", "one-v2", 11.0))
        .toDF("media_id", "media_name", "duration_seconds"),
      url, "dim_media", "dim_media_stage", Seq("media_id"))
    val after = readTable("dim_media").as[(String, String, Double)]
      .collect().sortBy(_._1)
    assert(after.toSeq == Seq(("m1", "one-v2", 11.0), ("m2", "two-v2", 21.0),
      ("m3", "three", 30.0)), "stale stage rows must not merge")
  }

  test("merge transaction: a failing statement rolls back the delete") {
    ddl
    // poison Derby mid-transaction: drop the stage between load and
    // merge is hard to inject, so instead run executeTxn directly with
    // a bad final statement and confirm the first statement unwound
    JdbcSink.execute(url, Map.empty,
      "CREATE TABLE txn_t (k VARCHAR(8))",
      "INSERT INTO txn_t VALUES ('a')")
    intercept[java.sql.SQLException] {
      JdbcSink.executeTxn(url, Map.empty,
        "DELETE FROM txn_t",
        "INSERT INTO no_such_table VALUES ('x')")
    }
    assert(readTable("txn_t").count() == 1,
      "the delete must roll back with the failed transaction")
  }

  test("stagedMerge refuses keys the frame does not carry") {
    ddl
    val e = intercept[IllegalArgumentException] {
      JdbcSink.stagedMerge(
        Seq(("m1", "one", 1.0))
          .toDF("media_id", "media_name", "duration_seconds"),
        url, "dim_media", "dim_media_stage", Seq("nope"))
    }
    assert(e.getMessage.contains("nope"))
  }
}
