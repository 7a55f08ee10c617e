package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** S8 extended: bucketed catalog tables as the co-located-join layout.
  * The contract that matters at 100 TB: two tables written with the same
  * bucket spec join (and aggregate) on the bucket key with ZERO exchange —
  * the shuffle was paid once at write time, not on every query.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Drop the catalog entry AND the leftover warehouse directory: the
    * test session's catalog is in-memory, so a table from a previous JVM
    * survives only as an orphaned directory that blocks CTAS.
    */
  private def freshTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val dir = java.nio.file.Paths.get("spark-warehouse", name)
    if (java.nio.file.Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
  }

  private def withNoBroadcast[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("same-spec bucketed tables join with zero exchange, results exact") {
    freshTable("bk_lineitem"); freshTable("bk_orders")
    Tables.writeBucketed(Tables.load(spark, sf, "lineitem"),
      "bk_lineitem", "l_orderkey", 4)
    Tables.writeBucketed(
      Tables.load(spark, sf, "orders")
        .withColumnRenamed("o_orderkey", "l_orderkey"),
      "bk_orders", "l_orderkey", 4)
    withNoBroadcast {
      // join + aggregate BOTH keyed on the bucket column: the entire plan
      // must run on the pre-shuffled buckets with zero exchange
      val joined = spark.table("bk_lineitem")
        .join(spark.table("bk_orders"), Seq("l_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n"), graft.ops.Agg.dsum(col("l_extendedprice"))
          .as("rev"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        "both sides share the bucket spec — the join AND the downstream " +
          "keyed work must read pre-shuffled buckets:\n" + plan.take(1500))
      // and the answer matches the plain (shuffling) join exactly
      val expected = Tables.load(spark, sf, "lineitem")
        .join(Tables.load(spark, sf, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n"), graft.ops.Agg.dsum(col("l_extendedprice"))
          .as("rev"))
        .as[(Long, Long, Double)].collect().toSet
      assert(joined.as[(Long, Long, Double)].collect().toSet == expected)
    }
  }

  test("aggregation on the bucket key needs no exchange either") {
    freshTable("bk_orders_solo")
    Tables.writeBucketed(Tables.load(spark, sf, "orders"),
      "bk_orders_solo", "o_custkey", 4)
    val agg = spark.table("bk_orders_solo")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      "groupBy on the bucket column must aggregate in place:\n" +
        plan.take(1200))
  }
}
