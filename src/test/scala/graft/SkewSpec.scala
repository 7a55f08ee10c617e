package graft

import org.apache.spark.sql.functions._

import graft.ops.Skew
import graft.sources.Tables

/** Skew-mitigation helpers: salted paths must be result-identical to the
  * direct plans.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("saltedAgg equals direct groupBy (decimal-exact)") {
    val li = Tables.load(spark, sf, "lineitem")
    val direct = li.groupBy("l_returnflag")
      .agg(sum(graft.ops.Agg.money(col("l_extendedprice"))).cast("double")
        .as("sum_l_extendedprice"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect().toSet
    val salted = Skew.saltedAgg(li, Seq("l_returnflag"), "l_extendedprice", 16)
      .as[(String, Double, Long)].collect().toSet
    assert(salted == direct)
  }

  test("saltedJoin equals direct join") {
    val big = Seq.tabulate(1000)(i => (i % 3, i)).toDF("k", "v") // skewed keys
    val small = Seq((0, "a"), (1, "b"), (2, "c"), (3, "unused")).toDF("k", "name")
    val direct = big.join(small, Seq("k")).as[(Int, Int, String)].collect().toSet
    val salted = Skew.saltedJoin(big, small, "k", salts = 8)
      .as[(Int, Int, String)].collect().toSet
    assert(salted == direct)
    assert(salted.size == 1000)
  }

  test("saltedAgg neutralizes a hot key of IDENTICAL rows via map-side partials") {
    // the worst case: byte-identical duplicate rows share a content-hash
    // salt, but the salted stage's map-side partial aggregation collapses
    // them to one partial per (key, salt) before anything shuffles
    val hot = Seq.fill(500)(("HOT", 1.0)).toDF("k", "v").repartition(4)
    val agg = Skew.saltedAgg(hot, Seq("k"), "v", 8)
    assert(agg.as[(String, Double, Long)].head() == (("HOT", 500.0, 500L)))

    // distinct rows of a hot key spread across salts deterministically
    val varied = Seq.tabulate(500)(i => ("HOT", i.toDouble)).toDF("k", "v")
    assert(Skew.saltedAgg(varied, Seq("k"), "v", 8)
      .as[(String, Double, Long)].head() == (("HOT", 124750.0, 500L)))
    val nSalts = varied.withColumn("_salt",
      pmod(xxhash64(varied.columns.map(col): _*), lit(8)))
      .select(countDistinct("_salt")).as[Long].head()
    assert(nSalts > 1, "distinct hot-key rows must spread over multiple salts")
  }

  test("AQE splits the skewed partition of a hot-key sort-merge join") {
    // The MODERATE-skew regime the salted paths don't need to own: AQE's
    // runtime skew-join splitting. Thresholds floored so the sf-sized
    // fixture exhibits the 100 TB behavior; the pin is that the engine's
    // plain equi-joins stay in the shape the rule can split (the final
    // adaptive plan marks the join skew=true) AND that the result is
    // unchanged by the splitting.
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // spread over several MAP tasks (AQE splits a skewed reduce
      // partition by map-index ranges — a single-map input is
      // unsplittable no matter how skewed) and use a high-entropy
      // payload (reported partition sizes are COMPRESSED shuffle bytes;
      // a constant pad compresses the hot partition under any threshold)
      val hot = (Seq.fill(2000)(1) ++ (2 to 41)).toDF("k")
        .repartition(8)
        .withColumn("payload",
          md5(concat(col("k"), monotonically_increasing_id())))
      val dim = Seq.tabulate(41)(i => (i + 1, s"d${i + 1}")).toDF("k", "name")
      val joined = hot.join(dim, Seq("k"))
      // execute and inspect the SAME QueryExecution: count() would build
      // its own plan and leave this one un-finalized (isFinalPlan=false)
      val qe = joined.queryExecution
      assert(qe.toRdd.count() === 2040L,
        "splitting must not change the join result")
      val p = qe.executedPlan.toString
      assert(p.contains("skew=true"),
        s"expected AQE to mark the hot partition skew=true:\n${p.take(1500)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
