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
}
