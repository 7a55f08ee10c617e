package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.sources.Tables
import graft.vector.Similarity

/** Custom Catalyst expression surface (§2.11/§4.3): codegen'd cosine must
  * be bit-identical to the HOF baseline; SQL registration; bucketed tables
  * must join without an Exchange (the 100 TB co-located join).
  */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("CosineSimilarity expression is bit-identical to the HOF form") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val pairs = a.join(b, col("ia") < col("ib") - 480) // ~small sample of pairs
    val diff = pairs.select(
      Similarity.cosine(col("ea"), col("eb")).as("expr"),
      Similarity.cosineHof(col("ea"), col("eb")).as("hof"))
      .filter(col("expr") =!= col("hof"))
    assert(diff.count() == 0, "codegen expression must match HOF bit-for-bit")
  }

  test("cosine_similarity is callable from SQL after registration") {
    GraftFunctions.registerAll(spark)
    Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .createOrReplaceTempView("emb_fn_test")
    val r = spark.sql(
      """SELECT cosine_similarity(a.embedding, a.embedding) AS self_cos
        |FROM emb_fn_test a WHERE a.vec_id = 0""".stripMargin)
      .as[Double].head()
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("expression participates in whole-stage codegen (no fallback)") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = emb.select(Similarity.cosine(col("embedding"), col("embedding")).as("c"))
    val plan = q.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [cosine_similarity"), plan.take(500))
    q.collect() // force actual codegen compilation, not just planning
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // DROP TABLE on the in-memory catalog leaves physical dirs from prior
    // JVMs behind; clear them or saveAsTable fails LOCATION_ALREADY_EXISTS
    for (t <- Seq("b_orders", "b_lineitem")) {
      val p = java.nio.file.Paths.get("spark-warehouse", t)
      if (java.nio.file.Files.exists(p)) {
        java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .forEach(f => java.nio.file.Files.delete(f))
      }
    }
    val sf = "/root/testdata/sf0.001"
    Tables.load(spark, sf, "orders")
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    Tables.load(spark, sf, "lineitem")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("b_lineitem")
    val joined = spark.table("b_lineitem").join(spark.table("b_orders"),
      col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    val exchangesBeforeAgg = plan.split("HashAggregate").head
    assert(!exchangesBeforeAgg.contains("Exchange hashpartitioning(l_orderkey") &&
      !plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join must not shuffle either side:\n${plan.take(3000)}")
  }
}
