package graft.schema

import org.apache.spark.sql.types._

/** Explicit StructTypes for every source the engine reads.
  *
  * The reference infers bronze schemas at runtime
  * (REF glue_jobs/silver/wistia_transform_silver.py:29,73) — an O(full scan)
  * hazard at 100 TB. We declare every schema up front (SURVEY.md §1.3) and
  * treat inference as a dev-only convenience.
  */
object Schemas {

  // ---------------------------------------------------------------------------
  // Driver testdata tables (/root/testdata/sf*/<table>.parquet, TESTDATA.md)
  // ---------------------------------------------------------------------------

  val region: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nation: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customer: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplier: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val part: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val orders: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val lineitem: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  val events: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Schema of the JSON payload inside events.props. */
  val eventProps: StructType = StructType(Seq(
    StructField("k", LongType)))

  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddings: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  // ---------------------------------------------------------------------------
  // Wistia bronze shapes (FIXTURES.md; REF wistia_transform_silver.py:32-52,
  // wistia_redshift_schemas.py:3-38). Used by the flatten/upsert/incremental
  // modules and their golden tests — never inferred.
  // ---------------------------------------------------------------------------

  /** Raw event object inside an events page (FIXTURES.md §1). */
  val wistiaEventRaw: StructType = StructType(Seq(
    StructField("event_key", StringType),
    StructField("received_at", StringType), // ISO-8601; parsed to ts downstream
    StructField("percent_viewed", DoubleType),
    StructField("embed_url", StringType),
    StructField("email", StringType),
    StructField("ip", StringType),
    StructField("user_agent_details", StructType(Seq(
      StructField("browser", StringType),
      StructField("browser_version", StringType),
      StructField("platform", StringType),
      StructField("mobile", BooleanType)))),
    StructField("visitor_key", StringType),
    StructField("country", StringType),
    StructField("region", StringType),
    StructField("city", StringType),
    StructField("lat", DoubleType),
    StructField("lon", DoubleType),
    StructField("org", StringType),
    StructField("media_id", StringType),
    StructField("media_name", StringType)))

  /** Dynamic page envelope: bare list OR {data|events|items|results, total,
    * per_page} (REF wistia_pull_wistia_api.py:135-146). Parsed permissively;
    * the normalizer coalesces whichever list field is present.
    */
  val wistiaEventPage: StructType = StructType(Seq(
    StructField("data", ArrayType(wistiaEventRaw)),
    StructField("events", ArrayType(wistiaEventRaw)),
    StructField("items", ArrayType(wistiaEventRaw)),
    StructField("results", ArrayType(wistiaEventRaw)),
    StructField("total", LongType),
    StructField("per_page", LongType)))

  /** Media metadata object (FIXTURES.md §2; REF wistia_transform_silver.py:71-85). */
  val wistiaMediaRaw: StructType = StructType(Seq(
    StructField("hashed_id", StringType),
    StructField("name", StringType),
    StructField("duration", StringType), // number-or-string; cast downstream
    StructField("created", StringType),
    StructField("updated", StringType),
    StructField("updated_at", StringType),
    StructField("created_at", StringType),
    StructField("section", StringType),
    StructField("subfolder", StructType(Seq(StructField("name", StringType)))),
    StructField("thumbnail", StructType(Seq(StructField("url", StringType)))),
    StructField("project", StructType(Seq(StructField("name", StringType))))))

  /** Flattened fact_events target (REF wistia_redshift_schemas.py:3-23). */
  val factEvents: StructType = StructType(Seq(
    StructField("event_key", StringType),
    StructField("received_at", TimestampType),
    StructField("percent_viewed", DoubleType),
    StructField("embed_url", StringType),
    StructField("email", StringType),
    StructField("ip", StringType),
    StructField("user_agent_browser", StringType),
    StructField("user_agent_browser_version", StringType),
    StructField("user_agent_platform", StringType),
    StructField("user_agent_mobile", BooleanType),
    StructField("visitor_key", StringType),
    StructField("country", StringType),
    StructField("region", StringType),
    StructField("city", StringType),
    StructField("lat", DoubleType),
    StructField("lon", DoubleType),
    StructField("org", StringType),
    StructField("media_id", StringType),
    StructField("media_name", StringType)))

  /** dim_media target (REF wistia_redshift_schemas.py:28-38). */
  val dimMedia: StructType = StructType(Seq(
    StructField("media_id", StringType),
    StructField("media_name", StringType),
    StructField("duration_seconds", DoubleType),
    StructField("created_at", TimestampType),
    StructField("updated_at", TimestampType),
    StructField("section_name", StringType),
    StructField("subfolder_name", StringType),
    StructField("thumbnail_url", StringType),
    StructField("project_name", StringType)))
}
