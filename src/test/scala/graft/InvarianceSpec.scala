package graft

import org.apache.spark.sql.functions._

import graft.ops.Agg
import graft.sources.Tables

/** SURVEY §5.2(3): partition-layout invariance — results must not depend on
  * how the data is physically split (the property AQE re-partitioning
  * relies on).
  */
class InvarianceSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("decimal aggregation is invariant under repartitioning") {
    val li = Tables.load(spark, sf, "lineitem")
    def summarize(df: org.apache.spark.sql.DataFrame) =
      Agg.pricingSummary(df).orderBy("l_returnflag", "l_linestatus")
        .collect().map(_.toSeq).toSeq
    val base = summarize(li)
    for (n <- Seq(1, 3, 17)) {
      assert(summarize(li.repartition(n)) == base, s"repartition($n) changed results")
    }
    assert(summarize(li.repartition(8, col("l_partkey"))) == base,
      "keyed repartition changed results")
  }

  test("deterministic dedup is invariant under repartitioning") {
    val li = Tables.load(spark, sf, "lineitem")
    def dedup(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Dedup.firstWins(df, Seq("l_orderkey"),
        Seq("l_linenumber", "l_partkey", "l_suppkey", "l_quantity",
          "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
          "l_linestatus", "l_shipdate").map(col(_).asc))
        .select("l_orderkey", "l_partkey", "l_linenumber")
        .as[(Long, Long, Int)].collect().toSet
    val base = dedup(li)
    assert(dedup(li.repartition(7)) == base)
    assert(dedup(li.repartition(2, col("l_suppkey"))) == base)
  }

  test("minhash signatures are invariant under repartitioning") {
    val docs = Tables.load(spark, sf, "documents")
    def sigs(df: org.apache.spark.sql.DataFrame) =
      graft.text.TextDedup.minhashSignatures(graft.text.TextDedup.shingles(df))
        .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(sigs(docs.repartition(9)) == sigs(docs))
  }

  test("sequence packing is invariant under repartitioning") {
    val docs = Tables.load(spark, sf, "documents")
    def pack(df: org.apache.spark.sql.DataFrame) =
      graft.text.Corpus.packSequences(df, maxTokens = 512, numShards = 4)
        .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val base = pack(docs)
    assert(pack(docs.repartition(11)) == base)
    assert(pack(docs.repartition(3, col("doc_id"))) == base)
  }

  test("contamination is invariant under repartitioning") {
    val docs = Tables.load(spark, sf, "documents")
    def contam(df: org.apache.spark.sql.DataFrame) =
      graft.text.Corpus.contamination(
        df.filter(col("doc_id") % 10 === 0), df.filter(col("doc_id") % 10 =!= 0))
        .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(contam(docs.repartition(13)) == contam(docs))
  }

  test("dedup clustering is invariant under repartitioning") {
    val docs = Tables.load(spark, sf, "documents")
    def clusters(df: org.apache.spark.sql.DataFrame) =
      graft.text.TextDedup.dedupClusters(
        graft.text.TextDedup.nearDupPairs(df, threshold = 0.5))
        .as[(Long, Long)].collect().toMap
    val base = clusters(docs)
    assert(base.nonEmpty, "testdata must contain near-dup clusters")
    assert(clusters(docs.repartition(9)) == base)
  }

  test("encode and quota cap are invariant under repartitioning") {
    val docs = Tables.load(spark, sf, "documents")
    def enc(df: org.apache.spark.sql.DataFrame) =
      graft.text.Corpus.encode(df, graft.text.Corpus.buildVocab(df, 64))
        .as[(Long, Int, Int)].collect().toSet
    def cap(df: org.apache.spark.sql.DataFrame) =
      graft.text.Corpus.capPerStratum(df, 30)
        .as[(Long, String, Int)].collect().toSet
    assert(enc(docs.repartition(7)) == enc(docs))
    assert(cap(docs.repartition(5)) == cap(docs))
  }

  test("semantic dedup and IVF pair blocking are invariant under repartitioning") {
    val emb = Tables.load(spark, sf, "embeddings")
    def survivors(df: org.apache.spark.sql.DataFrame) =
      graft.vector.Similarity.semanticDedup(df.select($"vec_id", $"label"),
        graft.vector.Similarity.nearDupWithinLabel(df, 0.3))
        .as[(Long, Int)].collect().toSet
    val base = survivors(emb)
    assert(base.nonEmpty)
    assert(survivors(emb.repartition(9)) == base)
    // quantized Lloyd training + assignment must be partition-order free,
    // or the IVF blocking (and therefore q91's survivor set) would drift
    def ivfPairs(df: org.apache.spark.sql.DataFrame) =
      graft.vector.Similarity.ivfCandidatePairs(df, 0.3,
        nCentroids = 8, assign = 2, trainIters = 2)
        .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSet
    assert(ivfPairs(emb.repartition(7)) == ivfPairs(emb))
  }

  test("z-order layout read-back is invariant under input repartitioning") {
    val events = Tables.load(spark, sf, "events")
    def layout(df: org.apache.spark.sql.DataFrame) = {
      val dir = java.nio.file.Files.createTempDirectory("graft-zinv").toString
      graft.maintenance.ZOrder.write(df, dir, Seq("user_id", "ts"), 4)
      spark.read.parquet(dir).collect().map(_.toSeq).toSet
    }
    assert(layout(events.repartition(11)) == layout(events))
  }

  test("salted join is invariant under repartitioning") {
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_suppkey").as("suppkey"), col("l_extendedprice"))
    val sup = Tables.load(spark, sf, "supplier")
      .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
    def joined(big: org.apache.spark.sql.DataFrame) =
      graft.ops.Skew.saltedJoin(big, sup, "suppkey", salts = 8)
        .groupBy(col("s_nationkey"))
        .agg(Agg.dsum(col("l_extendedprice")).as("rev"), count(lit(1)).as("n"))
        .as[(Long, Double, Long)].collect().toSet
    assert(joined(li.repartition(7)) == joined(li))
  }

  test("incremental dedup probe is invariant under repartitioning") {
    val docs = Tables.load(spark, sf, "documents")
    def probe(df: org.apache.spark.sql.DataFrame) =
      graft.text.TextDedup.nearDupAgainstIndex(
        graft.text.TextDedup.signatureIndex(df.filter(col("doc_id") % 10 =!= 0)),
        graft.text.TextDedup.signatureIndex(df.filter(col("doc_id") % 10 === 0)),
        0.5).as[(Long, Long, Double)].collect().toSet
    assert(probe(docs.repartition(9)) == probe(docs))
  }

  test("sketch rollup and bloom decontamination are invariant under repartitioning") {
    // both fold through mergeable state (HLL union / bloom OR) — the
    // partial-merge order must not leak into results
    val ev = Tables.load(spark, sf, "events")
    def roll(df: org.apache.spark.sql.DataFrame) =
      Agg.sketchRollup(Agg.dailySketches(df))
        .as[(String, Long, Long, Long)].collect().toSet
    assert(roll(ev.repartition(7)) == roll(ev))
    val docs = Tables.load(spark, sf, "documents")
    def bloom(df: org.apache.spark.sql.DataFrame) =
      graft.text.Corpus.contaminationBloom(
        df.filter(col("doc_id") % 10 === 0), df.filter(col("doc_id") % 10 =!= 0))
        .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(bloom(docs.repartition(11)) == bloom(docs))
  }

  test("boilerplate fraction is invariant under repartitioning") {
    val docs = Tables.load(spark, sf, "documents")
    def boiler(df: org.apache.spark.sql.DataFrame) =
      graft.text.Corpus.boilerplateFraction(df, minDocs = 2)
        .as[(Long, Long, Long, Double)].collect().toSet
    assert(boiler(docs.repartition(6)) == boiler(docs))
  }

  test("mixture sampling and source overlap are invariant under repartitioning") {
    val docs = Tables.load(spark, sf, "documents")
    val w = Map("src0" -> 0.4, "src1" -> 0.2, "src2" -> 0.1)
    def mix(df: org.apache.spark.sql.DataFrame) =
      graft.text.Corpus.mixtureSample(df, w, budget = 100)
        .as[(Long, String, String)].collect().toSet
    val base = mix(docs)
    assert(base.nonEmpty)
    assert(mix(docs.repartition(7)) == base)
    def overlap(df: org.apache.spark.sql.DataFrame) =
      graft.text.Corpus.sourceOverlap(
        df.filter(col("source").isin("src0", "src1", "src2")))
        .as[(String, String, Long, Long, Long, Double)].collect().toSet
    assert(overlap(docs.repartition(5)) == overlap(docs))
  }

  test("bpe pair counts and token mixture are invariant under repartitioning") {
    val docs = Tables.load(spark, sf, "documents")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      graft.text.Corpus.bpePairCounts(df, minCount = 2)
        .as[(String, String, Long)].collect().toSet
    val base = pairs(docs)
    assert(base.nonEmpty)
    assert(pairs(docs.repartition(7)) == base)
    def mix(df: org.apache.spark.sql.DataFrame) =
      graft.text.Corpus.tokenMixtureSample(df,
        Map("src0" -> 0.4, "src1" -> 0.2, "src2" -> 0.1), tokenBudget = 5000)
        .as[(Long, String, String)].collect().toSet
    val mbase = mix(docs)
    assert(mbase.nonEmpty)
    assert(mix(docs.repartition(5, col("source"))) == mbase)
  }

  test("global shuffle is invariant under repartitioning") {
    val docs = Tables.load(spark, sf, "documents")
    def shuf(df: org.apache.spark.sql.DataFrame) =
      graft.text.Corpus.globalShuffle(df, numShards = 4)
        .as[(Long, Int, Long)].collect().toSet
    val base = shuf(docs)
    assert(shuf(docs.repartition(7)) == base)
    assert(shuf(docs.repartition(3, col("doc_id"))) == base)
  }

  test("histogram quantile state is invariant under repartitioning") {
    // bucket counts merge associatively — partial-merge order and the
    // per-day grouping must not leak into the rolled-up quantile
    val ev = Tables.load(spark, sf, "events")
    def p50(df: org.apache.spark.sql.DataFrame) =
      Agg.histQuantile(Agg.dailyValueHist(df, width = 1.0), q = 0.5)
        .as[(String, Long, Long, Double, Double)].collect().toSet
    assert(p50(ev.repartition(9)) == p50(ev))
  }

  test("repeated spans and scrub are invariant under repartitioning") {
    val docs = Tables.load(spark, sf, "documents")
    def spans(df: org.apache.spark.sql.DataFrame) =
      graft.text.TextDedup.repeatedSpans(df, 3, 2, 6)
        .as[(Long, Long, Long, Long)].collect().toSet
    def scrub(df: org.apache.spark.sql.DataFrame) =
      graft.text.TextDedup.scrubRepeatedSpans(df)
        .as[(Long, Long, Long, String)].collect().toSet
    assert(spans(docs.repartition(7)) == spans(docs))
    assert(scrub(docs.repartition(5, col("doc_id"))) == scrub(docs))
  }

  test("scd2 history and corpus diff are invariant under repartitioning") {
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
    def hist(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Upsert.scd2FromChanges(df, Seq("user_id"), "event_type",
        "ts", tieCols = Seq("event_id"))
        .as[(Long, Long, String, java.sql.Timestamp, Long,
          java.sql.Timestamp, Option[java.sql.Timestamp], Int)]
        .collect().toSet
    assert(hist(ev.repartition(9)) == hist(ev))
    val docs = Tables.load(spark, sf, "documents")
    val v2 = docs.withColumn("text",
      when(col("doc_id") % 7 === 0, upper(col("text"))).otherwise(col("text")))
    def diff(a: org.apache.spark.sql.DataFrame) =
      graft.text.Corpus.corpusDiff(a, v2)
        .as[(Long, String)].collect().toSet
    assert(diff(docs.repartition(6)) == diff(docs))
  }

  test("funnel conversion and retention cohorts are invariant under repartitioning") {
    val ev = Tables.load(spark, sf, "events")
    def funnel(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Joins.funnelConversion(df, Seq("view", "click", "purchase"))
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp,
          java.sql.Timestamp)].collect().toSet
    assert(funnel(ev.repartition(9)) == funnel(ev))
    def cohorts(df: org.apache.spark.sql.DataFrame) =
      Agg.retentionCohorts(df)
        .as[(java.sql.Date, Long, Long, Long, Double)].collect().toSet
    assert(cohorts(ev.repartition(7)) == cohorts(ev))
  }
}
