package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.text.Corpus
import graft.vector.{Retrieval, Similarity}

/** Round-12 wave 2: hybrid RRF retrieval (q160), the novelty shingle
  * index (q161 — delta-index family member six), and percentile-rank
  * normalization (q162).
  */
class RetrievalSpec extends SparkSpec {

  private val sf0001 = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf0001/documents.parquet")
  private def emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  import spark.implicits._

  test("rrfFuse: union semantics, one term per missing list") {
    val dense = Seq((0L, 10L, 1), (0L, 11L, 2)).toDF("probe_id", "doc_id", "rank")
    val sparse = Seq((0L, 11L, 1), (0L, 12L, 2)).toDF("probe_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(dense, sparse, k = 10)
      .collect().map(r => r.getLong(1) -> r.getAs[Double]("rrf")).toMap
    assert(math.abs(out(10L) - 1.0 / 61) < 1e-15) // dense only
    assert(math.abs(out(11L) - (1.0 / 62 + 1.0 / 61)) < 1e-15) // both
    assert(math.abs(out(12L) - 1.0 / 62) < 1e-15) // sparse only
    // doc 11 (rank 2 + rank 1) beats both single-list docs
    assert(out(11L) > out(10L) && out(11L) > out(12L))
  }

  test("rrfFuse over full per-retriever lists == the exact hybrid grid") {
    // dense list: bruteForceTopK with k = corpus (same ordering contract
    // as hybrid's rank_vec: cosine desc, id asc)
    val probes = emb.filter(col("vec_id") < 3)
    val dense = Similarity.bruteForceTopK(emb, probes, k = 1000)
      .select(col("probe_id"), col("neighbor_id").as("doc_id"), col("rank"))
    // sparse list: the keyword-overlap ranking rebuilt independently
    val toks = docs.select(col("doc_id"),
      explode(graft.text.TextAnalysis.tokens(col("text"))).as("token"))
      .distinct()
    val pt = toks.filter(col("doc_id") < 3)
      .select(col("doc_id").as("probe_id"), col("token"))
    val allCand = emb.select(col("vec_id").as("doc_id"))
      .crossJoin(pt.select(col("probe_id")).distinct())
      .filter(col("doc_id") =!= col("probe_id"))
    val ov = toks.join(pt, Seq("token"))
      .filter(col("doc_id") =!= col("probe_id"))
      .groupBy(col("probe_id"), col("doc_id"))
      .agg(count(lit(1)).as("kw_overlap"))
    val sparse = allCand.join(ov, Seq("probe_id", "doc_id"), "left")
      .withColumn("kw_overlap", coalesce(col("kw_overlap"), lit(0L)))
      .withColumn("rank", row_number().over(Window.partitionBy(col("probe_id"))
        .orderBy(col("kw_overlap").desc, col("doc_id"))))
      .select(col("probe_id"), col("doc_id"), col("rank"))
    val fused = Retrieval.rrfFuse(dense, sparse, k = 10)
      .select(col("probe_id"), col("doc_id"), col("rank_vec"),
        col("rank_kw"), col("rrf"), col("rank_rrf"))
    val exact = Retrieval.hybridRrfTopK(emb, docs, nProbes = 3, k = 10)
      .select(col("probe_id"), col("doc_id"), col("rank_vec"),
        col("rank_kw"), col("rrf"), col("rank_rrf"))
    assert(fused.except(exact).isEmpty && exact.except(fused).isEmpty,
      "production fusion over full lists must equal the exact grid")
  }

  test("sparseTopN == an independent overlap ranking head (q169's sparse retriever)") {
    val got = Retrieval.sparseTopN(docs, nProbes = 3, n = 20)
    val toks = docs.select(col("doc_id"),
      explode(graft.text.TextAnalysis.tokens(col("text"))).as("token"))
      .distinct()
    val pt = toks.filter(col("doc_id") < 3)
      .select(col("doc_id").as("probe_id"), col("token"))
    val expect = toks.join(pt, Seq("token"))
      .filter(col("doc_id") =!= col("probe_id"))
      .groupBy(col("probe_id"), col("doc_id"))
      .agg(count(lit(1)).as("kw_overlap"))
      .withColumn("rank", row_number().over(Window.partitionBy(col("probe_id"))
        .orderBy(col("kw_overlap").desc, col("doc_id"))))
      .filter(col("rank") <= 20)
      .select(col("probe_id"), col("doc_id"), col("rank"))
    assert(got.except(expect).isEmpty && expect.except(got).isEmpty,
      "sparseTopN must equal the overlap ranking head")
    // retriever contract: never more than n rows per probe, ranks dense 1..m
    val perProbe = got.groupBy(col("probe_id"))
      .agg(count(lit(1)).as("n"), max(col("rank")).as("mx"))
      .collect()
    perProbe.foreach { r =>
      assert(r.getAs[Long]("n") <= 20 && r.getAs[Int]("mx") == r.getAs[Long]("n"),
        s"ranks must be dense 1..n per probe: $r")
    }
  }

  test("q169 composition: zero-overlap docs fuse with null rank_kw (union semantics)") {
    // doc 5 shares no token with probe 0 — the inverted index never
    // surfaces it, so the fused row (reachable via dense only) must carry
    // a NULL rank_kw and exactly the single dense term. This is the
    // contract DIFFERENCE vs the exact grid (which ranks zero-overlap
    // docs too) and the reason rrfFuse's terms are null-guarded.
    val d = Seq((0L, "alpha beta"), (1L, "alpha gamma"), (5L, "zeta eta"))
      .toDF("doc_id", "text")
    val sparse = Retrieval.sparseTopN(d, nProbes = 1, n = 10)
    assert(!sparse.filter(col("doc_id") === 5).collect().nonEmpty,
      "zero-overlap doc must be absent from the sparse list")
    val dense = Seq((0L, 5L, 1), (0L, 1L, 2)).toDF("probe_id", "doc_id", "rank")
    val fused = Retrieval.rrfFuse(dense, sparse, k = 10)
      .collect().map(r => r.getLong(1) -> r).toMap
    assert(fused(5L).isNullAt(fused(5L).fieldIndex("rank_kw")))
    assert(math.abs(fused(5L).getAs[Double]("rrf") - 1.0 / 61) < 1e-15)
    // doc 1 has both terms: dense rank 2 + sparse rank 1
    assert(math.abs(fused(1L).getAs[Double]("rrf") - (1.0 / 62 + 1.0 / 61)) < 1e-15)
  }

  test("rerank: pair features match direct sets, blend order, candidate-bounded") {
    val dense = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 3),
        k = 20)
      .select(col("probe_id"), col("neighbor_id").as("doc_id"), col("rank"))
    val sparse = Retrieval.sparseTopN(docs, nProbes = 3, n = 20)
    val cands = Retrieval.rrfFuse(dense, sparse, k = 20)
    val out = Retrieval.rerank(cands, emb, docs, k = 10)
    val rows = out.collect()
    // candidate-bounded: every output pair came from the first stage,
    // exactly k per probe, ranks dense 1..k
    val candSet = cands.select(col("probe_id"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.forall(r => candSet((r.getAs[Long]("probe_id"),
      r.getAs[Long]("doc_id")))))
    rows.groupBy(_.getAs[Long]("probe_id")).foreach { case (_, g) =>
      assert(g.length == 10 &&
        g.map(_.getAs[Int]("rank")).sorted.sameElements(1 to 10))
    }
    // pair-joint features equal a direct token-set computation, and the
    // blend is exactly 0.5·cosine + 0.5·jaccard (same one-step FP)
    val ids = rows.flatMap(r => Seq(r.getAs[Long]("probe_id"),
      r.getAs[Long]("doc_id"))).distinct
    val tokSets = docs.filter(col("doc_id").isin(ids: _*))
      .select(col("doc_id"),
        graft.text.TextAnalysis.tokens(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    rows.foreach { r =>
      val (p, d) = (r.getAs[Long]("probe_id"), r.getAs[Long]("doc_id"))
      val inter = (tokSets(p) & tokSets(d)).size
      assert(r.getAs[Long]("n_inter") == inter.toLong,
        s"n_inter mismatch for ($p, $d)")
      val jac = inter.toDouble /
        (tokSets(p).size + tokSets(d).size - inter).toDouble
      assert(r.getAs[Double]("jaccard") == jac)
      assert(r.getAs[Double]("score") ==
        0.5 * r.getAs[Double]("cosine") + 0.5 * jac)
    }
    // per-probe order is (score desc, doc_id asc)
    rows.groupBy(_.getAs[Long]("probe_id")).foreach { case (_, g) =>
      val sorted = g.sortBy(_.getAs[Int]("rank"))
      sorted.sliding(2).foreach { case Array(a, b) =>
        val (sa, sb) = (a.getAs[Double]("score"), b.getAs[Double]("score"))
        assert(sa > sb || (sa == sb &&
          a.getAs[Long]("doc_id") < b.getAs[Long]("doc_id")))
      case _ => ()
      }
    }
    // wCos = 1 degenerates to the pure pair-cosine ordering
    Retrieval.rerank(cands, emb, docs, k = 10, wCos = 1.0).collect()
      .foreach(r => assert(
        r.getAs[Double]("score") == r.getAs[Double]("cosine")))
  }

  test("novelty shingle index: overlapping append == one-shot rebuild; replay appends nothing") {
    val dir = java.nio.file.Files.createTempDirectory("shidx").toString
    val oneShot = s"$dir/full"
    val waves = s"$dir/waves"
    val corpus = docs.filter(col("doc_id") % 5 =!= 4)
    Corpus.writeShingleIndex(corpus, oneShot, n = 3)
    Corpus.writeShingleIndex(docs.filter(col("doc_id") % 5 < 2), waves, n = 3)
    Corpus.appendShingleIndex(spark, waves,
      docs.filter(col("doc_id") % 5 =!= 4 && col("doc_id") % 5 >= 1))
    val a = spark.read.parquet(oneShot).collect().map(_.getLong(0)).toSet
    val b = spark.read.parquet(waves).collect().map(_.getLong(0)).toSet
    assert(a == b, "overlap-appended index diverged from one-shot build")
    // replay: re-append an already-indexed batch -> zero new rows
    val before = spark.read.parquet(waves).count()
    Corpus.appendShingleIndex(spark, waves,
      docs.filter(col("doc_id") % 5 === 2))
    assert(spark.read.parquet(waves).count() == before,
      "replayed batch appended rows")
    // probe equals the per-doc-vs-corpus semantics (each batch doc scores
    // against the CORPUS only — within-batch sharing does not spend
    // novelty, unlike ngramNovelty's ingest-order form). Independent
    // plain-Scala reference over string shingles (the SpanSpec pattern).
    val batch = docs.filter(col("doc_id") % 5 === 4)
    val viaIndex = Corpus.noveltyAgainstIndex(spark, waves, batch)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def shingleSet(text: String): Set[String] =
      text.split("\\s+").sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
    val corpusShingles = corpus.select(col("text")).collect()
      .flatMap(r => shingleSet(r.getString(0))).toSet
    val expect = batch.select(col("doc_id"), col("text")).collect()
      .map { r =>
        val sh = shingleSet(r.getString(1))
        r.getLong(0) -> (sh.size.toLong, (sh -- corpusShingles).size.toLong)
      }.toMap
    assert(viaIndex == expect)
  }

  test("bucketed shingle table: probe == path probe; replay appends nothing; meta guarded") {
    val dir = java.nio.file.Files.createTempDirectory("shtbl").toString
    val corpus1 = docs.filter(col("doc_id") % 5 < 2)
    val corpus2 = docs.filter(col("doc_id") % 5 =!= 4 &&
      col("doc_id") % 5 >= 1) // overlaps wave 1 at residue 1
    val batch = docs.filter(col("doc_id") % 5 === 4)
    // path layout (the q161 form) as the reference
    val path = s"$dir/path"
    Corpus.writeShingleIndex(corpus1, path, n = 3)
    Corpus.appendShingleIndex(spark, path, corpus2)
    val tbl = "graft_shingles_spec"
    if (spark.catalog.tableExists(tbl)) spark.sql(s"DROP TABLE $tbl")
    Corpus.writeShingleTable(corpus1, tbl, n = 3)
    Corpus.appendShingleTable(spark, tbl, corpus2)
    // the two layouts hold the identical hash set...
    val a = spark.read.parquet(path).collect().map(_.getLong(0)).toSet
    val b = spark.table(tbl).collect().map(_.getLong(0)).toSet
    assert(a == b, "bucketed table diverged from the path index")
    // ...and answer the probe identically
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
    assert(rows(Corpus.noveltyAgainstTable(spark, tbl, batch)) ==
      rows(Corpus.noveltyAgainstIndex(spark, path, batch)))
    // replay: re-sent batch appends nothing (the anti-join guard)
    val before = spark.table(tbl).count()
    Corpus.appendShingleTable(spark, tbl,
      docs.filter(col("doc_id") % 5 === 2))
    assert(spark.table(tbl).count() == before, "replayed batch appended")
    // width rides the catalog: a 2-gram table answers 2-gram probes
    val tbl2 = "graft_shingles_spec_w2"
    if (spark.catalog.tableExists(tbl2)) spark.sql(s"DROP TABLE $tbl2")
    Corpus.writeShingleTable(docs.limit(10), tbl2, n = 2)
    val probe = Seq((9999L, "alpha beta gamma")).toDF("doc_id", "text")
    assert(Corpus.noveltyAgainstTable(spark, tbl2, probe)
      .collect()(0).getLong(1) == 2L)
    // a table not built by writeShingleTable is refused
    val bare = "graft_shingles_spec_bare"
    if (spark.catalog.tableExists(bare)) spark.sql(s"DROP TABLE $bare")
    graft.sources.Tables.clearOrphanedWarehouseDir(spark, bare)
    docs.limit(5).select(xxhash64(col("text")).as("_h"))
      .write.saveAsTable(bare)
    val e = intercept[IllegalArgumentException] {
      Corpus.noveltyAgainstTable(spark, bare, probe)
    }
    assert(e.getMessage.contains("graft.shingle"))
  }

  test("bucketed pair table: overlapping append == one-shot containment; " +
      "replay appends nothing") {
    val corpus1 = docs.filter(col("doc_id") % 5 < 2)
    val corpus2 = docs.filter(col("doc_id") % 5 =!= 4 &&
      col("doc_id") % 5 >= 1) // overlaps wave 1 at residue 1
    val all = corpus1.unionByName(
      corpus2.join(corpus1.select(col("doc_id")), Seq("doc_id"), "left_anti"))
    val tbl = "graft_shingle_pairs_spec"
    if (spark.catalog.tableExists(tbl)) spark.sql(s"DROP TABLE $tbl")
    Corpus.writeShinglePairTable(corpus1, tbl, n = 3)
    Corpus.appendShinglePairTable(spark, tbl, corpus2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(rows(Corpus.containmentOverTable(spark, tbl)) ==
      rows(Corpus.containmentPairs(all, n = 3)),
      "append-built table must answer exactly like the one-shot scan")
    // replayed batch: the doc-level anti-join admits nothing
    val before = spark.table(tbl).count()
    Corpus.appendShinglePairTable(spark, tbl, corpus2)
    assert(spark.table(tbl).count() == before,
      "a replayed ingest batch must append zero rows")
    spark.sql(s"DROP TABLE $tbl")
  }

  test("refcounted shingle index: forget == never-ingested; compaction view-stable") {
    val dir = java.nio.file.Files.createTempDirectory("shrc").toString
    val waveA = docs.filter(col("doc_id") % 5 < 2)
    val waveB = docs.filter(col("doc_id") % 5 === 2 ||
      col("doc_id") % 5 === 3)
    val gone = docs.filter(col("doc_id") % 10 === 1) // subset of wave A
    def view(d: String) =
      Corpus.readShingleIndexRc(spark, d).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // ledger build: two disjoint appends, then forget part of wave A
    val led = s"$dir/ledger"
    Corpus.writeShingleIndexRc(waveA, led, n = 3)
    Corpus.appendShingleIndexRc(spark, led, waveB)
    Corpus.forgetShingles(spark, led, gone)
    // never-ingested reference: one build over (A ∪ B) minus gone
    val refDir = s"$dir/ref"
    Corpus.writeShingleIndexRc(
      waveA.unionByName(waveB)
        .join(gone.select(col("doc_id")), Seq("doc_id"), "left_anti"),
      refDir, n = 3)
    assert(view(led) == view(refDir),
      "forget ∘ append must equal the never-ingested build, counts included")
    // compaction: identical view, fewer files, still appendable
    val filesBefore = new java.io.File(led)
      .listFiles().count(_.getName.endsWith(".parquet"))
    Corpus.compactShingleIndexRc(spark, led)
    assert(view(led) == view(refDir), "compaction must preserve the view")
    val filesAfter = new java.io.File(led)
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(filesAfter < filesBefore,
      s"compaction must shrink the ledger: $filesBefore -> $filesAfter")
    // post-compaction forget still works (the ledger stays a ledger)
    val gone2 = docs.filter(col("doc_id") % 10 === 6) // subset of wave A
    Corpus.forgetShingles(spark, led, gone2)
    Corpus.writeShingleIndexRc(
      waveA.unionByName(waveB).join(
        gone.unionByName(gone2).select(col("doc_id")),
        Seq("doc_id"), "left_anti"),
      s"$dir/ref2", n = 3)
    assert(view(led) == view(s"$dir/ref2"))
    // the probe view matches the set-index probe over the live corpus
    val batch = docs.filter(col("doc_id") % 5 === 4)
    Corpus.writeShingleIndex(
      waveA.unionByName(waveB).join(
        gone.unionByName(gone2).select(col("doc_id")),
        Seq("doc_id"), "left_anti"),
      s"$dir/set", n = 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
    assert(rows(Corpus.noveltyAgainstRcIndex(spark, led, batch)) ==
      rows(Corpus.noveltyAgainstIndex(spark, s"$dir/set", batch)),
      "the rc probe must answer exactly like the set index on the live corpus")
  }

  test("refcounted shingle index: replayed takedown is a no-op; " +
      "never-ingested forget fails loud at compaction") {
    val dir = java.nio.file.Files.createTempDirectory("shrcfg").toString
    def view(d: String) =
      Corpus.readShingleIndexRc(spark, d).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val led = s"$dir/ledger"
    Corpus.writeShingleIndexRc(docs.filter(col("doc_id") % 5 < 4), led, n = 3)
    val gone = docs.filter(col("doc_id") % 10 === 1)
    Corpus.forgetShingles(spark, led, gone)
    val after = view(led)
    // at-least-once takedown queue: the SAME takedown re-delivered must
    // not decrement shared hashes a second time
    Corpus.forgetShingles(spark, led, gone)
    assert(view(led) == after,
      "a replayed takedown must be dropped by the forgotten-ids ledger")
    // a replayed batch that is PARTLY new forgets only the new part
    val gone2 = gone.unionByName(docs.filter(col("doc_id") % 10 === 6))
    Corpus.forgetShingles(spark, led, gone2)
    Corpus.writeShingleIndexRc(
      docs.filter(col("doc_id") % 5 < 4).join(
        gone2.select(col("doc_id")), Seq("doc_id"), "left_anti"),
      s"$dir/ref", n = 3)
    assert(view(led) == view(s"$dir/ref"),
      "a mixed replay/new takedown batch must decrement only the new ids")
    // compaction stays green on the guarded history, and clears the
    // ledger so a fresh post-compaction forget is admitted
    Corpus.compactShingleIndexRc(spark, led)
    assert(view(led) == view(s"$dir/ref"))
    // never-ingested forget: decrements with no matching ingest must
    // fail LOUD at the next compaction, not vanish behind the >0 filter
    Corpus.forgetShingles(spark, led,
      Seq((999999L, "zz qq vv ww xx yy")).toDF("doc_id", "text"))
    val e = intercept[IllegalArgumentException] {
      Corpus.compactShingleIndexRc(spark, led)
    }
    assert(e.getMessage.contains("fold negative"))
  }

  test("shingle index width rides the sidecar, pre-sidecar dirs fail loudly") {
    val dir = java.nio.file.Files.createTempDirectory("shidx2").toString
    Corpus.writeShingleIndex(docs.limit(10), s"$dir/w2", n = 2)
    // a probe against the 2-gram index must count 2-gram shingles:
    // n_shingles per doc = tokens - 1 (all distinct in this fixture)
    val probe = Seq((9999L, "alpha beta gamma")).toDF("doc_id", "text")
    val row = Corpus.noveltyAgainstIndex(spark, s"$dir/w2", probe).collect()(0)
    assert(row.getLong(1) == 2L, "width must come from the sidecar (2-grams)")
    val bare = s"$dir/bare"
    docs.limit(5).select(xxhash64(col("text")).as("_h")).write.parquet(bare)
    val e = intercept[IllegalArgumentException] {
      Corpus.noveltyAgainstIndex(spark, bare, probe)
    }
    assert(e.getMessage.contains("_SHINGLE_META"))
  }

  test("percentile rank: ties share, singletons are 0, bounds are [0,1]") {
    val d = Seq((1L, "en", 10L), (2L, "en", 10L), (3L, "en", 30L),
      (4L, "zz", 7L)).toDF("doc_id", "lang", "n_chars")
    val m = Corpus.percentileRank(d, "n_chars", "lang")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("pr")).toMap
    assert(m(1L) == 0.0 && m(2L) == 0.0, "tied values must share a rank")
    assert(m(3L) == 1.0)
    assert(m(4L) == 0.0, "single-member stratum is 0 by convention")
  }

  test("novelty gate stream: re-crawl rejected, novel doc admitted, replay converges") {
    import graft.streaming.CorpusStream
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val dir = java.nio.file.Files.createTempDirectory("novstream").toString
    val src = s"$dir/src"
    val idx = s"$dir/idx"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))

    Corpus.writeShingleIndex(
      Seq((1L, "the quick brown fox jumps over the lazy dog"))
        .toDF("doc_id", "text"), idx, n = 3)
    // batch: a verbatim re-crawl (novelty 0 -> rejected) and a fresh doc
    val batch = Seq(
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different words appear in this one"))
      .toDF("doc_id", "text")
    batch.coalesce(1).write.mode("overwrite").parquet(s"$src/b1")

    val admitted = CorpusStream.noveltyGateBatch(spark, batch, idx, 1, 2)
      .collect().map(_.getLong(0)).toSet
    assert(admitted == Set(3L), "only the novel doc clears the gate")

    CorpusStream.noveltyGateQuery(spark, s"$src/*", idx, s"$dir/cp1",
      schema).awaitTermination()
    val afterFirst = spark.read.parquet(idx).collect()
      .map(_.getLong(0)).toSet
    // doc 3's shingles joined the index; doc 2 spent nothing
    assert(afterFirst.size > 7, "admitted doc's shingles must append")

    // full replay from a FRESH checkpoint: the anti-join append converges
    // the index to the same hash set
    CorpusStream.noveltyGateQuery(spark, s"$src/*", idx, s"$dir/cp2",
      schema).awaitTermination()
    assert(spark.read.parquet(idx).collect().map(_.getLong(0)).toSet
      == afterFirst, "replay must not change the index")
  }

  test("PSI drift: identical snapshots score ~0, a shifted one scores high") {
    import graft.ops.Profile
    val ref = docs.filter(col("doc_id") % 2 === 0)
    val same = Profile.psi(
      Profile.driftBuckets(ref, ref, "n_chars")).collect()(0).getDouble(0)
    assert(math.abs(same) < 1e-12, s"self-PSI must be 0, got $same")
    // hand-check one smoothing term: buckets (n_ref, n_cur) = (10, 0) and
    // (0, 10) with 2 buckets -> p/q mirror terms
    val b = Seq((0, 10L, 0L), (1, 0L, 10L)).toDF("bucket", "n_ref", "n_cur")
    val got = Profile.psi(b).collect()(0).getDouble(0)
    val p0 = 10.5 / 11.0; val q0 = 0.5 / 11.0
    val expect = 2 * ((p0 - q0) * math.log(p0 / q0))
    assert(math.abs(got - expect) < 1e-12)
    // a genuine shift: current = reference + 50% of its chars
    val shifted = ref.withColumn("n_chars",
      (col("n_chars") * 3 / 2).cast("long"))
    val drift = Profile.psi(
      Profile.driftBuckets(ref, shifted, "n_chars")).collect()(0).getDouble(0)
    assert(drift > 0.25, s"a 1.5x length shift must read as shifted: $drift")
  }

  test("k-anonymity: below-k groups suppressed, survivors intact") {
    val d = Seq((1L, "en", "a"), (2L, "en", "a"), (3L, "en", "a"),
      (4L, "de", "b")).toDF("doc_id", "lang", "source")
    val kept = Corpus.kAnonymityFilter(d, Seq("lang", "source"), k = 3)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept == Set(1L, 2L, 3L), "the singleton (de,b) must be suppressed")
  }
}
