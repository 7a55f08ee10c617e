package graft

import org.apache.spark.sql.functions._
import graft.text.{Corpus, LangModel}

/** The round-12 quality-curation family: bigram-LM perplexity (q153-q155),
  * containment dedup (q156), Efraimidis-Spirakis weighted sampling (q157),
  * per-stratum winsorization (q158), n-gram novelty (q159). Each leg pins
  * the property its oracle cannot express: the hand-computed ppl formula,
  * the float-decision margins (mid-gap threshold, top-k boundary), the
  * containment-vs-Jaccard asymmetry, and the exact percentile clamp.
  */
class LangModelSpec extends SparkSpec {

  private val sf0001 = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf0001/documents.parquet")

  import spark.implicits._

  test("bigram LM counts and hand-computed perplexity on a fixture") {
    // corpus: "a b a b" (doc 0), "a b c" (doc 1).
    // bigrams: (a,b)x2+(a,b) -> wait, doc 0: (a,b),(b,a),(a,b); doc 1:
    // (a,b),(b,c). c12: (a,b)=3, (b,a)=1, (b,c)=1. c1: a.=3, b.=2. V=3.
    val d = Seq((0L, "a b a b"), (1L, "a b c")).toDF("doc_id", "text")
    val lm = LangModel.bigramLm(d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(lm(("a", "b")) == (3L, 3L))
    assert(lm(("b", "a")) == (1L, 2L))
    assert(lm(("b", "c")) == (1L, 2L))

    // doc 1 score: p(b|a) = (3+1)/(3+3) = 2/3; p(c|b) = (1+1)/(2+3) = 2/5.
    // ppl = exp(-(ln(2/3) + ln(2/5)) / 2)
    val row = LangModel.perplexity(d).filter(col("doc_id") === 1).collect()(0)
    val expected = math.exp(-(math.log(2.0 / 3) + math.log(2.0 / 5)) / 2)
    assert(math.abs(row.getAs[Double]("ppl") - expected) < 1e-12)
    assert(row.getAs[Long]("n_bigrams") == 2L)
    assert(row.getAs[Long]("n_known") == 2L)
    assert(row.getAs[Long]("sum_c12") == 4L)
    assert(row.getAs[Long]("sum_c1") == 5L)

    // unseen bigram with seen left context: "b b" -> c12=0, c1(b)=2, V=3
    // -> p = 1/5; unseen left context "z q" -> p = 1/(0+3) = 1/3.
    val probe = Seq((7L, "b b"), (8L, "z q")).toDF("doc_id", "text")
    val scored = LangModel.perplexity(probe, LangModel.bigramLm(d))
    // vocabSize comes from the SCORED docs' tokens here (self-vocab of the
    // probe = {b} and {z,q}) — so pin via the two-arg form against d's LM
    // only where V cancels: n_known must be 0 for both.
    val byId = scored.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(7L).getAs[Long]("n_known") == 0L)
    assert(byId(7L).getAs[Long]("sum_c1") == 2L) // b seen as left context
    assert(byId(8L).getAs[Long]("sum_c1") == 0L) // z never a left context
  }

  test("two-corpus transfer (q170 shape): stats hand-computed, V from the scored corpus") {
    // reference LM: "a b a b" + "a b c" -> c12: (a,b)=3,(b,a)=1,(b,c)=1;
    // c1: a=3, b=2 (the fixture from the first test).
    val train = Seq((0L, "a b a b"), (1L, "a b c")).toDF("doc_id", "text")
    // scored corpus: "a b x" -> (a,b) known + (b,x) unseen-with-seen-left;
    //                "x y"   -> (x,y) unseen left context entirely.
    val scoreMe = Seq((10L, "a b x"), (11L, "x y")).toDF("doc_id", "text")
    val out = graft.text.LangModel.perplexity(scoreMe,
      graft.text.LangModel.bigramLm(train))
    val got = out.collect().map(r => r.getLong(0) ->
      ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_known"),
        r.getAs[Long]("sum_c12"), r.getAs[Long]("sum_c1"),
        r.getAs[Double]("ppl")))).toMap
    // doc 10: n_bigrams 2, n_known 1 ((a,b)); sum_c12 = 3; sum_c1 = 3+2
    assert(got(10L)._1 == 2L && got(10L)._2 == 1L &&
      got(10L)._3 == 3L && got(10L)._4 == 5L)
    // doc 11: everything unseen
    assert(got(11L)._1 == 1L && got(11L)._2 == 0L &&
      got(11L)._3 == 0L && got(11L)._4 == 0L)
    // V is the SCORED corpus's vocabulary ({a,b,x,y} -> 4): the smoothing
    // denominator adapts to what is being scored, the LM supplies counts
    // only. Hand-computed: doc 10 p(b|a)=(3+1)/(3+4), p(x|b)=(0+1)/(2+4);
    // doc 11 p(y|x)=1/(0+4).
    val p10 = math.exp(-(math.log(4.0 / 7) + math.log(1.0 / 6)) / 2)
    assert(math.abs(got(10L)._5 - p10) < 1e-12)
    assert(math.abs(got(11L)._5 - 4.0) < 1e-12)
    // transfer signal: the out-of-domain doc scores strictly worse
    assert(got(11L)._5 > got(10L)._5)
  }

  test("q155 ppl-filter threshold sits mid-gap: margin >= 1e-6 at sf0.001") {
    val thr = 30.9497
    val margin = LangModel.perplexity(docs)
      .agg(min(abs(col("ppl") - thr))).collect()(0).getDouble(0)
    // cross-engine ln/sum noise is ~1e-12; a 1e-6 floor is 6 orders above
    // it (measured margin at all three SFs is >= 6.1e-3).
    assert(margin >= 1e-6, s"ppl margin $margin too tight for oracle safety")
  }

  test("containment flags a contained quote that Jaccard misses") {
    val short = "alpha beta gamma delta epsilon zeta"
    val long = short + " " + (1 to 40).map(i => s"w$i").mkString(" ")
    val d = Seq((1L, short), (2L, long)).toDF("doc_id", "text")
    val pairs = Corpus.containmentPairs(d, n = 3, tauNum = 4, tauDen = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // doc 1 fully contained in doc 2 -> directed (1, 2) flagged
    assert(pairs.contains((1L, 2L)))
    // ... but NOT (2, 1): the long doc is not contained in the short one
    assert(!pairs.contains((2L, 1L)))
    // and the pair's Jaccard is 4/44 — far below any resemblance
    // threshold: shingles(short)=4, shingles(long)=44, inter=4.
    val j = 4.0 / 44
    assert(j < 0.5, "fixture must sit below the MinHash dedup threshold")
  }

  test("containment maxDf guard drops boilerplate-only evidence from both sides") {
    // 4 docs share a hot 3-shingle (df=4 > maxDf=3); docs 10/11 also share
    // a rare one. With the guard, only the rare shingle generates pairs
    // AND n_a excludes the hot shingle — doc 10 has 1 countable shingle,
    // fully matched, so containment = 1/1.
    val hot = "x y z"
    val d = Seq((10L, s"$hot p q r"), (11L, s"$hot p q r s"),
      (12L, s"$hot only here"), (13L, s"$hot again there"))
      .toDF("doc_id", "text")
    val guarded = Corpus.containmentPairs(d, n = 3, tauNum = 1, tauDen = 1,
      maxDf = 3)
    val m = guarded.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // doc 10 countable shingles: "y z p","z p q","p q r" (x y z is hot);
    // doc 11 shares all three -> containment(10 in 11) = 3/3 = 1.
    assert(m(((10L, 11L))) == (3L, 3L))
    assert(!m.contains((12L, 13L))) // hot-shingle-only pair: no evidence
  }

  test("weighted sample: deterministic, k rows, boundary gap, weight bias") {
    val s1 = Corpus.weightedSample(docs, "n_chars", k = 100)
    val s2 = Corpus.weightedSample(docs, "n_chars", k = 100)
    val ids1 = s1.collect().map(_.getLong(0)).toSet
    assert(ids1.size == 100)
    assert(ids1 == s2.collect().map(_.getLong(0)).toSet)

    // the top-k boundary gap is what makes the pow-keyed order oracle-safe
    val u = conv(substring(md5(concat(col("doc_id").cast("string"),
      lit(":graft"))), 1, 12), 16, 10).cast("double") / lit(math.pow(2, 48))
    val keys = docs
      .select(pow(u, lit(1.0) / col("n_chars").cast("double")).as("k"))
      .orderBy(col("k").desc).limit(102).collect().map(_.getDouble(0))
    assert(keys(99) - keys(100) >= 1e-9,
      s"E-S boundary gap ${keys(99) - keys(100)} within cross-engine noise")

    // inclusion ∝ n_chars: the sample must skew heavy
    val sampleMean = s1.agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    val corpusMean = docs.agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean not above corpus mean $corpusMean")
  }

  test("stored LM: chop-invariant scoring, q205 margin, sidecar guards") {
    import graft.text.LangModel
    val dir = java.nio.file.Files.createTempDirectory("graft-lm").toString
    LangModel.writeLm(docs.filter(col("source") === "src0"), dir)
    val pool = docs.filter(col("source") =!= "src0")
    val full = LangModel.perplexityStored(spark, dir, pool)
      .select(col("doc_id"), col("ppl")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // CHOP INVARIANCE — the property the stored form exists for: a doc
    // scored ALONE gets bit-identically the score it gets in the full
    // pool (V is frozen in the sidecar; the self-scored perplexity()
    // would re-derive V from whatever batch the doc happens to ride in)
    val someIds = full.keySet.take(3)
    someIds.foreach { id =>
      val alone = LangModel.perplexityStored(spark, dir,
        pool.filter(col("doc_id") === id)).select(col("ppl"))
        .collect()(0).getDouble(0)
      assert(alone == full(id),
        s"doc $id scored $alone alone vs ${full(id)} in the pool")
    }
    // and the contrast: the self-scored form is NOT chop-invariant
    // (documents the batch convention exists to escape)
    val id0 = full.keySet.min
    val selfAlone = LangModel.perplexity(pool.filter(col("doc_id") === id0))
      .select(col("ppl")).collect()(0).getDouble(0)
    val selfFull = LangModel.perplexity(pool)
      .filter(col("doc_id") === id0)
      .select(col("ppl")).collect()(0).getDouble(0)
    assert(selfAlone != selfFull,
      "self-scored ppl should depend on batch-mates (the documented trade)")
    // q205's threshold margin at sf0.001 (44.0 chosen mid-gap)
    val margin = full.values.map(p => math.abs(p - 44.0)).min
    assert(margin >= 0.5,
      s"q205 threshold margin $margin within cross-engine noise")
    // sidecar guards: missing and corrupt both refused loudly
    val bare = java.nio.file.Files.createTempDirectory("graft-lm-bare").toString
    intercept[IllegalArgumentException] {
      LangModel.readLm(spark, bare)
    }
    val mp = new org.apache.hadoop.fs.Path(dir, "_LM_META")
    val fs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val o = fs.create(mp, true)
    o.write("bogus\n".getBytes("UTF-8")); o.close()
    intercept[IllegalArgumentException] {
      LangModel.readLm(spark, dir)
    }
  }

  test("LM rotation: pinned versions score bit-identically while the head moves; retired pins refuse") {
    import graft.text.LangModel
    import graft.sources.VersionedStore
    val root = java.nio.file.Files.createTempDirectory("graft-lmrot").toString + "/lms"
    val pool = docs.filter(col("source") =!= "src0" && col("source") =!= "src1")
    def score(dir: String) = LangModel.perplexityStored(spark, dir, pool)
      .select(col("doc_id"), col("ppl")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val v1 = LangModel.rotateLm(docs.filter(col("source") === "src0"), root)
    val pinned = LangModel.lmVersionDir(spark, root, v1)
    val s1 = score(pinned)
    // the head moves (retrained on a different stratum) — the pinned
    // version's scores must not move with it
    val v2 = LangModel.rotateLm(docs.filter(col("source") === "src1"), root)
    assert(v2 == v1 + 1 && VersionedStore.versions(spark, root) == Seq(v1, v2))
    assert(score(pinned) == s1,
      "a pinned LM version must score bit-identically after rotation")
    assert(LangModel.latestLmDir(spark, root).endsWith(s"v=$v2"))
    assert(score(LangModel.latestLmDir(spark, root)) != s1,
      "the rotated head is a different model (sanity)")
    // retire the old version: the pin now refuses loudly
    VersionedStore.retire(spark, root, v1)
    intercept[IllegalArgumentException] {
      LangModel.lmVersionDir(spark, root, v1)
    }
    // and an empty store refuses rather than inventing a model
    intercept[IllegalArgumentException] {
      LangModel.latestLmDir(spark,
        java.nio.file.Files.createTempDirectory("graft-lmrot2").toString)
    }
  }

  test("dsir: importanceStats matches two perplexity passes; sample is deterministic, target-biased, gap-safe") {
    import graft.text.LangModel
    val pool = docs.filter(col("source") =!= "src0" && col("source") =!= "src1")
    val lmT = LangModel.bigramLm(docs.filter(col("source") === "src0"))
    val lmR = LangModel.bigramLm(docs.filter(col("source") === "src1"))
    // the one-pass stats must equal the two single-LM scoring passes
    val got = LangModel.importanceStats(pool, lmT, lmR)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    def side(lm: org.apache.spark.sql.DataFrame) =
      LangModel.perplexity(pool, lm).collect().map(r =>
        r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_bigrams"),
          r.getAs[Long]("n_known"), r.getAs[Long]("sum_c12"),
          r.getAs[Long]("sum_c1")))).toMap
    val (t, r) = (side(lmT), side(lmR))
    assert(got.keySet == t.keySet)
    got.foreach { case (id, (nb, nkt, sct, s1t, nkr, scr, s1r)) =>
      assert((nb, nkt, sct, s1t) == t(id) && (nb, nkr, scr, s1r) == r(id),
        s"doc $id: fused stats must equal the per-LM passes")
    }
    // log_w direction: a doc whose bigrams the target LM knows and the
    // reference LM does not must out-score the reverse case — use the
    // extreme docs the corpus itself provides
    val lw = LangModel.importanceStats(pool, lmT, lmR)
      .select(col("doc_id"), col("log_w"), col("n_known_t"), col("n_known_r"))
      .collect()
    val tHeavy = lw.filter(x => x.getLong(2) > 0 && x.getLong(3) == 0)
    val rHeavy = lw.filter(x => x.getLong(2) == 0 && x.getLong(3) > 0)
    if (tHeavy.nonEmpty && rHeavy.nonEmpty)
      assert(tHeavy.map(_.getDouble(1)).min > rHeavy.map(_.getDouble(1)).max,
        "target-known docs must carry higher log_w than reference-known docs")
    // the resample: deterministic, k rows, and the selection skews toward
    // higher log_w than the pool average
    val s1 = LangModel.dsirSample(pool, lmT, lmR, k = 50)
    val s2 = LangModel.dsirSample(pool, lmT, lmR, k = 50)
    val ids = s1.collect().map(_.getLong(0)).toSet
    assert(ids.size == 50 && ids == s2.collect().map(_.getLong(0)).toSet)
    val sMean = s1.agg(avg(col("log_w"))).collect()(0).getDouble(0)
    val pMean = LangModel.importanceStats(pool, lmT, lmR)
      .agg(avg(col("log_w"))).collect()(0).getDouble(0)
    assert(sMean > pMean,
      s"dsir sample mean log_w $sMean not above pool mean $pMean")
    // top-k boundary gap (the oracle-safety measurement, E-S discipline)
    val u = conv(substring(md5(concat(col("doc_id").cast("string"),
      lit(":graft"))), 1, 12), 16, 10).cast("double") / lit(math.pow(2, 48))
    val keys = LangModel.importanceStats(pool, lmT, lmR)
      .select((log(u) * exp(-col("log_w"))).as("k"))
      .orderBy(col("k").desc).limit(52).collect().map(_.getDouble(0))
    assert(keys(49) - keys(50) >= 1e-9,
      s"dsir boundary gap ${keys(49) - keys(50)} within cross-engine noise")
  }

  test("winsorize clamps to exact interpolated per-stratum percentiles") {
    val out = Corpus.winsorize(docs, "n_chars", "lang", 0.05, 0.95)
    val rows = out.collect()
    rows.foreach { r =>
      val c = r.getAs[Double]("clamped")
      assert(c >= r.getAs[Double]("p_lo") - 1e-9 &&
        c <= r.getAs[Double]("p_hi") + 1e-9)
    }
    // pin one stratum's p_lo against the textbook interpolation
    val en = docs.filter(col("lang") === "en")
      .select(col("n_chars")).collect().map(_.getLong(0)).sorted
    val h = 0.05 * (en.length - 1)
    val lo = en(h.toInt) + (h - h.toInt) * (en(h.toInt + 1) - en(h.toInt))
    val got = rows.find(_.getAs[String]("lang") == "en").get
      .getAs[Double]("p_lo")
    assert(math.abs(got - lo) < 1e-9, s"p_lo $got != interpolated $lo")
  }

  test("novelty: first doc all-novel, exact re-crawl scores zero") {
    val d = Seq(
      (1L, "one two three four five"),
      (2L, "one two three four five"), // exact re-crawl of doc 1
      (3L, "six seven eight nine ten")).toDF("doc_id", "text")
    val m = Corpus.ngramNovelty(d, n = 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m(1L) == (3L, 3L)) // 3 shingles, all first-seen here
    assert(m(2L) == (3L, 0L)) // same shingles, zero novel
    assert(m(3L) == (3L, 3L))
  }
}
