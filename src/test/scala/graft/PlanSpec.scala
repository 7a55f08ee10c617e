package graft

/** Executable plan contracts for the headline queries: the physical-plan
  * properties BASELINE.md's plan audit reads off by hand, pinned as tests
  * so a future change that silently loses a broadcast, a pushed filter,
  * or a map-side partial top-k fails CI instead of the bench.
  *
  * Checks run on the ANALYZED-to-executed plan string at sf0.001 (plan
  * shape does not depend on SF for these: the broadcasts are hinted or
  * literal-inlined, not size-estimated).
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  /** Uncached FileScan nodes in the executed tree. Scans INSIDE an
    * InMemoryRelation are not children of the main plan (the cache
    * node owns them), so a zero count proves every consumer reads the
    * shared cache — robust to whether an earlier test already
    * materialized it (the plan STRING reprints cached subplans, with
    * extra AQE detail once final, so string counts are order-brittle).
    */
  private def uncachedScans(q: String): Int = {
    val exec = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan
    def count(p: org.apache.spark.sql.execution.SparkPlan): Int =
      p.collect {
        case _: org.apache.spark.sql.execution.FileSourceScanExec => 1
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          count(a.inputPlan)
      }.sum
    count(exec)
  }

  /** Reads of a shared materialized frame, whatever the mechanism:
    * InMemoryTableScan (persist) or RDD scan (localCheckpoint).
    */
  private def sharedReads(q: String): Int = {
    val exec = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan
    def count(p: org.apache.spark.sql.execution.SparkPlan): Int =
      p.collect {
        case _: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => 1
        case _: org.apache.spark.sql.execution.RDDScanExec => 1
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          count(a.inputPlan)
      }.sum
    count(exec)
  }

  test("q09 star join: dims broadcast, fact never sort-merge joined") {
    val p = plan("q09_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"),
      "a dim outgrew/lost its broadcast — the fact side would shuffle:\n" +
        p.take(800))
  }

  test("q16 top-k plans as TakeOrderedAndProject (no global sort)") {
    val p = plan("q16_top_orders")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("q37 brute-force KNN: probes broadcast, map-side partial top-k") {
    val p = plan("q37_knn_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin") && p.contains("BuildRight"),
      p.take(800))
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      "expected partial (map-side) + final WindowGroupLimit:\n" + p.take(800))
  }

  test("q65 IVF: corpus assignment is map-side; exactly one exchange") {
    val p = plan("q65_knn_ivf")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      "IVF must shuffle only the final per-probe top-k:\n" + p.take(1200))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("q53 promo revenue: part broadcasts into the lineitem scan") {
    val p = plan("q53_promo_revenue")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(800))
  }

  test("q71 approx median plans as partial+final ObjectHashAggregate, no window") {
    // The GK sketch is the median family's production path precisely
    // because it aggregates (mergeable, partial+final) instead of ranking
    // the whole table through q61's 3-value window partition.
    val p = plan("q71_median_approx")
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      "expected partial + final sketch aggregate:\n" + p.take(800))
    assert(!p.contains("Window"),
      "the sketch path must never rank through a window:\n" + p.take(800))
  }

  test("q72 curate reads documents at most twice (fused row-wise pass)") {
    val p = plan("q72_curate")
    val scans = "FileScan".r.findAllIn(p).size
    assert(scans <= 2,
      s"expected <=2 corpus scans (fused row-wise + shingle aggregate), " +
        s"got $scans:\n" + p.take(1600))
  }

  test("q76 encode: vocab broadcasts, the corpus never shuffles") {
    val p = plan("q76_encode")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"),
      "the V-row vocab must broadcast into the corpus scan:\n" + p.take(800))
  }

  test("q70/q76/q80 bounded windows keep a partition key (no partition-less WindowExec)") {
    // These three run a window over at most V rows (truncated vocab /
    // per-stratum rates). The single-partition bound is stated with a
    // 1-row-scan marker key because a LITERAL marker gets stripped by
    // EliminateWindowPartitions — if that key ever folds away again, the
    // bench tail re-fills with "No Partition Defined" warnings that bury
    // real regressions.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    def empties(p: SparkPlan): Int = p.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => 1
      case a: AdaptiveSparkPlanExec => empties(a.inputPlan)
    }.sum
    for (q <- Seq("q70_vocab", "q76_encode", "q80_temperature_sample")) {
      val exec = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan
      assert(empties(exec) == 0,
        s"$q plans a partition-less WindowExec:\n$exec")
    }
  }

  test("q77 quota cap: map-side partial WindowGroupLimit bounds the stratum reducers") {
    // lang is a 5-value key; without the partial group-limit every map
    // task would ship its whole stratum slice to 5 reducers. With it,
    // at most maxPerStratum rows per stratum leave each map task.
    val p = plan("q77_cap_per_stratum")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      "expected partial (map-side) + final WindowGroupLimit:\n" + p.take(800))
  }

  test("q83 incremental dedup: the batch index broadcasts into the corpus index") {
    // The 100 TB contract: the accumulated corpus index is only SCANNED —
    // the delta broadcasts, so losing the hint to a sort-merge join would
    // shuffle the whole index every day.
    val p = plan("q83_dedup_incremental")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"),
      "the corpus index must never shuffle for the probe join:\n" + p.take(800))
  }

  test("q84 sketch rollup: mergeable partial+final aggregates, no window") {
    val p = plan("q84_sketch_rollup")
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      "expected partial + final sketch aggregates:\n" + p.take(800))
    assert(!p.contains("Window"), p.take(800))
  }

  test("q86 boilerplate fraction: per-consumer recompute, nothing materialized") {
    // Round 8 inverted the round-7 contract: with the codegen'd
    // WordNgramHashes walk (and array_distinct replacing the corpus-wide
    // distinct exchange), RECOMPUTING the shingle set per consumer beats
    // materializing it — and at 100 TB a corpus-sized cached intermediate
    // is exactly what executor storage cannot hold. The pin is now: two
    // plain scans (one per consumer), ZERO cache/checkpoint reads, and
    // the hotlist reaches the flag join as a broadcast.
    assert(uncachedScans("q86_boilerplate_fraction") == 2,
      "expected one plain corpus scan per consumer:\n" +
        plan("q86_boilerplate_fraction").take(1200))
    assert(sharedReads("q86_boilerplate_fraction") == 0,
      "no consumer may read a materialized intermediate:\n" +
        plan("q86_boilerplate_fraction").take(1200))
    assert(plan("q86_boilerplate_fraction").contains("BroadcastHashJoin"),
      plan("q86_boilerplate_fraction").take(1200))
  }

  test("q102 repeated spans: per-consumer recompute, nothing materialized") {
    // same round-8 inversion as q86: the hash stream is cheap enough to
    // recompute per consumer (df aggregate + hit probe), and the round-7
    // persist leaked executor storage until session end (ADVICE r7)
    assert(uncachedScans("q102_repeated_spans") == 2,
      "expected one plain corpus scan per consumer:\n" +
        plan("q102_repeated_spans").take(1200))
    assert(sharedReads("q102_repeated_spans") == 0,
      "no consumer may read a materialized intermediate:\n" +
        plan("q102_repeated_spans").take(1200))
  }

  test("q104/q105 hotlist probes broadcast the state (no per-batch shuffle)") {
    // the persisted hotlist must reach the delta as a broadcast: a silent
    // sort-merge fallback would shuffle the delta's shingle stream on
    // every batch — the cost the incremental form exists to avoid
    val p4 = plan("q104_boilerplate_incremental")
    assert(p4.contains("BroadcastHashJoin"), p4.take(1000))
    val p5 = plan("q105_spans_incremental")
    assert(p5.contains("BroadcastHashJoin"), p5.take(1000))
  }

  test("q88 bucketed fact-fact join: zero exchange on either side") {
    // With broadcast disabled the join MUST be a bucket-aligned sort-merge
    // with no hashpartitioning Exchange anywhere — the shuffle was paid at
    // write time. (With broadcast allowed the small side may build a
    // BroadcastExchange instead; both regimes are exchange-free on the
    // fact scans, but this pins the stronger fact⋈fact contract.)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan("q88_bucketed_join")
      assert(p.contains("SortMergeJoin"), p.take(1200))
      assert(!p.contains("Exchange hashpartitioning"),
        "bucketed join/agg must read pre-shuffled buckets, not exchange:\n" +
          p.take(1500))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q185 bucketed variant probe: index side exchange-free") {
    // The whole point of the catalog layout: with broadcast disabled the
    // variant equi-join must be a sort-merge whose INDEX side reads the
    // v-bucketed table in place — no ShuffleExchange anywhere under that
    // side; the one join-input shuffle is the delta's variants. (A
    // SortExec on the index side is allowed: appends add files per
    // bucket, and Spark only trusts write-time ordering for
    // one-file-per-bucket tables.)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val exec = SparkEntry.queries("q185_fuzzy_bucketed_probe")(spark, sf)
        .queryExecution.executedPlan
      def unwrap(p: SparkPlan): SparkPlan = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.inputPlan
        case other => other
      }
      val joins = unwrap(exec).collect { case j: SortMergeJoinExec => j }
      assert(joins.nonEmpty, "expected the variant sort-merge join:\n" +
        unwrap(exec).toString.take(1500))
      val bucketSide = joins.flatMap(j => Seq(j.left, j.right)).filter(side =>
        side.collect {
          case f: FileSourceScanExec if f.relation.bucketSpec.isDefined => f
        }.nonEmpty)
      assert(bucketSide.nonEmpty,
        "the index side must scan the bucketed catalog table:\n" +
          unwrap(exec).toString.take(1500))
      bucketSide.foreach { side =>
        assert(side.collect { case e: ShuffleExchangeExec => e }.isEmpty,
          "index side must be exchange-free (bucket-aligned):\n" +
            side.toString.take(1500))
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q193 bucketed shingle probe: index side exchange-free") {
    // the q185 contract applied to the novelty family: with broadcast
    // disabled the probe's left-outer join must read the _h-bucketed
    // hash set in place — no ShuffleExchange under the index side; the
    // one join-input shuffle is the batch's own shingles.
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val exec = SparkEntry.queries("q193_novelty_bucketed")(spark, sf)
        .queryExecution.executedPlan
      def unwrap(p: SparkPlan): SparkPlan = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.inputPlan
        case other => other
      }
      val joins = unwrap(exec).collect { case j: SortMergeJoinExec => j }
      assert(joins.nonEmpty, "expected the probe sort-merge join:\n" +
        unwrap(exec).toString.take(1500))
      val bucketSide = joins.flatMap(j => Seq(j.left, j.right)).filter(side =>
        side.collect {
          case f: FileSourceScanExec if f.relation.bucketSpec.isDefined => f
        }.nonEmpty)
      assert(bucketSide.nonEmpty,
        "the index side must scan the bucketed catalog table:\n" +
          unwrap(exec).toString.take(1500))
      bucketSide.foreach { side =>
        assert(side.collect { case e: ShuffleExchangeExec => e }.isEmpty,
          "index side must be exchange-free (bucket-aligned):\n" +
            side.toString.take(1500))
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q211 bucketed containment: BOTH self-join sides exchange-free") {
    // the at-rest containment layout's whole point: the candidate
    // self-join reads the _h-bucketed pair table in place on both
    // inputs — the only shuffle left is the semantically required
    // (doc_a, doc_b) pair aggregate.
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val exec = SparkEntry.queries("q211_containment_bucketed")(spark, sf)
        .queryExecution.executedPlan
      def unwrap(p: SparkPlan): SparkPlan = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.inputPlan
        case other => other
      }
      // the candidate join: the SMJ whose both inputs scan the bucketed
      // table (the sizes join also exists; its aggregate side shuffles)
      val candJoins = unwrap(exec).collect {
        case j: SortMergeJoinExec if Seq(j.left, j.right).forall(side =>
          side.collect {
            case f: FileSourceScanExec if f.relation.bucketSpec.isDefined => f
          }.nonEmpty) => j
      }
      assert(candJoins.nonEmpty,
        "expected a sort-merge join over two bucketed scans:\n" +
          unwrap(exec).toString.take(1500))
      candJoins.foreach(j => Seq(j.left, j.right).foreach { side =>
        assert(side.collect { case e: ShuffleExchangeExec => e }.isEmpty,
          "both candidate-join sides must be exchange-free:\n" +
            side.toString.take(1500))
      })
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q186 drift rotation: ONE batch scan scores every reference version") {
    // the operator's headline claim: per-row explode over version structs
    // means the current batch is read once no matter how many references
    // are stored — a per-version loop would scan it |versions| times. The
    // reference side reads only the tiny stored histograms.
    val exec = SparkEntry.queries("q186_drift_rotation")(spark, sf)
      .queryExecution.executedPlan
    def scansOf(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
      p.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          Seq(f.relation.location.rootPaths.mkString(","))
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scansOf(a.inputPlan)
      }.flatten
    val docScans = scansOf(exec).count(_.contains("documents.parquet"))
    assert(docScans == 1,
      s"the batch must be scanned exactly once for all versions, got " +
        s"$docScans documents scans")
  }

  test("q110 bpe pairs: map-side pair emission, one aggregate exchange, no join") {
    // Pairs come off the token array inside the scan projection — a
    // per-position explode + self-join on pos+1 would shuffle the corpus
    // twice; the contract is ONE exchange (the pair-count aggregate).
    val p = plan("q110_bpe_pairs")
    assert(!p.contains("Join"), "pair emission must not join:\n" + p.take(800))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      "expected exactly one exchange (the pair-count aggregate):\n" +
        p.take(800))
  }

  test("q111 token mixture: rate table broadcasts, the corpus never shuffles") {
    // Same 100 TB contract as q95 — the token-mass aggregate is the only
    // shuffle; the corpus side of the rate join stays map-side.
    val p = plan("q111_token_mixture")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"),
      "the stratum-row rate table must broadcast into the corpus scan:\n" +
        p.take(800))
  }

  test("q112 bpe merge: pure projection — zero exchanges, zero joins") {
    // The merge walk and both token counts are one codegen'd projection
    // over the scan; any Exchange here means the merge stopped being
    // map-side.
    val p = plan("q112_bpe_merge")
    assert(!p.contains("Exchange"), "merge must be map-side:\n" + p.take(800))
    assert(!p.contains("Join"), p.take(800))
  }

  test("q121 bpe encode: pure projection — zero exchanges, zero joins") {
    // The whole merge TABLE applies inside one codegen'd projection over
    // the scan (heap-ordered per-doc merge events; the table is an
    // expression reference object, not a join side). Any Exchange or
    // Join here means the encode stopped being map-side — the property
    // that makes 32k-merge inference a single corpus pass.
    val p = plan("q121_bpe_encode")
    assert(!p.contains("Exchange"), "encode must be map-side:\n" + p.take(800))
    assert(!p.contains("Join"), p.take(800))
  }

  test("q95 mixture sample: rate table broadcasts, the corpus never shuffles") {
    // The 100 TB contract shared by the whole sampling family: the only
    // shuffle is the stratum-count aggregate; the corpus side of the rate
    // join is map-side. A silent sort-merge fallback would shuffle the
    // corpus to sample it.
    val p = plan("q95_mixture_sample")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"),
      "the stratum-row rate table must broadcast into the corpus scan:\n" +
        p.take(800))
  }

  test("q113 funnel join: hash-family join on user_id, never nested-loop") {
    // The equality conjunct is load-bearing: without it the interval
    // condition degenerates to BroadcastNestedLoopJoin — events × events.
    val p = plan("q113_funnel_join")
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      "interval join must key on user_id:\n" + p.take(800))
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      p.take(800))
  }

  test("q114 heavy hitters: partial WindowGroupLimit bounds the per-type sort") {
    // At 100 TB the exact twin survives because each map task keeps only
    // its own top-10 per event_type BEFORE the exchange; losing the
    // Partial node would ship every distinct (type, user) count into one
    // per-type sort.
    val p = plan("q114_heavy_hitters")
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      "expected a map-side partial WindowGroupLimit:\n" + p.take(800))
    // and the scan reads only the two columns the query needs
    assert(p.contains("ReadSchema: struct<user_id:bigint,event_type:string>"),
      p.take(1200))
  }

  test("q115 heavy-hitter sketch: object-hash aggregates, window only on state rows") {
    // The TypedImperativeAggregate folds must plan as partial+final
    // ObjectHashAggregate (live sketch objects in the buffer, serialized
    // only at the exchange); a SortAggregate fallback would sort events
    // to sketch them.
    val p = plan("q115_heavy_sketch")
    assert(p.contains("ObjectHashAggregate"), p.take(800))
    assert(!p.contains("SortAggregate"),
      "sketch folds must not fall back to SortAggregate:\n" + p.take(800))
  }

  test("q96 redact: one codegen'd projection — no exchange, no join") {
    val p = plan("q96_redact")
    assert(!p.contains("Exchange"),
      "the PII scrub must stay a row-wise map:\n" + p.take(800))
    // "*(n)" is the whole-stage-codegen stage marker in the plan string
    assert(p.contains("*(1) Project"),
      "chained regexp_replace must stay inside codegen:\n" + p.take(800))
  }

  test("q97 source overlap: all three consumers read the materialized token set") {
    // sizes + both pair-join sides must read the checkpointed distinct
    // (stratum, token) set — without it the corpus was scanned and
    // re-exploded four times (measured; the q86 lesson).
    assert(uncachedScans("q97_source_overlap") == 0,
      "a consumer re-scans the corpus outside the shared cache:\n" +
        plan("q97_source_overlap").take(1200))
    assert(sharedReads("q97_source_overlap") >= 3,
      "sizes and both pair-join sides must read the cached token set:\n" +
        plan("q97_source_overlap").take(1200))
  }

  test("q98 hist quantile: window ranks buckets above a partial+final aggregate") {
    // The cumulative window must consume pre-aggregated bucket counts —
    // bounded by value-range/width — never event rows.
    val p = plan("q98_hist_quantile")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expected partial + final bucket-count aggregates:\n" + p.take(1200))
    val win = p.indexOf("Window")
    val lastAgg = p.lastIndexOf("HashAggregate")
    assert(win >= 0 && win < lastAgg,
      "the window must sit above the bucket aggregate, not on raw events:\n" +
        p.take(1200))
  }

  test("q69 repetition: one map-side projection — no shuffle, no join") {
    // The r10 rewrite answers the distinct count from the per-row
    // WordNgramHashes array; a reappearing Exchange or Join means the
    // two-scan+join form crept back (the 2.7×-vs-baseline shape).
    val p = plan("q69_repetition")
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"repetition must stay scan-side:\n$p")
    assert(p.contains("word_ngram_hashes"),
      s"expected the codegen'd n-gram walk in the projection:\n$p")
  }

  test("q122/q123 near-dup: inverted-index equi-joins, never all-pairs") {
    // The whole point of the fingerprint index is that pairing is an
    // equi-join on the hash — a CartesianProduct or nested-loop join
    // means the key degenerated (the 306-bucket LSH lesson) or a join
    // condition got lost.
    Seq("q122_video_near_dup", "q123_audio_align_dup").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q must pair through the fingerprint equi-join:\n" + p.take(1200))
    }
  }

  test("runtime bloom filter reaches the fact side of a shuffled dim join") {
    // The 100 TB star-join regime the bench can't exercise: a dim too big
    // to broadcast but selectively filtered. Spark's runtime bloom-filter
    // injection (on by default) builds a bloom filter from the filtered
    // dim at run time and applies it to the FACT scan side, cutting
    // shuffle volume before the join. Size thresholds are floored here to
    // make the sf0.001 plan show what the 100 TB plan does; the pin is
    // that the engine's plain column-to-column equi-joins stay in the
    // shape the rule recognizes (a renamed/wrapped join key would
    // silently lose the filter).
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val li = graft.sources.Tables.load(spark, sf, "lineitem")
      val part = graft.sources.Tables.load(spark, sf, "part")
        .filter(org.apache.spark.sql.functions.col("p_type") === "PROMO")
      val p = li.join(part,
          org.apache.spark.sql.functions.col("l_partkey") ===
            org.apache.spark.sql.functions.col("p_partkey"))
        .queryExecution.executedPlan.toString
      assert(p.contains("might_contain") && p.contains("bloom_filter_agg"),
        "the selective dim must inject a runtime bloom filter into the " +
          "fact side:\n" + p.take(1500))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("q134/q141 resample: two exchanges, no join (gap emission)") {
    Seq("q134_resample_fill", "q141_resample_interp").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Join"),
        s"$q must emit gap rows, not join a spine:\n" + p.take(1200))
      val exchanges = p.split('\n').count(_.contains("Exchange"))
      assert(exchanges <= 2,
        s"$q: expected the (entity,day) agg + one window sort, got " +
          s"$exchanges exchanges:\n" + p.take(1200))
    }
  }

  test("q145 reach: the running-sum window ranks days, never events") {
    // the Window's child must be the compacted (type, day) aggregate —
    // a WindowExec directly over the event scan would be the naive
    // per-day-distinct shape this operator exists to avoid
    val exec = SparkEntry.queries("q145_cumulative_reach")(spark, sf)
      .queryExecution.executedPlan
    def unwrap(p: org.apache.spark.sql.execution.SparkPlan)
      : org.apache.spark.sql.execution.SparkPlan = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    val windows = unwrap(exec).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, "expected the running-sum window")
    windows.foreach { w =>
      val aggsBelow = w.collect {
        case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
        case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
        case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec => a
      }
      assert(aggsBelow.nonEmpty,
        s"window must sit above the day-compacting aggregate:\n$w")
    }
  }

  test("q147 waiting suppliers: two lineitem scans, no nested-loop join") {
    val p = plan("q147_waiting_suppliers")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "the EXISTS fold must stay hash-joined:\n" + p.take(1200))
    val liScans = p.split('\n')
      .count(l => l.contains("FileScan parquet") && l.contains("lineitem"))
    assert(liScans <= 2,
      s"expected at most two lineitem scans (classic Q21 pays three), " +
        s"got $liScans:\n" + p.take(1500))
  }

  test("q25 watermark filter: bound pushed to the parquet scan") {
    val p = plan("q25_watermark_filter")
    assert(p.contains("PushedFilters: [") &&
      p.replaceAll("(?s).*?PushedFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("GreaterThan"),
      "the raw-nanos watermark bound must reach the scan:\n" + p.take(1200))
  }

  test("q157 weighted sample: global top-k, never a global sort") {
    val p = plan("q157_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"),
      "E-S selection must be per-partition heaps + merge:\n" + p.take(800))
    assert(!p.contains("Exchange rangepartitioning"),
      "a range-partitioned sort crept in — the corpus would shuffle:\n" +
        p.take(800))
  }

  test("q158 winsorize: bounds broadcast back, corpus never shuffles") {
    val p = plan("q158_winsorize")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin") &&
      !p.contains("ShuffledHashJoin"),
      "the strata-bounds join must broadcast, not shuffle the corpus:\n" +
        p.take(800))
  }

  test("q153 LM training: map-side partial count before the bigram shuffle") {
    val p = plan("q153_lm_bigrams")
    assert(p.contains("partial_count") || p.contains("partial count") ||
      p.contains("Partial"),
      "bigram counting must partial-aggregate map-side:\n" + p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("q154/q156/q159: keyed joins only — no cartesian anywhere") {
    Seq("q154_lm_score", "q156_containment", "q159_ngram_novelty")
      .foreach { q =>
        val p = plan(q)
        assert(!p.contains("CartesianProduct"),
          s"$q grew a cartesian product:\n" + p.take(800))
      }
  }

  test("q163 drift buckets: edges are literals — map-side bucketing, no join before the count") {
    val p = plan("q163_drift_buckets")
    // bucket assignment must ride the scans as literal comparisons; the
    // only join is the full outer of two 10-row count frames
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(p.contains("partial_count") || p.contains("Partial"),
      "bucket counting must partial-aggregate map-side:\n" + p.take(1200))
  }

  test("q164 k-anonymity: the group floor broadcasts back as a semi-join") {
    val p = plan("q164_k_anonymity")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      "the combos-sized floor must broadcast, not shuffle the corpus:\n" +
        p.take(800))
  }

  test("q165 jw rescore: FastSS equi-join candidates, never a cartesian") {
    val p = plan("q165_jw_rescore")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "the JW scorer must run on FastSS candidates, not an n² matrix:\n" +
        p.take(1200))
    assert(p.contains("jaro_winkler") || p.contains("jaroWinkler") ||
      p.contains("JaroWinkler"),
      "the codegen'd scorer should appear in the plan:\n" + p.take(1200))
  }

  test("q167 pagerank top: rank decode is a broadcast join + global top-k") {
    val p = plan("q167_pagerank_top")
    assert(p.contains("TakeOrderedAndProject"),
      "the top-20 must be per-partition heaps + merge, not a global " +
        "sort:\n" + p.take(1200))
    assert(!p.contains("SortMergeJoin"),
      "the supplier-dim decode must broadcast:\n" + p.take(1200))
  }

  test("q168 small-qty revenue: <=2 fact scans; aggregate side unhinted (AQE's choice)") {
    val p = plan("q168_small_qty_revenue")
    // Round 13 dropped the forced broadcast of the per-part aggregate:
    // at bench scale AQE still picks broadcast (asserted — losing it
    // here would mean AQE stopped seeing the post-aggregate size), but
    // a shuffled fallback is LEGAL at 100 TB, so the pin is on the scan
    // count and the dim join, not on never-shuffling.
    assert(p.contains("BroadcastHashJoin"),
      "at sf0.001 AQE should broadcast the per-part stats frame:\n" +
        p.take(1200))
    val liScans = p.split('\n')
      .count(l => l.contains("FileScan parquet") && l.contains("lineitem"))
    assert(liScans <= 2,
      s"the correlated-avg decorrelation pays exactly two fact scans, " +
        s"got $liScans:\n" + p.take(1500))
  }

  test("q171 inactive high balance: pushed date filter, broadcast scalar, anti-join") {
    val p = plan("q171_inactive_high_balance")
    assert(p.contains("LeftAnti"),
      "the NOT EXISTS must plan as a left-anti join:\n" + p.take(1200))
    assert(!p.contains("CartesianProduct"),
      "no cartesian anywhere:\n" + p.take(1200))
    // every nested-loop node must be the 1-row scalar cross (the
    // broadcast threshold frame) — any other BNLJ is a lost equi-join
    val bnlj = p.split('\n').filter(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj.forall(_.contains("BuildRight, Cross")),
      s"only the 1-row scalar may nested-loop:\n${bnlj.mkString("\n")}")
    // the orders date window reaches the parquet scan
    val ordScan = p.split('\n').find(l =>
      l.contains("PushedFilters") && l.contains("o_orderdate"))
    assert(ordScan.nonEmpty,
      "the since-cutoff must push to the orders scan:\n" + p.take(2000))
  }

  test("q180 disjunctive revenue: each side's disjunction projection reaches its scan") {
    val p = plan("q180_disjunctive_revenue")
    // the qty-range UNION must pre-prune the fact scan...
    val factScan = p.split('\n').find(l =>
      l.contains("FileScan") && l.contains("lineitem"))
    assert(factScan.exists(l => l.contains("FLOOR(l_quantity") &&
      l.contains("DataFilters")),
      s"the quantity disjunction must reach the fact scan:\n$factScan")
    // ...and the brand set the dim scan — neither side waits for the join
    val dimScan = p.split('\n').find(l =>
      l.contains("FileScan") && l.contains("part.parquet"))
    assert(dimScan.exists(l => l.contains("DataFilters") &&
      l.substring(l.indexOf("DataFilters")).takeWhile(_ != ']')
        .contains("p_brand")),
      s"the brand disjunction must reach the dim scan AS A FILTER " +
        s"(p_brand in ReadSchema alone is not pushdown):\n$dimScan")
    assert(p.contains("BroadcastHashJoin"),
      "the part dim must broadcast:\n" + p.take(800))
  }

  test("q181 IVF decontamination: probed lists pruned, probe side not collected") {
    val p = plan("q181_decontaminate_ivf")
    // the index read must prune to the probed list directories
    val listScan = p.split('\n').find(l =>
      l.contains("FileScan") && l.contains("lists"))
    assert(listScan.exists(l => l.contains("PartitionFilters") &&
      l.substring(l.indexOf("PartitionFilters")).takeWhile(_ != ']')
        .contains("list_id")),
      s"the lists read must carry a list_id partition filter:\n$listScan")
    // the probe join keys on list_id — a hash-family join, never a
    // nested loop (the eval side is NOT broadcast-collected by us; AQE
    // may still choose broadcast at this SF, which is fine)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "the probe join must stay an equi-join on list_id:\n" + p.take(1200))
  }

  test("q200 index-backed drift: stats + centroids only — the index lists are NEVER scanned") {
    val p = plan("q200_index_drift")
    // the whole point of the stats-as-reference design: the monitor
    // reads the nCentroids-row stats table and the batch, not the corpus
    val listScan = p.split('\n').filter(l =>
      l.contains("FileScan") && l.contains("/lists"))
    assert(listScan.isEmpty,
      s"q200 must never scan the index's list partitions:\n${listScan.mkString("\n")}")
    assert(p.split('\n').exists(l =>
      l.contains("FileScan") && l.contains("list_stats")),
      "q200 must read the list_stats table:\n" + p.take(1200))
  }

  test("q174 top revenue supplier: fact scanned once (at the checkpoint), no global sort") {
    val p = plan("q174_top_revenue_supplier")
    // the revenue view is localCheckpoint'ed, so the FACT scan happens
    // exactly once at materialization and the query plan reads the
    // supplier-cardinality checkpoint for both consumers — zero fact
    // scans may appear in the final plan
    val liScans = p.split('\n')
      .count(l => l.contains("FileScan parquet") && l.contains("lineitem"))
    assert(liScans == 0,
      s"both consumers must read the materialized revenue view, got " +
        s"$liScans fact scans:\n" + p.take(1500))
    assert(sharedReads("q174_top_revenue_supplier") >= 2,
      "the MAX and the equality probe must both read the checkpoint:\n" +
        p.take(1200))
    assert(!p.contains("Window"),
      "max-equality must not plan a whole-frame window:\n" + p.take(1200))
    // The checkpoint materializes eagerly, so its scan is not in the
    // final plan — pin the pushdown on the same filter-before-aggregate
    // expression shape the operator builds (a cast change that breaks
    // pushability breaks it here identically).
    val li = graft.sources.Tables.load(spark, sf, "lineitem")
    val revShape = li
      .filter(org.apache.spark.sql.functions.col("l_shipdate") >=
        org.apache.spark.sql.functions.lit("1996-01-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)))
    val rp = revShape.queryExecution.executedPlan.toString
    assert(rp.split('\n').exists(l =>
      l.contains("PushedFilters") && l.contains("l_shipdate")),
      "the ship-date window must push to the parquet scan:\n" + rp.take(2000))
  }

  test("q190/q192 ks drift: every cumulative window is partitioned (no global sort)") {
    // The scalableCumSum(By) contract: the CDF windows run partitioned by
    // the physical range-partition id (+ group columns for the multi
    // form) — a WindowExec with an EMPTY partitionSpec would be the
    // one-partition global sort the primitive exists to avoid.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.window.WindowExec
    def windows(p: SparkPlan): Seq[WindowExec] =
      p.collect {
        case w: WindowExec => Seq(w)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          windows(a.inputPlan)
      }.flatten
    Seq("q190_ks_drift", "q192_ks_multi").foreach { q =>
      val exec = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan
      val ws = windows(exec)
      assert(ws.nonEmpty, s"$q: expected the cumulative-CDF window:\n" +
        exec.toString.take(1500))
      assert(ws.forall(_.partitionSpec.nonEmpty),
        s"$q: a cumulative window lost its partition spec (global sort):\n" +
          exec.toString.take(1500))
    }
  }
}
