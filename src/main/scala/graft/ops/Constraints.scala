package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality constraint checking (the pipeline-ops complement of the
  * text-quality scorers): declarative rules evaluated as ONE aggregate
  * pass over the table, plus referential-integrity checks as anti-join
  * counts. Output is a constraint report — `(constraint, n_violations,
  * n_rows, pass)` — not a filtered table: at 100 TB you gate a load on
  * the report and quarantine by re-running the one failed predicate,
  * rather than materializing a violations copy of the input.
  *
  * Scale: every predicate rule and every uniqueness rule folds into the
  * SAME single aggregation (count-if partials + count-distinct expand),
  * so adding a rule never adds a scan; [[referencedIn]] is a broadcast
  * anti-join when the dimension is dim-sized. All counts are exact longs
  * — the report is oracle-checkable cross-engine.
  */
object Constraints {

  /** Evaluate predicate rules (`name → violation condition`) and
    * uniqueness rules (`name → key columns`) in one pass. A NULL
    * predicate result counts as no violation (SQL filter semantics);
    * uniqueness counts duplicate ROWS (n − distinct keys), NULL keys
    * included via the count over the full row set.
    */
  def check(df: DataFrame, predicateRules: Seq[(String, Column)],
            uniqueRules: Seq[(String, Seq[String])] = Nil): DataFrame = {
    require(predicateRules.nonEmpty || uniqueRules.nonEmpty,
      "at least one rule required")
    val predAggs = predicateRules.map { case (name, cond) =>
      count(when(cond, 1)).as(s"_v_$name")
    }
    val uniqAggs = uniqueRules.map { case (name, keys) =>
      (count(lit(1)) -
        count_distinct(struct(keys.map(col): _*))).as(s"_v_$name")
    }
    val n = count(lit(1)).as("_n")
    val aggs = (predAggs ++ uniqAggs) :+ n
    val one = df.agg(aggs.head, aggs.tail: _*)
    val names = predicateRules.map(_._1) ++ uniqueRules.map(_._1)
    val rows = names.map(name =>
      struct(lit(name).as("rule"),
        col(s"_v_$name").as("n_violations")))
    one.select(explode(array(rows: _*)).as("r"), col("_n"))
      .select(col("r.rule").as("rule"),
        col("r.n_violations").as("n_violations"),
        col("_n").as("n_rows"),
        (col("r.n_violations") === 0L).as("pass"))
  }

  /** Zero-extra-pass gate: the same predicate rules as [[check]], riding
    * the SINK's own action as `CollectMetrics` (`Dataset.observe`)
    * instead of a separate aggregate scan. At 100 TB this changes the
    * gate's cost class: [[check]] pays one full pass before the load;
    * here the metrics are folded into the write job the pipeline runs
    * anyway, and the gate decision happens AFTER the action from the
    * collected metrics ([[observedReport]]) — the right posture for
    * write-then-audit sinks (a staged/medallion table that quarantines
    * or promotes the batch post-hoc, e.g. [[graft.ops.Upsert]]'s staged
    * sinks). Enforcement-before-visibility still wants [[check]].
    *
    * Only predicate rules: `observe` disallows distinct aggregates, so
    * uniqueness stays with [[check]]'s count-distinct pass (an
    * `approx_count_distinct` monitoring variant would be estimate-only
    * — out of scope for a gate that reports exact counts).
    */
  def observed(df: DataFrame, name: String,
               predicateRules: Seq[(String, Column)])
    : (DataFrame, org.apache.spark.sql.Observation) = {
    require(predicateRules.nonEmpty, "at least one rule required")
    val obs = org.apache.spark.sql.Observation(name)
    val aggs = predicateRules.map { case (n, cond) =>
      count(when(cond, 1)).as(s"_v_$n")
    } :+ count(lit(1)).as("_n")
    (df.observe(obs, aggs.head, aggs.tail: _*), obs)
  }

  /** The [[check]]-schema report from an [[observed]] run's collected
    * metrics (blocks until the instrumented action finishes). Driver-side
    * construction over rules-count rows — the data never moves twice.
    */
  def observedReport(spark: org.apache.spark.sql.SparkSession,
                     obs: org.apache.spark.sql.Observation,
                     ruleNames: Seq[String]): DataFrame = {
    import spark.implicits._
    val m = obs.get
    val n = m("_n").asInstanceOf[Long]
    ruleNames.map { r =>
      val v = m(s"_v_$r").asInstanceOf[Long]
      (r, v, n, v == 0L)
    }.toDF("rule", "n_violations", "n_rows", "pass")
  }

  /** Referential integrity: rows of `fact` whose `key` has no match in
    * `dim.dimKey` (NULL keys are orphans too — a fact row that cannot
    * join its dimension is broken regardless of why). Same report schema
    * as [[check]], so reports union.
    */
  def referencedIn(fact: DataFrame, key: String, dim: DataFrame,
                   dimKey: String, name: String): DataFrame = {
    val orphans = fact.select(col(key))
      .join(broadcast(dim.select(col(dimKey).as(key)).distinct()),
        Seq(key), "left_anti")
    val totals = fact.agg(count(lit(1)).as("_n"))
    orphans.agg(count(lit(1)).as("n_violations"))
      .crossJoin(totals)
      .select(lit(name).as("rule"), col("n_violations"),
        col("_n").as("n_rows"), (col("n_violations") === 0L).as("pass"))
  }
}
