package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger

/** Diagnostic main: run ONE registered query at sf0.1 (after an sf0.001
  * warm pass) and report wall time, Spark job count, and ms/job —
  * `sbt "runMain graft.JobProfile q209_semantic_cluster_forget"`.
  * Separates scheduling-floor cost from data cost: an iterative query
  * under AQE launches one job per materialized shuffle stage, so a
  * 4 s bench entry at ~44 ms/job over 180 jobs is the local-mode
  * scheduling constant (irrelevant at cluster data sizes), not a plan
  * problem. Used for the round-16 slowest-family audit (BASELINE.md).
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        "usage: runMain graft.JobProfile <query_name> [sfDir]  " +
          "(a key of SparkEntry.queries, e.g. q209_semantic_cluster_forget; " +
          "sfDir defaults to /root/testdata/sf0.1 — pass a fixtures dir " +
          "for the ratio-vs-SF investigations)")
      sys.exit(2)
    }
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    if (!SparkEntry.queries.contains(name)) {
      System.err.println(s"unknown query '$name' — keys: " +
        SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
      sys.exit(2)
    }
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    })
    val q = SparkEntry.queries(name)
    // warm
    q(spark, "/root/testdata/sf0.001").queryExecution.toRdd.count()
    spark.catalog.clearCache()
    jobs.set(0)
    val t0 = System.nanoTime()
    q(spark, sfDir).queryExecution.toRdd.count()
    val dt = (System.nanoTime() - t0) / 1e9
    // a fully-cached query can trigger zero jobs — report the wall time
    // without a nonsense Infinity ms/job
    val perJob = if (jobs.get() == 0) "n/a (0 jobs)"
      else f"${dt / jobs.get() * 1000}%.0f ms/job"
    println(f"$name: $dt%.2f s, ${jobs.get()} jobs, $perJob")
    spark.stop()
  }
}
