package graft

import org.apache.spark.sql.SparkSession

import graft.functions.GraftFunctions

/** Session factory: the engine's recommended configuration in one place —
  * what a user switching from the reference stack starts from.
  *
  *   val spark = GraftSession.build()            // local[all cores]
  *   val spark = GraftSession.build("local[32]", shufflePartitions = 32)
  *
  * Sets UTC (oracle/DuckDB parity and the reference's Z-normalized
  * timestamps), AQE with skew-join handling, shuffle partitions sized to
  * the actual parallelism (never the 200 default), and registers the
  * engine's custom SQL functions.
  */
object GraftSession {

  def build(master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
            shufflePartitions: Int = Runtime.getRuntime.availableProcessors(),
            appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      // Spark's default parquet timestamp encoding is INT96, which has NO
      // usable min/max statistics — every timestamp-bounded scan over a
      // table WE wrote (medallion fact horizon slices, z-ordered layouts)
      // would silently lose row-group pruning on the time dimension
      // (measured: the ZOrderSpec 2-D slice read 3× the row groups under
      // INT96). INT64 micros carries full stats and is the modern
      // cross-engine interchange type.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // Session-wide, set ONCE here (never inside a read path): an events
      // table whose ts is TIMESTAMP(NANOS) is only readable as a raw long
      // under this flag. Tables.load detects the on-disk encoding from the
      // footer and only takes the raw-long path when it actually sees
      // NANOS; the flag is harmless for MICROS/MILLIS/INT96 generations.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // getOrCreate may return a pre-existing session whose builder configs
    // were ignored — enforce the runtime-settable ones on it directly.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    GraftFunctions.registerAll(spark)
    spark
  }

  /** The Verify/Bench mains' master resolution: `SPARK_GRAFT_MASTER`
    * overrides (e.g. `local-cluster[2,16,4096]` for the multi-JVM gate),
    * else the caller's local default.
    */
  def envMaster(default: String): String =
    sys.env.getOrElse("SPARK_GRAFT_MASTER", default)

  /** For `local-cluster` masters the executor JVMs are separate processes
    * that do NOT inherit sbt's classpath — point them at the engine's own
    * compiled classes. Resolved from this class's code source so the mains
    * work from any cwd; the sbt-layout path is only the fallback when no
    * code source is available (e.g. a REPL-defined loader).
    */
  def withExecutorClasses(builder: SparkSession.Builder,
      master: String): SparkSession.Builder =
    if (master.startsWith("local-cluster")) {
      // Try, not just null-check: a non-hierarchical code-source URI
      // (jar-in-jar launchers) makes File(uri) throw — fall back to the
      // sbt layout path rather than crashing before session startup.
      val classes = scala.util.Try(
        new java.io.File(getClass.getProtectionDomain.getCodeSource
          .getLocation.toURI).getAbsolutePath)
        .getOrElse(new java.io.File("target/scala-2.13/classes").getAbsolutePath)
      builder.config("spark.executor.extraClassPath", classes)
    } else builder
}
