package graft
import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.Path
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Multi-JVM smoke (round-17 verdict item 2): SPARK_GRAFT_MASTER=
    // "local-cluster[2,16,4096]" runs the WHOLE oracle gate with real
    // separate executor JVMs (needs SPARK_HOME=/opt/spark for the worker
    // launcher), flushing JVM-local assumptions local[n] can't see —
    // executors then need the graft classes on their own classpath.
    val master = GraftSession.envMaster(s"local[$cpus]")
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    val spark =
      GraftSession.withExecutorClasses(builder, master).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val outFs = new Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    outFs.mkdirs(new Path(outDir))
    // Optional focus filter for local iteration (same contract as Bench):
    // SPARK_GRAFT_ONLY="q153,q154" dumps just those queries. Unset (the
    // driver's invocation) = all.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val queries = only match {
      case Some(names) => SparkEntry.queries.filter { case (k, _) =>
        names.exists(k.startsWith) }
      case None => SparkEntry.queries
    }
    queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    val out = outFs.create(new Path(s"$outDir/oracle_sql.json"), true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    spark.stop()
  }
}
