package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump a SUBSET of `SparkEntry.queries` to parquet for a
  * targeted DuckDB compare while iterating on a new query — the full
  * `tools/verify_local.py` cycle costs minutes; this costs seconds.
  *
  *   sbt "Test/runMain graft.QCheck q134_resample_fill"
  *   # results land in /tmp/qcheck/<name>/, sf0.01 inputs
  */
object QCheck {
  def main(args: Array[String]): Unit = {
    val names = args.toSeq
    require(names.nonEmpty, "usage: QCheck <queryName>...")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
        .coalesce(1).write.mode("overwrite").parquet(s"/tmp/qcheck/$n")
      println(s"[qcheck] wrote $n")
    }
    spark.stop()
  }
}
