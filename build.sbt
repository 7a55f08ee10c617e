ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "wistiaetlpipelinespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The driver JSON-parses the LAST stdout line of `sbt "runMain
// graft.Bench"`. By default sbt relogs forked-process output through
// its logger (an `[info] ` prefix on every line) and appends its own
// `[success] Total time: ...` line — both of which kept BENCH_r*.json
// at `parsed: null` through round 15. Let the forked JVM inherit
// stdout verbatim and drop the success banner so the bench summary
// JSON is the clean final line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
ThisBuild / showSuccess := false
Global / excludeLintKeys ++= Set(run / outputStrategy, showSuccess)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 16g: local[32] at sf0.1 fits comfortably in 8g when idle, but under
  // co-tenant contention the extra headroom keeps heavy shuffle-agg queries
  // (minhash/simhash/TPC-H joins) out of full-GC storms.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
