package graft.sources

/** Process-lifetime scratch directories, deleted by ONE JVM shutdown
  * hook — for state that must outlive its creating call (lazily-read
  * sink parquet, a fixpoint's final reliable checkpoint) but must not
  * accumulate in /tmp across repeated bench/verify runs in one JVM.
  * Contract: consume anything reading from a scratch dir before JVM
  * exit (every driver run does — Verify writes results out, Bench
  * forces them).
  *
  * The hook catches Exception per root, not just IOException:
  * `Files.walk` iterators throw UncheckedIOException and deletes can
  * race the walk — a narrower catch would kill the hook thread on the
  * first bad root and leak every root after it.
  */
object ScratchDirs {

  private val roots =
    java.util.Collections.synchronizedList(
      new java.util.ArrayList[java.nio.file.Path]())

  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      roots.forEach { p =>
        try {
          import scala.jdk.CollectionConverters._
          val walk = java.nio.file.Files.walk(p)
          try walk.sorted(java.util.Comparator.reverseOrder())
            .iterator().asScala.foreach(f =>
              try java.nio.file.Files.deleteIfExists(f)
              catch { case _: Exception => () })
          finally walk.close()
        } catch { case _: Exception => () }
      }))
  }

  /** A fresh temp directory cleaned up at JVM exit. */
  def create(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    roots.add(p)
    p.toString
  }
}
