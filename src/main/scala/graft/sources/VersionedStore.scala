package graft.sources

import org.apache.spark.sql.SparkSession

/** Versioned immutable-publish state store: members live under
  * `root/v=<version>/`, each written COMPLETELY under a dot-prefixed
  * staging dir and published by ONE directory rename (the sketch-state
  * commit discipline shared by the drift-reference rotation and the
  * cluster-label store). A reader listing the store mid-publish either
  * sees the complete new version or none of it — never a half-written
  * member, which an in-place write order would expose.
  *
  * The store is single-writer and append-only monotonic: re-publishing
  * an existing version or publishing "backwards" is a deployment error
  * that would silently re-baseline history, so both are refused. Under
  * that contract any `.tmp-v=*` dir present when a publish starts is a
  * dead crashed attempt and is swept — left alone it would accumulate
  * forever in a long-lived store.
  */
object VersionedStore {

  private val VersionRe = "^v=(\\d+)$".r

  /** Version numbers present under `rootDir`, ascending. */
  def versions(spark: SparkSession, rootDir: String): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(rootDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .flatMap(s => s.getPath.getName match {
        case VersionRe(v) => Some(v.toLong)
        case _            => None
      })
      .sorted
  }

  /** Latest version in the store, if any. */
  def latestVersion(spark: SparkSession, rootDir: String): Option[Long] =
    versions(spark, rootDir).lastOption

  /** Stage a new member via `write` (handed the staging path), then
    * publish it as `v=<version>` with one rename. Returns the published
    * path.
    *
    * Concurrent-writer posture (round 15, hardened round 16): the
    * store's CONTRACT stays single-writer, but a same-version race (two
    * schedulers firing one rotation) now loses LOUDLY instead of
    * undefined-ly —
    *  - each attempt stages into its OWN dir (`.tmp-v=<version>.<id>`,
    *    id random per call), so two same-version writers can never
    *    interleave writes into shared staging — the race is decided
    *    entirely by the rename, and the loser's directory is complete
    *    but unpublished, never a merged corruption (the r15 advice: the
    *    old shared `.tmp-v=N` let both racers pass the "crashed retry"
    *    delete and co-write one dir);
    *  - the publish rename goes through `FileContext.rename` with
    *    `Rename.NONE`, whose fail-if-destination-exists semantics are
    *    defined on every Hadoop FS (the old `FileSystem.rename` moves a
    *    directory INTO an existing destination on some FSs, which would
    *    silently nest the staging dir inside the live version); the
    *    loser deletes its staging before surfacing the conflict;
    *  - crashed-staging sweep deletes ONLY `.tmp-v=W[.id]` with
    *    `W <= latest` — those are provably dead (version W is already
    *    published, or can never publish under the monotonic rule). A
    *    concurrent writer's live staging for a FUTURE version is never
    *    swept out from under it (the old blanket sweep was a data race).
    * Cross-version interleaving (A publishes v5 while B publishes v6)
    * remains allowed: readers take the latest version, and each rename
    * is individually atomic.
    */
  def publish(spark: SparkSession, rootDir: String, version: Long)
             (write: String => Unit): String = {
    val latest = latestVersion(spark, rootDir)
    latest.foreach(l =>
      require(version > l,
        s"VersionedStore.publish: version $version is not after the " +
          s"store's latest $l — the store is append-only monotonic"))
    // per-attempt staging: same-version racers never share a dir, so a
    // lost race is a clean unpublished directory, never merged writes
    val attempt = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new org.apache.hadoop.fs.Path(rootDir,
      s".tmp-v=$version.$attempt")
    val dst = new org.apache.hadoop.fs.Path(rootDir, s"v=$version")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = dst.getFileSystem(conf)
    if (fs.exists(new org.apache.hadoop.fs.Path(rootDir)))
      fs.listStatus(new org.apache.hadoop.fs.Path(rootDir))
        .filter { s =>
          s.isDirectory && (s.getPath.getName match {
            case n if n.startsWith(".tmp-v=") =>
              // version part = up to the attempt-id separator (the bare
              // `.tmp-v=W` form from older stores sweeps the same way)
              val w = n.stripPrefix(".tmp-v=").takeWhile(_ != '.')
              // bounds guard: an empty or over-long version must not
              // crash every future publish with NumberFormatException —
              // an unparseable leftover is simply not ours to sweep
              w.nonEmpty && w.length <= 18 && w.forall(_.isDigit) &&
                latest.exists(w.toLong <= _)
            case _ => false
          })
        }
        .foreach(s => fs.delete(s.getPath, true))
    write(tmp.toString)
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      dst.toUri, conf)
    try fc.rename(tmp, dst)
    catch {
      case e: org.apache.hadoop.fs.FileAlreadyExistsException =>
        // drop our complete-but-lost staging now rather than leaving it
        // for the next publish's sweep
        try fs.delete(tmp, true) catch { case _: Throwable => () }
        throw new IllegalStateException(
          s"VersionedStore.publish: v=$version already exists — a " +
            "concurrent publish won this version; re-read latestVersion " +
            "and retry with the next one", e)
    }
    dst.toString
  }

  /** Delete every version <= `upTo` — the compaction bound for
    * log-structured stores. The caller must have published a superseding
    * member AFTER `upTo` first (readers take the latest version per key,
    * so retirement then changes no read); each per-version delete is
    * independently safe against a crash mid-sweep.
    */
  def retire(spark: SparkSession, rootDir: String, upTo: Long): Unit = {
    val root = new org.apache.hadoop.fs.Path(rootDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    versions(spark, rootDir).filter(_ <= upTo).foreach(v =>
      fs.delete(new org.apache.hadoop.fs.Path(root, s"v=$v"), true))
  }
}
