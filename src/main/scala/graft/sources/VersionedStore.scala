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
    */
  def publish(spark: SparkSession, rootDir: String, version: Long)
             (write: String => Unit): String = {
    latestVersion(spark, rootDir).foreach(latest =>
      require(version > latest,
        s"VersionedStore.publish: version $version is not after the " +
          s"store's latest $latest — the store is append-only monotonic"))
    val tmp = new org.apache.hadoop.fs.Path(rootDir, s".tmp-v=$version")
    val dst = new org.apache.hadoop.fs.Path(rootDir, s"v=$version")
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(rootDir)))
      fs.listStatus(new org.apache.hadoop.fs.Path(rootDir))
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(".tmp-v="))
        .foreach(s => fs.delete(s.getPath, true))
    write(tmp.toString)
    require(fs.rename(tmp, dst),
      s"VersionedStore.publish: publishing $tmp -> $dst failed " +
        "(concurrent publish of the same version?)")
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
