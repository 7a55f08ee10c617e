package graft.sources

import org.apache.spark.sql.SparkSession

/** Versioned, source-fingerprinted persisted-state dirs (hotlists, IVF
  * indexes, z-ordered copies): `ensure` rebuilds the state iff its marker
  * does not match the CURRENT (version, source) — an existence-only check
  * silently serves stale state when the source dataset is regenerated in
  * place, and a format change (e.g. the round-8 hotlist re-keying from
  * `xxhash64(shingle)` to [[graft.functions.WordNgramHashes]] identity)
  * would make every pre-existing dir wrong, not just stale.
  *
  * The marker records a `version` string (bump on any state-FORMAT
  * change), the full source path (so path-hashCode collisions between
  * different sources can never alias state), and a fingerprint of the
  * source's file listing (path, length, mtime of every file) — regenerated
  * data ⇒ different mtimes ⇒ rebuild. Listing is one metadata pass,
  * no data read.
  */
object StateCache {

  private[sources] def fingerprint(s: SparkSession, sourcePath: String): String = {
    val conf = s.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(sourcePath)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return "absent"
    val entries = scala.collection.mutable.ArrayBuffer[String]()
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next()
      entries += s"${f.getPath}|${f.getLen}|${f.getModificationTime}"
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    entries.sorted.foreach(e => md.update(e.getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  /** Returns the state dir for (sourcePath, kind), building it via `build`
    * unless a marker written by a previous ensure matches the current
    * version + source fingerprint. On mismatch the whole dir is removed
    * first, so `build` always writes into a clean path.
    */
  def ensure(s: SparkSession, sourcePath: String, kind: String,
             version: String)(build: String => Unit): String = {
    val tag = java.lang.Integer.toHexString(sourcePath.hashCode)
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_${kind}_$tag"
    val conf = s.sparkContext.hadoopConfiguration
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(conf)
    val marker = new org.apache.hadoop.fs.Path(dir, "_GRAFT_STATE")
    val want = s"$version\n$sourcePath\n${fingerprint(s, sourcePath)}"
    val have =
      if (!fs.exists(marker)) None
      else {
        val in = fs.open(marker)
        try Some(new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8"))
        finally in.close()
      }
    if (!have.contains(want)) {
      fs.delete(dirPath, true)
      build(dir)
      val out = fs.create(marker, true)
      try out.write(want.getBytes("UTF-8")) finally out.close()
    }
    dir
  }

  /** [[ensure]]'s CATALOG-TABLE twin, for state that lives as a bucketed
    * warehouse table instead of a directory (the fuzzy-variant, shingle,
    * and shingle-pair tables): the marker rides the table as a
    * `graft.state.marker` property, and a mismatch (regenerated source,
    * bumped version, hashCode-aliased path) DROPS and rebuilds — an
    * existence-only `tableExists` check silently serves the OLD corpus's
    * state when the source is regenerated in place. `build` is handed
    * the table name; the marker is stamped after it returns.
    */
  def ensureTable(s: SparkSession, sourcePath: String, kind: String,
                  version: String)(build: String => Unit): String = {
    val tag = java.lang.Integer.toHexString(sourcePath.hashCode)
    val table = s"graft_${kind}_$tag"
    val want = s"$version|$sourcePath|${fingerprint(s, sourcePath)}"
    val have =
      if (!s.catalog.tableExists(table)) None
      else s.sql(s"SHOW TBLPROPERTIES $table").collect()
        .find(_.getString(0) == "graft.state.marker").map(_.getString(1))
    if (!have.contains(want)) {
      if (s.catalog.tableExists(table)) s.sql(s"DROP TABLE $table")
      build(table)
      s.sql(s"ALTER TABLE $table SET TBLPROPERTIES " +
        s"('graft.state.marker' = '${want.replace("'", "''")}')")
    }
    table
  }
}
