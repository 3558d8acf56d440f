package graft.llm

/** Versioned store for PERSISTED LAYOUTS (the BM25 postings index, an
  * SRP/IVF bucket layout…): an index is a snapshot of the corpus it was
  * built from, so refreshing one in place either serves a torn read
  * (probe sees new postings with old stats) or silently mixes corpora.
  * This mirrors the bench-key snapshot store's contract
  * ([[Dedup.writeBenchKeysSnapshot]] — itself RunState's checkpoint
  * contract at dataset granularity) for layouts that are DIRECTORIES of
  * tables rather than one partitioned table: each rebuild lands as an
  * immutable `version=N` directory via dot-temp + atomic rename (a
  * crashed builder never leaves a readable half-layout), readers pin
  * the newest version (an old index retires by construction), and
  * prune keeps the newest `retain` snapshots.
  *
  * Version pinning here is PATH-level (the reader opens
  * `path/version=N/...`), not a partition filter — a layout owns
  * several sub-tables (postings + stats) that must come from the same
  * build, and one path prefix guarantees that. */
object LayoutStore {

  /** List snapshot versions at `path`, oldest→newest. FS-only (no Spark
    * session) so CLI tooling can call it like RunState. */
  def versions(conf: org.apache.hadoop.conf.Configuration,
               path: String): Seq[Long] = {
    val base = new org.apache.hadoop.fs.Path(path)
    val fs = base.getFileSystem(conf)
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("version="))
      .map(_.getPath.getName.stripPrefix("version=").toLong).sorted
  }

  /** Build the next snapshot: `build` writes the layout into a dot-temp
    * directory this allocates, which then renames atomically to
    * `version=N`. Returns N. A failed build leaves only the dot-temp
    * (invisible to [[versions]]); a failed rename throws. */
  def writeSnapshot(conf: org.apache.hadoop.conf.Configuration,
                    path: String)(build: String => Unit): Long = {
    val base = new org.apache.hadoop.fs.Path(path)
    val fs = base.getFileSystem(conf)
    val next = versions(conf, path).lastOption.getOrElse(0L) + 1L
    val tmp = new org.apache.hadoop.fs.Path(base, s".tmp-version-$next")
    build(tmp.toString)
    val dest = new org.apache.hadoop.fs.Path(base, s"version=$next")
    if (!fs.rename(tmp, dest))
      throw new java.io.IOException(
        s"layout snapshot rename failed: $tmp -> $dest (concurrent builder?)")
    next
  }

  /** Resolve the path of one pinned snapshot (default: the newest — the
    * only live one; anything older is retired). */
  def snapshotPath(conf: org.apache.hadoop.conf.Configuration,
                   path: String, version: Option[Long] = None): String = {
    val vs = versions(conf, path)
    require(vs.nonEmpty, s"no layout snapshots at $path — build one with " +
      "writeSnapshot before probing the store")
    val pin = version.getOrElse(vs.last)
    require(vs.contains(pin),
      s"layout version $pin not present at $path (have: ${vs.mkString(",")})")
    s"$path/version=$pin"
  }

  /** Delete all but the newest `retain` snapshots; returns the versions
    * removed (oldest→newest). FS-only, mirroring RunState's prune. */
  def prune(conf: org.apache.hadoop.conf.Configuration,
            path: String, retain: Int): Seq[Long] = {
    require(retain >= 1, s"retain must be >= 1: $retain")
    val base = new org.apache.hadoop.fs.Path(path)
    val fs = base.getFileSystem(conf)
    val doomed = versions(conf, path).dropRight(retain)
    doomed.foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(base, s"version=$v"), true)
    }
    doomed
  }
}
