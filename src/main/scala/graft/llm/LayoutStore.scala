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

  /** Hidden/temp dirs (`_spark_metadata`, dot-temps) are not sub-tables. */
  private[llm] def visibleStatus(st: org.apache.hadoop.fs.FileStatus): Boolean = {
    val n = st.getPath.getName
    !n.startsWith("_") && !n.startsWith(".")
  }

  /** Run `body` with partition-column type inference pinned OFF,
    * restoring the previous setting after. Every snapshot rewrite path
    * ([[compactSnapshot]], [[Takedown.propagateLayoutSnapshot]],
    * [[Ingest.appendRowsSnapshot]]) must round-trip `col=value`
    * directory chains BYTE-FOR-BYTE: default partition discovery
    * re-infers `strata=01` as int 1 (or a date-like value as DATE),
    * silently renaming directories and changing the read-back schema
    * of the re-landed snapshot. */
  private[llm] def withPartitionInferenceOff[T](
      spark: org.apache.spark.sql.SparkSession)(body: => T): T = {
    val inferKey = "spark.sql.sources.partitionColumnTypeInference.enabled"
    val inferPrev = spark.conf.getOption(inferKey)
    spark.conf.set(inferKey, "false")
    try body finally inferPrev match {
      case Some(v) => spark.conf.set(inferKey, v)
      case None => spark.conf.unset(inferKey)
    }
  }

  /** Walk `col=value` directory chains to recover a table's partition
    * spec (shared by [[compactSnapshot]] and Takedown's generic
    * propagation walk). */
  private[llm] def partitionCols(fs: org.apache.hadoop.fs.FileSystem,
                                 dir: org.apache.hadoop.fs.Path): Seq[String] = {
    val kids = fs.listStatus(dir)
      .filter(st => st.isDirectory && visibleStatus(st) &&
        st.getPath.getName.contains("="))
    if (kids.isEmpty) Seq.empty
    else {
      val k = kids.head.getPath
      k.getName.split("=", 2)(0) +: partitionCols(fs, k)
    }
  }

  /** A partition value / directory suffix that round-trips through the
    * writer's path escaping unchanged — copy-through decisions compare
    * `col=value` directory names against DataFrame values by PLAIN
    * string equality, which is only sound when no character is subject
    * to escaping (and the value is non-null: a null lands under the
    * default-partition sentinel). Every non-plain value sends the
    * caller down the full-rewrite path instead — correctness never
    * depends on the fast path firing. */
  private[llm] def plainPartitionValue(s: String): Boolean =
    s != null && s.nonEmpty && s.forall(c =>
      c.isLetterOrDigit && c < 128 || c == '_' || c == '-' || c == '.')

  /** File-level copy-through of a snapshot table's UNTOUCHED partition
    * directories: every visible `col=value` child of `srcTable` whose
    * name is not in `skipDirNames` is copied byte-for-byte under
    * `destTable`. This is how an incremental snapshot rewrite pays
    * ∝ touched partitions instead of ∝ table — the rewritten rows land
    * via Spark, the untouched directories move at file granularity
    * (locally a stream copy; on an object store the same walk issues
    * server-side copies, and a manifest-based table format would make
    * it free). Returns (filesCopied, bytesCopied). */
  private[llm] def copyThroughDirs(conf: org.apache.hadoop.conf.Configuration,
                                   srcTable: org.apache.hadoop.fs.Path,
                                   destTable: String,
                                   skipDirNames: Set[String]): (Long, Long) = {
    val fs = srcTable.getFileSystem(conf)
    val dest = new org.apache.hadoop.fs.Path(destTable)
    if (!fs.exists(dest)) fs.mkdirs(dest)
    val dirs = fs.listStatus(srcTable)
      .filter(st => st.isDirectory && visibleStatus(st) &&
        st.getPath.getName.contains("=") &&
        !skipDirNames.contains(st.getPath.getName))
    // driver-side but PARALLEL: a 1000-partition layout copied
    // sequentially serializes on per-object latency (the dominant cost
    // on an object store, where each copy is a server-side request);
    // a bounded pool keeps the walk at max(latency) instead of
    // sum(latency) without flooding the store
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(16, dirs.length)))
    try {
      val futures = dirs.map { st =>
        pool.submit(new java.util.concurrent.Callable[(Long, Long)] {
          def call(): (Long, Long) = {
            val d = new org.apache.hadoop.fs.Path(dest, st.getPath.getName)
            if (!org.apache.hadoop.fs.FileUtil.copy(fs, st.getPath, fs, d,
                false, conf))
              throw new java.io.IOException(
                s"copy-through failed: ${st.getPath} -> $d")
            var files = 0L; var bytes = 0L
            val it = fs.listFiles(st.getPath, true)
            while (it.hasNext) {
              val f = it.next(); files += 1L; bytes += f.getLen
            }
            (files, bytes)
          }
        })
      }
      futures.map(_.get()).foldLeft((0L, 0L)) { case ((f, b), (df, db)) =>
        (f + df, b + db)
      }
    } finally pool.shutdown()
  }

  /** Compact the newest snapshot into a NEW snapshot — the small-file
    * maintenance job every long-lived 100 TB layout needs: incremental
    * rebuilds and wide write parallelism accrete many small files per
    * partition directory, and at cloud-store latencies the per-file
    * open cost comes to dominate probe reads (the classic small-file
    * problem). This rewrites every sub-table of the pinned snapshot
    * with one task per partition value (`maxRecordsPerFile` caps
    * oversized partitions), preserving the exact row multiset, schema
    * and partition directory structure — and lands it as the next
    * `version=N` via the same dot-temp + atomic rename, so probes
    * either read the old fragmented snapshot or the new compacted one,
    * never a half-rewritten directory. The retired original stays until
    * [[prune]].
    *
    * Generic over layout shape (the m26 contract): sub-tables are the
    * snapshot's child directories; partition columns are discovered
    * from their `col=value` directory chains, so BM25 postings+stats,
    * IVF cells, SRP buckets and shard layouts all compact through this
    * one path with no per-layout code. Returns the new version. */
  def compactSnapshot(spark: org.apache.spark.sql.SparkSession,
                      path: String,
                      maxRecordsPerFile: Long = 4L * 1024 * 1024): Long = {
    require(maxRecordsPerFile >= 1,
      s"maxRecordsPerFile must be >= 1: $maxRecordsPerFile")
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(snapshotPath(conf, path))
    val fs = src.getFileSystem(conf)
    def visible(st: org.apache.hadoop.fs.FileStatus): Boolean =
      visibleStatus(st)
    def partCols(dir: org.apache.hadoop.fs.Path): Seq[String] =
      partitionCols(fs, dir)
    withPartitionInferenceOff(spark) {
      writeSnapshot(conf, path) { tmp =>
        fs.listStatus(src).filter(st => st.isDirectory && visible(st))
          .foreach { sub =>
            val name = sub.getPath.getName
            val df = spark.read.parquet(sub.getPath.toString)
            val parts = partCols(sub.getPath)
            val w = (if (parts.isEmpty) df.coalesce(1)
                     else df.repartition(parts.map(
                       org.apache.spark.sql.functions.col): _*))
              .write.mode("overwrite")
              .option("maxRecordsPerFile", maxRecordsPerFile)
            (if (parts.isEmpty) w else w.partitionBy(parts: _*))
              .parquet(s"$tmp/$name")
          }
      }
    }
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
