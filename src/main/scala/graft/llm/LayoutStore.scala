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

  /** Manifest file inside a `version=N` dir: a flat JSON object mapping
    * each logical entry of the snapshot (a `col=value` partition dir of
    * the root table, a `sub/col=value` partition dir of a sub-table, a
    * whole un-partitioned sub-table dir, or `"."` for a whole
    * root-as-table layout) to the version that physically OWNS the
    * bytes. A snapshot without a manifest owns everything it physically
    * contains (the legacy/full-build shape — [[physicalEntries]]
    * synthesizes the same map from a directory walk, so readers treat
    * both uniformly). Owners are always resolved to the PHYSICAL owner
    * at write time (a v5 entry inherited from v4 which inherited it
    * from v3 says `3`), so read resolution is one hop and prune's
    * reference set is exact. Underscore-prefixed, so Spark's file index
    * and [[visibleStatus]] both ignore it. */
  private[llm] val ManifestFile = "_manifest.json"

  /** Marker dropped into a version dir that prune RETIRED from the
    * serveable list but could not fully delete because newer manifests
    * still reference some of its partition directories. The dir holds
    * only referenced data from then on; [[versions]] hides it. */
  private[llm] val RetiredMarker = "_retired"

  /** List SERVEABLE snapshot versions at `path`, oldest→newest. FS-only
    * (no Spark session) so CLI tooling can call it like RunState.
    * Retired-but-still-referenced data dirs (see [[RetiredMarker]]) are
    * not serveable and are excluded. */
  def versions(conf: org.apache.hadoop.conf.Configuration,
               path: String): Seq[Long] = {
    val base = new org.apache.hadoop.fs.Path(path)
    val fs = base.getFileSystem(conf)
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("version=")
        && !fs.exists(new org.apache.hadoop.fs.Path(st.getPath, RetiredMarker)))
      .map(_.getPath.getName.stripPrefix("version=").toLong).sorted
  }

  /** All version dirs physically on disk, serveable or retired. */
  private def physicalVersions(fs: org.apache.hadoop.fs.FileSystem,
                               base: org.apache.hadoop.fs.Path): Seq[Long] = {
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("version="))
      .map(_.getPath.getName.stripPrefix("version=").toLong).sorted
  }

  private def jackson = new com.fasterxml.jackson.databind.ObjectMapper()

  private[llm] def writeManifest(fs: org.apache.hadoop.fs.FileSystem,
                                 versionDir: org.apache.hadoop.fs.Path,
                                 entries: Map[String, Long]): Unit = {
    val m = new java.util.LinkedHashMap[String, java.lang.Long]()
    entries.toSeq.sortBy(_._1).foreach { case (k, v) => m.put(k, v) }
    val out = fs.create(new org.apache.hadoop.fs.Path(versionDir, ManifestFile),
      true)
    try out.write(jackson.writeValueAsBytes(m)) finally out.close()
  }

  /** Drop an underscore-prefixed text marker into a (temp) version dir —
    * invisible to the physical walk and to parquet readers. Used by
    * store builders that must stamp metadata (applied batch tokens,
    * bucket counts) atomically with the data they describe. */
  private[graft] def writeTextMarker(
      conf: org.apache.hadoop.conf.Configuration,
      dir: String, name: String, value: String): Unit = {
    require(name.startsWith("_"),
      s"marker files must be underscore-prefixed: $name")
    val mk = new org.apache.hadoop.fs.Path(dir, name)
    val out = mk.getFileSystem(conf).create(mk, true)
    try out.write(value.getBytes("UTF-8")) finally out.close()
  }

  /** Read back a [[writeTextMarker]] marker, if present. */
  private[graft] def readTextMarker(
      conf: org.apache.hadoop.conf.Configuration,
      dir: String, name: String): Option[String] = {
    val f = new org.apache.hadoop.fs.Path(dir, name)
    val fs = f.getFileSystem(conf)
    if (!fs.exists(f)) None
    else {
      val in = fs.open(f)
      try Some(new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim)
      finally in.close()
    }
  }

  private[graft] def readManifest(conf: org.apache.hadoop.conf.Configuration,
                                path: String, v: Long)
      : Option[Map[String, Long]] = {
    val f = new org.apache.hadoop.fs.Path(s"$path/version=$v/$ManifestFile")
    val fs = f.getFileSystem(conf)
    if (!fs.exists(f)) None
    else {
      val in = fs.open(f)
      val tree = try jackson.readTree(in) finally in.close()
      val b = Map.newBuilder[String, Long]
      tree.fields().forEachRemaining(e => b += (e.getKey -> e.getValue.asLong()))
      Some(b.result())
    }
  }

  /** The manifest a physical-only snapshot dir implies: every visible
    * `col=value` child of the root (or of a first-level sub-table dir),
    * every un-partitioned sub-table dir, or `"."` when the root itself
    * is an un-partitioned table — all owned by `owner`. This is the
    * granularity every manifest uses, so prune can compare a version's
    * physical content against the referenced-entry set directly. */
  private[llm] def physicalEntries(fs: org.apache.hadoop.fs.FileSystem,
                                   dir: org.apache.hadoop.fs.Path,
                                   owner: Long): Map[String, Long] = {
    val kids = fs.listStatus(dir).filter(visibleStatus)
    val (dirs, files) = kids.partition(_.isDirectory)
    if (dirs.isEmpty) {
      if (files.isEmpty) Map.empty else Map("." -> owner)
    } else if (dirs.exists(_.getPath.getName.contains("="))) {
      // root IS the partitioned table
      dirs.filter(_.getPath.getName.contains("="))
        .map(d => d.getPath.getName -> owner).toMap
    } else {
      dirs.flatMap { sub =>
        val name = sub.getPath.getName
        val subKids = fs.listStatus(sub.getPath).filter(visibleStatus)
        val parts = subKids.filter(st => st.isDirectory &&
          st.getPath.getName.contains("="))
        if (parts.nonEmpty)
          parts.map(p => s"$name/${p.getPath.getName}" -> owner).toSeq
        // a HOLLOW sub dir (marker files only — what an empty-frame
        // partitionBy write leaves behind) is NOT a table: emitting it
        // as a whole-sub entry would make the manifest mix whole and
        // partition entries for the same sub-table and the version
        // unreadable (parquet schema inference has nothing to read)
        else if (subKids.exists(_.isFile)) Seq(name -> owner)
        else Seq.empty
      }.toMap
    }
  }

  /** The snapshot's logical entry map: its manifest when present, else
    * the physical synthesis (legacy full-build snapshots). */
  private[graft] def effectiveEntries(conf: org.apache.hadoop.conf.Configuration,
                                    path: String, v: Long)
      : Map[String, Long] =
    readManifest(conf, path, v).getOrElse {
      val dir = new org.apache.hadoop.fs.Path(s"$path/version=$v")
      physicalEntries(dir.getFileSystem(conf), dir, v)
    }

  /** Read one logical (sub-)table of a pinned snapshot, resolving the
    * manifest when the snapshot is manifest-referenced: each entry reads
    * from its owning version's directory (with `basePath` pinned so the
    * partition column round-trips exactly as a physical read would
    * produce it), grouped per owner and unioned by name. `subTable` is
    * `""` for root-as-table layouts. A snapshot with no manifest reads
    * the physical directory directly — byte-for-byte the legacy path. */
  def readSnapshotTable(spark: org.apache.spark.sql.SparkSession,
                        path: String, subTable: String = "",
                        version: Option[Long] = None)
      : org.apache.spark.sql.DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val vs = versions(conf, path)
    require(vs.nonEmpty, s"no layout snapshots at $path")
    val pin = version.getOrElse(vs.last)
    require(vs.contains(pin),
      s"layout version $pin not present at $path (have: ${vs.mkString(",")})")
    def physDir(owner: Long) =
      if (subTable.isEmpty) s"$path/version=$owner"
      else s"$path/version=$owner/$subTable"
    readManifest(conf, path, pin) match {
      case None => spark.read.parquet(physDir(pin))
      case Some(m) =>
        val relevant =
          if (subTable.isEmpty)
            m.filter { case (k, _) => k == "." || !k.contains("/") }
          else
            m.filter { case (k, _) =>
              k == subTable || k.startsWith(s"$subTable/") }
        require(relevant.nonEmpty,
          s"snapshot version=$pin at $path has no entries for " +
            s"sub-table '$subTable' (manifest keys: ${m.keys.mkString(",")})")
        val frames = relevant.groupBy(_._2).toSeq.sortBy(_._1).map {
          case (owner, entries) =>
            val whole = entries.keySet.exists(k =>
              k == "." || k == subTable)
            if (whole) {
              require(entries.size == 1,
                s"manifest mixes whole-table and partition entries for " +
                  s"'$subTable' under owner $owner")
              spark.read.parquet(physDir(owner))
            } else {
              val dirs = entries.keys.toSeq.sorted.map { k =>
                val dirName =
                  if (subTable.isEmpty) k else k.stripPrefix(s"$subTable/")
                s"${physDir(owner)}/$dirName"
              }
              spark.read.option("basePath", physDir(owner))
                .parquet(dirs: _*)
            }
        }
        frames.reduce(_.unionByName(_))
    }
  }

  /** [[writeSnapshot]] for INCREMENTAL builds: `build` writes only the
    * entries it REWRITES into the dot-temp and returns the `carried`
    * map — inherited entries (relative path → physical owner version)
    * that the new snapshot serves without touching a byte. The helper
    * synthesizes the self-owned entries from what `build` physically
    * wrote, merges, and lands `_manifest.json` next to them before the
    * atomic rename. Version cost is ∝ touched entries: nothing is
    * copied for the carried ones — this is the manifest-referenced
    * version model (the physical copy-through is now the COMPACTION
    * path, [[compactSnapshot]]). */
  def writeSnapshotManifested(conf: org.apache.hadoop.conf.Configuration,
                              path: String)
                             (build: (String, Long) => Map[String, Long])
      : Long = {
    val base = new org.apache.hadoop.fs.Path(path)
    val fs = base.getFileSystem(conf)
    writeSnapshot(conf, path) { tmp =>
      val tmpPath = new org.apache.hadoop.fs.Path(tmp)
      // an all-carried build legitimately writes NOTHING (partial
      // compaction of an unfragmented store, a propagation where every
      // table is inherited) — the dot-temp must still exist for the
      // physical walk below and the atomic rename after
      fs.mkdirs(tmpPath)
      val next = tmp.split("\\.tmp-version-").last.toLong
      val carried = build(tmp, next)
      val own = physicalEntries(fs, tmpPath, next)
      val overlap = carried.keySet.intersect(own.keySet)
      require(overlap.isEmpty,
        s"carried entries also physically written: ${overlap.mkString(",")}")
      carried.foreach { case (k, o) =>
        require(o < next, s"carried entry $k claims future owner $o")
      }
      writeManifest(fs, tmpPath, carried ++ own)
    }
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
    // a failed build must not leave the dot-temp behind: versions()
    // ignores it, but a RETRY of the same version would land into the
    // leftover directory, whose stale files from the failed attempt
    // could silently join the next snapshot
    try build(tmp.toString)
    catch {
      case e: Throwable =>
        try if (fs.exists(tmp)) fs.delete(tmp, true)
        catch { case _: Throwable => () }
        throw e
    }
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
    * writer's path escaping unchanged — incremental-version decisions
    * compare `col=value` directory names against DataFrame values by PLAIN
    * string equality, which is only sound when no character is subject
    * to escaping (and the value is non-null: a null lands under the
    * default-partition sentinel). The sentinel NAME itself is also
    * rejected: a value literally equal to `__HIVE_DEFAULT_PARTITION__`
    * is letters/underscores only, but its directory name collides with
    * the null-partition directory — the isin rewrite filter would skip
    * the old null rows (null comparison) AND the manifest would skip
    * the directory, silently losing them. Every non-plain value sends
    * the caller down the full-rewrite path instead — correctness never
    * depends on the fast path firing. */
  private[llm] def plainPartitionValue(s: String): Boolean =
    s != null && s.nonEmpty &&
      s != "__HIVE_DEFAULT_PARTITION__" &&
      s.forall(c =>
        c.isLetterOrDigit && c < 128 || c == '_' || c == '-' || c == '.')


  /** Carry a snapshot's top-level TEXT MARKERS ([[writeTextMarker]] —
    * applied-batch tokens, bucket counts, frozen codebooks…) into a
    * rewrite's temp dir: a marker describes the snapshot's LOGICAL
    * content, which a compaction preserves by definition — dropping it
    * would strip replay protection (`_applied_batch`) and fail-fast
    * layout checks (`_state_buckets`/`_cluster_buckets`) from the
    * compacted version, silently degrading the next fold. The
    * manifest, retired flag and Spark's `_SUCCESS` are version-local
    * bookkeeping, not content, and are NOT carried. */
  private def carryMarkers(conf: org.apache.hadoop.conf.Configuration,
                           fromDir: String, toDir: String): Unit = {
    val from = new org.apache.hadoop.fs.Path(fromDir)
    val fs = from.getFileSystem(conf)
    fs.listStatus(from)
      .filter(st => st.isFile && st.getPath.getName.startsWith("_") &&
        st.getPath.getName != ManifestFile &&
        st.getPath.getName != RetiredMarker &&
        st.getPath.getName != "_SUCCESS")
      .foreach { st =>
        org.apache.hadoop.fs.FileUtil.copy(fs, st.getPath, fs,
          new org.apache.hadoop.fs.Path(toDir, st.getPath.getName),
          false, conf)
      }
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
    val pin = versions(conf, path).lastOption.getOrElse(
      throw new IllegalArgumentException(s"no layout snapshots at $path"))
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    // logical tables from the effective entry map (a manifest-referenced
    // snapshot may physically hold only its touched dirs — compaction is
    // exactly the pass that re-materializes the WHOLE logical snapshot
    // as one physical version, which is why it stays manifest-free)
    val entries = effectiveEntries(conf, path, pin)
    val rootTable = entries.keySet.exists(k =>
      k == "." || (!k.contains("/") && k.contains("=")))
    val tables: Seq[String] =
      if (rootTable) Seq("")
      else entries.keys.map(_.split("/")(0)).toSeq.distinct.sorted
    withPartitionInferenceOff(spark) {
      writeSnapshot(conf, path) { tmp =>
        tables.foreach { sub =>
          val df = readSnapshotTable(spark, path, sub, Some(pin))
          val owner = entries.collectFirst {
            case (k, o) if (sub.isEmpty && (k == "." || k.contains("="))) ||
              (sub.nonEmpty && (k == sub || k.startsWith(s"$sub/"))) => o
          }.get
          val ownerDir = new org.apache.hadoop.fs.Path(
            if (sub.isEmpty) s"$path/version=$owner"
            else s"$path/version=$owner/$sub")
          val parts = partitionCols(fs, ownerDir)
          val w = (if (parts.isEmpty) df.coalesce(1)
                   else df.repartition(parts.map(
                     org.apache.spark.sql.functions.col): _*))
            .write.mode("overwrite")
            .option("maxRecordsPerFile", maxRecordsPerFile)
          (if (parts.isEmpty) w else w.partitionBy(parts: _*))
            .parquet(if (sub.isEmpty) tmp else s"$tmp/$sub")
        }
        carryMarkers(conf, s"$path/version=$pin", tmp)
      }
    }
  }

  /** PARTIAL compaction: re-materialize only the entries of the pinned
    * snapshot whose physical directory holds more than
    * `maxFilesPerEntry` data files; every other entry is carried by
    * manifest reference, untouched. [[compactSnapshot]] is ∝ TABLE
    * (every byte rewrites — right for flattening a long manifest
    * chain); this pass is ∝ FRAGMENTATION, which is what a 100k-dir
    * 100 TB layout actually needs on a maintenance cadence: the hot
    * partitions that take frequent appends accrete small files, the
    * cold thousands do not, and rewriting the cold ones to fix the hot
    * ones is the same ∝-table cost the manifest model exists to avoid.
    * Returns the new version (a no-op input still lands a new
    * all-carried version — callers can skip by checking
    * [[fragmentedEntries]] first). */
  def compactSnapshotPartial(spark: org.apache.spark.sql.SparkSession,
                             path: String,
                             maxFilesPerEntry: Int = 8,
                             maxRecordsPerFile: Long = 4L * 1024 * 1024)
      : Long = {
    require(maxFilesPerEntry >= 1,
      s"maxFilesPerEntry must be >= 1: $maxFilesPerEntry")
    val conf = spark.sparkContext.hadoopConfiguration
    val pin = versions(conf, path).lastOption.getOrElse(
      throw new IllegalArgumentException(s"no layout snapshots at $path"))
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val entries = effectiveEntries(conf, path, pin)
    val frag = fragmentedEntries(conf, path, pin, maxFilesPerEntry)
    withPartitionInferenceOff(spark) {
      writeSnapshotManifested(conf, path) { (tmp, _) =>
        // group the fragmented entries by logical (sub-)table so each
        // table rewrites its affected partition values in ONE job
        frag.keys.groupBy(k =>
          if (k == "." || !k.contains("/")) {
            if (k.contains("=") || k == ".") "" else k
          } else k.split("/")(0)
        ).foreach { case (sub, keys) =>
          val dest = if (sub.isEmpty) tmp else s"$tmp/$sub"
          val whole = keys.exists(k => k == "." || k == sub)
          if (whole) {
            readSnapshotTable(spark, path, sub, Some(pin))
              .coalesce(1).write.mode("overwrite")
              .option("maxRecordsPerFile", maxRecordsPerFile)
              .parquet(dest)
          } else {
            // partition dirs of a partitioned table: read only the
            // fragmented dirs (per owner, basePath-pinned), rewrite
            // them re-clustered — partitionBy writes ONLY the values
            // present, which are exactly these dirs' values. The
            // partition spec is the FULL col=value chain of the entry's
            // owner dir (manifest entries own one top-level value, but
            // the subtree below may be further partitioned — flattening
            // it would re-land inner partition columns as string DATA
            // columns, changing the read-back schema)
            val firstKey = keys.head
            val chain: Seq[String] = {
              val o = entries(firstKey)
              val ownerBase =
                if (sub.isEmpty) s"$path/version=$o"
                else s"$path/version=$o/$sub"
              val leaf =
                if (sub.isEmpty) firstKey
                else firstKey.stripPrefix(s"$sub/")
              leaf.split("=", 2)(0) +: partitionCols(fs,
                new org.apache.hadoop.fs.Path(s"$ownerBase/$leaf"))
            }
            val byOwner = keys.groupBy(k => entries(k))
            val frames = byOwner.toSeq.sortBy(_._1).map { case (o, ks) =>
              val basem =
                if (sub.isEmpty) s"$path/version=$o"
                else s"$path/version=$o/$sub"
              val dirs = ks.toSeq.sorted.map { k =>
                val d = if (sub.isEmpty) k else k.stripPrefix(s"$sub/")
                s"$basem/$d"
              }
              spark.read.option("basePath", basem).parquet(dirs: _*)
            }
            frames.reduce(_.unionByName(_))
              .repartition(chain.map(
                org.apache.spark.sql.functions.col): _*)
              .write.mode("overwrite")
              .option("maxRecordsPerFile", maxRecordsPerFile)
              .partitionBy(chain: _*).parquet(dest)
          }
        }
        carryMarkers(conf, s"$path/version=$pin", tmp)
        entries -- frag.keySet
      }
    }
  }

  /** Auto-compaction policy for a maintenance loop (m71 proved the
    * compactor COMPOSES with the CDC fold lifecycle; this is the
    * trigger nothing previously supplied — a long-lived store accretes
    * a version per batch until an operator intervenes). Both triggers
    * are OFF by default, so `CompactionPolicy()` never fires and a
    * policy-disabled fold is byte-identical to an unpoliced one.
    *
    *  - `maxManifestChain`: fire a FULL [[compactSnapshot]] when the
    *    newest snapshot's effective entries span >= this many distinct
    *    owner versions — the manifest-chain depth a reader must
    *    traverse, and the thing per-batch manifested folds grow one
    *    owner at a time. Full compaction re-materializes the whole
    *    logical snapshot as ONE physical version, resetting the depth
    *    to 1 (self-limiting: the trigger can't re-fire until the chain
    *    regrows).
    *  - `maxFilesPerEntry`: fire a PARTIAL [[compactSnapshotPartial]]
    *    when any entry's physical dir exceeds this many data files —
    *    the ∝-fragmentation small-file pass; cold entries carry by
    *    reference.
    *
    * Checked AFTER a fold lands (the just-landed version counts toward
    * the depth) and skipped on replayed batches — opportunistic: a
    * crash between the fold and the compaction just defers firing to
    * the next live batch, correctness never depends on it (compaction
    * is physical churn with zero logical change, and [[carryMarkers]]
    * preserves the replay token + bucket count — the m71 guarantees). */
  final case class CompactionPolicy(
      maxManifestChain: Option[Int] = None,
      maxFilesPerEntry: Option[Int] = None,
      retainVersions: Option[Int] = None,
      maxRecordsPerFile: Long = 4L * 1024 * 1024) {
    require(maxManifestChain.forall(_ >= 2),
      s"maxManifestChain must be >= 2 (a fresh full snapshot has " +
        s"depth 1): $maxManifestChain")
    require(maxFilesPerEntry.forall(_ >= 1),
      s"maxFilesPerEntry must be >= 1: $maxFilesPerEntry")
    require(retainVersions.forall(_ >= 1),
      s"retainVersions must be >= 1: $retainVersions")
    def enabled: Boolean = maxManifestChain.isDefined ||
      maxFilesPerEntry.isDefined || retainVersions.isDefined
  }

  /** Apply `policy` to the newest snapshot at `path`: compact if a
    * trigger fires, then enforce retention. Returns the compacted
    * version, or None (no snapshot, or thresholds not met). Trigger
    * checks are metadata-only: a version listing + the manifest for
    * chain depth, a file listing for fragmentation.
    *
    * `retainVersions` runs [[prune]] AFTER the compaction check (a
    * just-compacted full version anchors the retained set) — the
    * space half of per-batch accretion, and safe by prune's
    * manifest-aware GC: a pruned version's physically-owned dirs
    * survive for as long as any retained manifest references them, so
    * retention can never tear the snapshots it keeps. Retention
    * trades ROLLBACK REACH for space — keep it generous on stores
    * where replaying history matters. */
  def maybeCompact(spark: org.apache.spark.sql.SparkSession,
                   path: String, policy: CompactionPolicy): Option[Long] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val out = versions(conf, path).lastOption.flatMap { pin =>
      val chain = effectiveEntries(conf, path, pin).values.toSet.size
      if (policy.maxManifestChain.exists(chain >= _))
        Some(compactSnapshot(spark, path, policy.maxRecordsPerFile))
      else policy.maxFilesPerEntry.filter(m =>
          fragmentedEntries(conf, path, pin, m).nonEmpty)
        .map(m => compactSnapshotPartial(spark, path, m,
          policy.maxRecordsPerFile))
    }
    if (out.isDefined || versions(conf, path).nonEmpty)
      policy.retainVersions.foreach(r => prune(conf, path, r))
    out
  }

  /** The pinned snapshot's entries whose physical dir holds more than
    * `maxFilesPerEntry` data files → data-file count. The cheap
    * pre-flight for [[compactSnapshotPartial]] (file-metadata only). */
  def fragmentedEntries(conf: org.apache.hadoop.conf.Configuration,
                        path: String, version: Long,
                        maxFilesPerEntry: Int): Map[String, Int] = {
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    effectiveEntries(conf, path, version).flatMap { case (k, o) =>
      val dir = new org.apache.hadoop.fs.Path(
        if (k == ".") s"$path/version=$o"
        else s"$path/version=$o/$k")
      var n = 0
      val it = fs.listFiles(dir, true)
      while (it.hasNext) {
        val f = it.next()
        val name = f.getPath.getName
        if (!name.startsWith("_") && !name.startsWith(".")) n += 1
      }
      if (n > maxFilesPerEntry) Some(k -> n) else None
    }
  }

  /** Delete all but the newest `retain` snapshots; returns the versions
    * removed from the serveable list (oldest→newest). FS-only,
    * mirroring RunState's prune.
    *
    * Manifest-aware GC: a pruned version stops being serveable
    * immediately (its manifest is deleted; [[versions]] hides it), but
    * a partition directory it physically owns survives for as long as
    * ANY retained manifest references it — deleting it would tear the
    * referencing snapshots. Such a version dir stays on disk holding
    * only the referenced data, marked [[RetiredMarker]]; every later
    * prune re-sweeps retired dirs, so once the last referencing
    * snapshot is itself pruned the leftover data deletes and the dir
    * disappears. Purely-physical (legacy) snapshots are never
    * referenced by anyone and delete wholesale, exactly as before. */
  def prune(conf: org.apache.hadoop.conf.Configuration,
            path: String, retain: Int): Seq[Long] = {
    require(retain >= 1, s"retain must be >= 1: $retain")
    val base = new org.apache.hadoop.fs.Path(path)
    val fs = base.getFileSystem(conf)
    val serveable = versions(conf, path)
    val doomed = serveable.dropRight(retain)
    val live = serveable.takeRight(retain).toSet
    val referenced: Set[(Long, String)] = live.flatMap(v =>
      // .toSeq first: mapping the Map directly would land in a
      // Map[owner, entry] and silently collapse every owner to ONE
      // surviving entry — prune would then delete live referenced dirs
      effectiveEntries(conf, path, v).toSeq.map { case (k, o) => (o, k) })
    physicalVersions(fs, base).filterNot(live.contains).foreach { w =>
      val wDir = new org.apache.hadoop.fs.Path(base, s"version=$w")
      // retire-in-place FIRST: the marker hides the version from
      // [[versions]] before a single byte deletes, so a crash anywhere
      // below leaves a version that is loudly un-pinnable (require
      // fails) rather than listed-but-partially-deleted — a silent
      // partial read would violate the store's torn-read guarantees.
      // The wholesale dir delete at the end is the only thing that
      // removes the marker.
      val marker = new org.apache.hadoop.fs.Path(wDir, RetiredMarker)
      if (!fs.exists(marker)) fs.create(marker).close()
      fs.delete(new org.apache.hadoop.fs.Path(wDir, ManifestFile), false)
      physicalEntries(fs, wDir, w).keys.foreach { e =>
        if (!referenced((w, e))) {
          if (e == ".") // whole-root data: drop the data files
            fs.listStatus(wDir).filter(st => visibleStatus(st) ||
                st.getPath.getName.startsWith("_"))
              .filterNot(_.getPath.getName == RetiredMarker)
              .foreach(st => fs.delete(st.getPath, true))
          else fs.delete(new org.apache.hadoop.fs.Path(wDir, e), true)
        }
      }
      // sweep sub-table dirs emptied by the entry deletions (only
      // _SUCCESS-style markers left): a hollow dir would otherwise read
      // back as a whole-table entry and pin the version dir forever
      fs.listStatus(wDir)
        .filter(st => st.isDirectory && visibleStatus(st) &&
          !st.getPath.getName.contains("=") &&
          !fs.listStatus(st.getPath).exists(visibleStatus))
        .foreach(st => fs.delete(st.getPath, true))
      if (physicalEntries(fs, wDir, w).isEmpty) fs.delete(wDir, true)
    }
    doomed
  }
}
