package graft.tools

import graft.core.RunState

/** RunState metadata CLI — the `marmaray-tools` role (reference
  * marmaray-tools/src/main/java/com/uber/marmaray/tools/HDFSMetadataPrinter
  * .java:44-77 and HDFSMetadataPruner.java:52-97): inspect and prune a
  * job's checkpointed metadata from the command line. Works on any
  * Hadoop-compatible FS path (local, hdfs://, s3a://) like RunState
  * itself.
  *
  * Usage:
  *   sbt "runMain graft.tools.StateTool print    <stateDir>"
  *   sbt "runMain graft.tools.StateTool get      <stateDir> <key>"
  *   sbt "runMain graft.tools.StateTool versions <stateDir>"
  *   sbt "runMain graft.tools.StateTool unset    <stateDir> <key>"
  *   sbt "runMain graft.tools.StateTool prune    <stateDir> <retain>"
  *
  * Bench-key snapshot stores (llm.Dedup.writeBenchKeysSnapshot) get the
  * same treatment — list and prune are pure-FS, no Spark session:
  *   sbt "runMain graft.tools.StateTool benchkeys       <storeDir>"
  *   sbt "runMain graft.tools.StateTool benchkeys-prune <storeDir> <retain>"
  * and versioned layout stores (llm.LayoutStore — e.g. the BM25
  * postings index via TextAnalysis.writeBm25Snapshot) likewise:
  *   sbt "runMain graft.tools.StateTool layouts       <storeDir>"
  *   sbt "runMain graft.tools.StateTool layouts-prune <storeDir> <retain>"
  * manifest-referenced versions list their inherited/owned entry split,
  * and the fragmentation gauge prices a partial compaction without a
  * Spark session (LayoutStore.fragmentedEntries):
  *   sbt "runMain graft.tools.StateTool layouts-frag  <storeDir> <maxFilesPerEntry>"
  */
object StateTool {

  def main(args: Array[String]): Unit = args.toList match {
    case "print" :: dir :: Nil =>
      new RunState(dir).all.foreach { case (k, v) => println(s"$k\t$v") }
    case "get" :: dir :: key :: Nil =>
      new RunState(dir).get(key) match {
        case Some(v) => println(v)
        case None => System.err.println(s"no key '$key' in $dir"); sys.exit(1)
      }
    case "versions" :: dir :: Nil =>
      new RunState(dir).checkpoints.foreach(println)
    case "unset" :: dir :: key :: Nil =>
      val rs = new RunState(dir)
      if (rs.get(key).isEmpty) {
        System.err.println(s"no key '$key' in $dir"); sys.exit(1)
      }
      rs.remove(key)
      rs.commit()
      println(s"removed '$key' (new checkpoint committed)")
    case "prune" :: dir :: retain :: Nil =>
      val n = retain.toInt
      require(n >= 1, s"retain must be >= 1: $n")
      // commit() with the target retention re-persists current state and
      // deletes everything but the newest n checkpoint files
      val rs = new RunState(dir, retain = n)
      val before = rs.checkpoints.size
      rs.commit()
      println(s"pruned $dir: $before -> ${rs.checkpoints.size} checkpoints (retain $n)")
    case "benchkeys" :: dir :: Nil =>
      val conf = new org.apache.hadoop.conf.Configuration()
      val base = new org.apache.hadoop.fs.Path(dir)
      val fs = base.getFileSystem(conf)
      val vs = graft.llm.Dedup.benchKeyVersions(conf, dir)
      if (vs.isEmpty) println(s"no bench-key snapshots at $dir")
      else vs.foreach { v =>
        val p = new org.apache.hadoop.fs.Path(base, s"version=$v")
        val sum = fs.getContentSummary(p)
        val live = if (v == vs.last) "\tLIVE" else ""
        println(s"version=$v\tfiles=${sum.getFileCount}\tbytes=${sum.getLength}$live")
      }
    case "benchkeys-prune" :: dir :: retain :: Nil =>
      val removed = graft.llm.Dedup.pruneBenchKeys(
        new org.apache.hadoop.conf.Configuration(), dir, retain.toInt)
      println(s"pruned $dir: removed versions " +
        s"[${removed.mkString(",")}] (retain ${retain.toInt})")
    case "layouts" :: dir :: Nil =>
      val conf = new org.apache.hadoop.conf.Configuration()
      val base = new org.apache.hadoop.fs.Path(dir)
      val fs = base.getFileSystem(conf)
      val vs = graft.llm.LayoutStore.versions(conf, dir)
      if (vs.isEmpty) println(s"no layout snapshots at $dir")
      else vs.foreach { v =>
        val p = new org.apache.hadoop.fs.Path(base, s"version=$v")
        val sum = fs.getContentSummary(p)
        val live = if (v == vs.last) "\tLIVE" else ""
        // manifest split: a manifested version physically owns only its
        // touched entries; the rest serve by reference from older dirs
        val man = graft.llm.LayoutStore.readManifest(conf, dir, v)
          .map { m =>
            val inh = m.count(_._2 < v)
            s"\towned=${m.size - inh}\tinherited=$inh"
          }.getOrElse("\tphysical")
        println(s"version=$v\tfiles=${sum.getFileCount}\tbytes=${sum.getLength}$man$live")
      }
    case "layouts-frag" :: dir :: maxFiles :: Nil =>
      val conf = new org.apache.hadoop.conf.Configuration()
      val vs = graft.llm.LayoutStore.versions(conf, dir)
      if (vs.isEmpty) { println(s"no layout snapshots at $dir"); sys.exit(1) }
      val frag = graft.llm.LayoutStore.fragmentedEntries(conf, dir,
        vs.last, maxFiles.toInt)
      if (frag.isEmpty)
        println(s"version=${vs.last}: no entry over ${maxFiles.toInt} files " +
          "— nothing to compact")
      else frag.toSeq.sortBy(-_._2).foreach { case (k, n) =>
        println(s"$k\tfiles=$n")
      }
    case "layouts-prune" :: dir :: retain :: Nil =>
      val removed = graft.llm.LayoutStore.prune(
        new org.apache.hadoop.conf.Configuration(), dir, retain.toInt)
      println(s"pruned $dir: removed versions " +
        s"[${removed.mkString(",")}] (retain ${retain.toInt})")
    case _ =>
      System.err.println(
        "usage: StateTool print|versions <dir> | get|unset <dir> <key> | " +
          "prune <dir> <retain> | benchkeys <dir> | benchkeys-prune <dir> <retain> | " +
          "layouts <dir> | layouts-prune <dir> <retain> | " +
          "layouts-frag <dir> <maxFilesPerEntry>")
      sys.exit(2)
  }
}
