package graft.core

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import scala.collection.mutable

/** Batch-mode checkpoint manager with the reference's atomicity contract
  * (common/metadata/HDFSMetadataManager.java:158-243 and
  * common/job/JobDag.java:158-186):
  *   - checkpoints staged in memory during the run (`set`),
  *   - persisted ONLY on explicit `commit()` after all sinks succeed,
  *   - write = temp file + atomic rename,
  *   - retries with backoff, prune to the newest `retain` files.
  *
  * Uses the Hadoop FileSystem API, so the same code runs on local fs, HDFS,
  * or any HCFS (s3a etc.) — driver-side only, O(KB) metadata, nothing here
  * touches the data path, so it is scale-independent.
  */
final class RunState(baseDir: String, hadoopConf: Configuration = new Configuration(),
                     retain: Int = 5, maxRetries: Int = 3, backoffMs: Long = 100) {
  private val fs = new Path(baseDir).getFileSystem(hadoopConf)
  private val staged = mutable.LinkedHashMap.empty[String, String]

  locally {
    fs.mkdirs(new Path(baseDir))
    latestFile().foreach { p =>
      val in = new BufferedReader(new InputStreamReader(fs.open(p), StandardCharsets.UTF_8))
      try Iterator.continually(in.readLine()).takeWhile(_ != null).foreach { line =>
        line.split("\t", 2) match {
          case Array(k, v) => staged(k) = v
          case _           =>
        }
      } finally in.close()
    }
  }

  def get(key: String): Option[String] = staged.get(key)
  def set(key: String, value: String): Unit = staged(key) = value
  def remove(key: String): Unit = staged.remove(key)
  def all: Map[String, String] = staged.toMap
  /** Committed checkpoint file names, oldest first (tools/StateTool). */
  def checkpoints: Seq[String] = listCheckpoints().map(_.getName)

  private def listCheckpoints(): Seq[Path] =
    if (!fs.exists(new Path(baseDir))) Nil
    else fs.listStatus(new Path(baseDir)).toIndexedSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("state-"))
      .map(_.getPath).sortBy(_.getName)

  private def latestFile(): Option[Path] = listCheckpoints().lastOption

  private def nextSeq(): Long =
    latestFile().map(_.getName.stripPrefix("state-").toLong + 1).getOrElse(0L)

  /** Persist staged state. Called only after every sink committed. */
  def commit(): Unit = {
    var attempt = 0
    var done = false
    while (!done) {
      try {
        val seq = nextSeq()
        val tmp = new Path(baseDir, s".tmp-state-$seq")
        val out = new OutputStreamWriter(fs.create(tmp, true), StandardCharsets.UTF_8)
        try staged.foreach { case (k, v) => out.write(s"$k\t$v\n") } finally out.close()
        if (!fs.rename(tmp, new Path(baseDir, f"state-$seq%020d")))
          throw new java.io.IOException(s"rename failed for $tmp")
        done = true
      } catch {
        case e: Exception =>
          attempt += 1
          if (attempt >= maxRetries) throw e
          Thread.sleep(backoffMs * attempt)
      }
    }
    val old = listCheckpoints().dropRight(retain)
    old.foreach(p => fs.delete(p, false))
  }
}
