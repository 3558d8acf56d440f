package graft.core

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import java.nio.charset.StandardCharsets

/** Single-active-run lock per checkpoint directory — the coordination role
  * of the reference's ZooKeeper LockManager (utilities/LockManager.java,
  * JobManager.java:261-267) without requiring a coordinator: an atomic
  * exclusive-create of a lock file on the checkpoint's filesystem (rename/
  * create are atomic on HDFS and local fs). Stale locks — a holder that
  * died without releasing — are broken after `ttlMs`.
  */
final class RunLock(dir: String, ttlMs: Long = 3600000L,
                    hadoopConf: Configuration = new Configuration()) {
  private val lockPath = new Path(dir, ".graft-lock")
  private val fs = new Path(dir).getFileSystem(hadoopConf)

  /** Try to become the single active runner. */
  def tryAcquire(owner: String): Boolean = {
    fs.mkdirs(new Path(dir))
    def createExclusive(): Boolean =
      try {
        val out = fs.create(lockPath, false) // atomic exclusive create
        try out.write(s"$owner\n${System.currentTimeMillis()}".getBytes(StandardCharsets.UTF_8))
        finally out.close()
        true
      } catch { case _: java.io.IOException => false }

    createExclusive() || {
      // holder may have died: break the lock if it exceeded its ttl
      val stale =
        try System.currentTimeMillis() - fs.getFileStatus(lockPath).getModificationTime > ttlMs
        catch { case _: java.io.IOException => true } // vanished between checks
      stale && fs.delete(lockPath, false) && createExclusive()
    }
  }

  /** Current holder, if any. */
  def holder(): Option[String] =
    try {
      val in = fs.open(lockPath)
      try Option(new String(in.readAllBytes(), StandardCharsets.UTF_8).linesIterator
        .nextOption().getOrElse(""))
        .filter(_.nonEmpty)
      finally in.close()
    } catch { case _: java.io.IOException => None }

  /** Release only if we hold it (a stale-broken lock must not be
    * releasable by the old owner). */
  def release(owner: String): Boolean =
    holder().contains(owner) && fs.delete(lockPath, false)
}
