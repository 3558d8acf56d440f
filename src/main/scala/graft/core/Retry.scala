package graft.core

/** Bounded retry with exponential backoff — the reference's retry utility
  * family (common/retry/RetryableFunction, SimpleRetryStrategy,
  * SimpleRetryStrategyConfiguration.java:49: default 3 attempts; the
  * metadata manager's 3x exponential-wait save at
  * HDFSMetadataManager.java:172-183). Driver-side only: executor-side
  * retries belong to Spark's task retry machinery, not this.
  */
object Retry {

  /** Run `f`, retrying up to `attempts` total tries on any non-fatal
    * exception, sleeping backoffMs * mult^i between tries. Throws the
    * last failure when exhausted. */
  def apply[T](attempts: Int = 3, backoffMs: Long = 100, mult: Double = 2.0,
               onRetry: (Int, Throwable) => Unit = (_, _) => ())(f: => T): T = {
    require(attempts >= 1, s"attempts must be >= 1: $attempts")
    var tryNum = 0
    var wait = backoffMs.toDouble
    while (true) {
      tryNum += 1
      try return f
      catch {
        case scala.util.control.NonFatal(e) =>
          if (tryNum >= attempts) throw e
          onRetry(tryNum, e)
          Thread.sleep(wait.toLong)
          wait *= mult
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
