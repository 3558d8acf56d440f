package graft.exec

import graft.SparkTestBase
import graft.core.RunLock

class TimeoutGuardSpec extends SparkTestBase {

  test("guard cancels a job group with no task progress; healthy jobs untouched") {
    val guard = new TimeoutGuard(spark, stallTimeoutMs = 3000, checkIntervalMs = 250).start()
    try {
      // healthy short job in another group survives
      spark.sparkContext.setJobGroup("healthy", "healthy")
      assert(spark.range(1000).count() == 1000)
      spark.sparkContext.clearJobGroup()

      // one task that sleeps >> stall timeout and completes nothing
      val t0 = System.nanoTime()
      spark.sparkContext.setJobGroup("stuck", "stuck", interruptOnCancel = true)
      val failed = intercept[Exception] {
        spark.sparkContext.parallelize(Seq(1), 1)
          .map { _ => Thread.sleep(120000); 1 }.count()
      }
      val elapsedS = (System.nanoTime() - t0) / 1e9
      assert(elapsedS < 60, s"guard did not kill the stalled job (${elapsedS}s)")
      assert(guard.cancelled.contains("stuck"))
      assert(!guard.cancelled.contains("healthy"))
      assert(failed.getMessage != null)
    } finally {
      spark.sparkContext.clearJobGroup()
      guard.stop()
    }
  }

  test("RunLock: exclusive acquire, owner-checked release, stale break") {
    val dir = tmpDir("lock")
    val lock = new RunLock(dir, ttlMs = 100000)
    assert(lock.tryAcquire("runner-1"))
    assert(!lock.tryAcquire("runner-2"), "second runner acquired a held lock")
    assert(lock.holder().contains("runner-1"))
    assert(!lock.release("runner-2"), "non-holder released the lock")
    assert(lock.release("runner-1"))
    assert(lock.tryAcquire("runner-2"))
    // stale lock (tiny ttl) is broken by the next contender
    val dir2 = tmpDir("lock2")
    assert(new RunLock(dir2, ttlMs = 100000).tryAcquire("dead-runner"))
    Thread.sleep(50)
    assert(new RunLock(dir2, ttlMs = 10).tryAcquire("live-runner"),
      "stale lock not broken")
  }

  test("KafkaWorkUnits.runBatch commits bootstrap state without touching a broker") {
    import graft.sources.KafkaWorkUnits
    val dir = tmpDir("kafkaglue")
    val rs = new graft.core.RunState(dir)
    var sinkRan = false
    val r = KafkaWorkUnits.runBatch(spark, rs, "broker:9092", "t",
      earliest = Map(0 -> 0L), latest = Map(0 -> 500L), maxMessages = 100)(
      _ => sinkRan = true)
    assert(!sinkRan, "bootstrap run must not read")
    assert(r.workUnits.isEmpty)
    // committed: a fresh RunState sees latest as the checkpoint
    assert(KafkaWorkUnits.loadOffsets(new graft.core.RunState(dir), "t") == Map(0 -> 500L))
  }
}
