package graft.sources

import graft.SparkTestBase
import graft.core.RunState
import KafkaWorkUnits._

/** Offset policy tests with fake broker offset maps — no broker needed,
  * mirroring the reference's TestKafkaWorkUnitCalculator scenarios:
  * first-run bootstrap, normal increment, budget water-fill, data loss
  * fail/reset, new-partition discovery, checkpoint round-trip.
  */
class KafkaWorkUnitsSpec extends SparkTestBase {

  private val earliest = Map(0 -> 0L, 1 -> 0L, 2 -> 0L)

  test("first run bootstraps from latest and reads nothing") {
    val r = computeWorkUnits(Map.empty, earliest, Map(0 -> 100L, 1 -> 50L, 2 -> 0L), 1000)
    assert(r.workUnits.isEmpty)
    assert(r.nextState == Map(0 -> 100L, 1 -> 50L, 2 -> 0L))
    assert(r.lostMessages == 0)
  }

  test("normal run reads checkpoint..latest on every partition") {
    val cp = Map(0 -> 100L, 1 -> 50L, 2 -> 0L)
    val r = computeWorkUnits(cp, earliest, Map(0 -> 150L, 1 -> 80L, 2 -> 0L), 1000)
    assert(r.workUnits == Seq(OffsetRange(0, 100, 150), OffsetRange(1, 50, 80)))
    assert(r.nextState == Map(0 -> 150L, 1 -> 80L, 2 -> 0L))
    assert(r.totalMessages == 80)
  }

  test("budget water-fill: small partitions fully served, surplus rolls to big ones") {
    // available: p0=10, p1=100, p2=1000; budget 300
    val cp = Map(0 -> 0L, 1 -> 0L, 2 -> 0L)
    val r = computeWorkUnits(cp, earliest, Map(0 -> 10L, 1 -> 100L, 2 -> 1000L), 300)
    val byP = r.workUnits.map(u => u.partition -> u.count).toMap
    // smallest-first: p0 takes min(300/3,10)=10; p1 min(290/2,100)=100; p2 min(190/1,1000)=190
    assert(byP == Map(0 -> 10L, 1 -> 100L, 2 -> 190L))
    assert(r.totalMessages == 300)
    // unread tail of p2 stays for the next run
    assert(r.nextState(2) == 190L)
  }

  test("budget smaller than partition count still terminates; unselected partitions keep checkpoints") {
    val cp = Map(0 -> 0L, 1 -> 0L, 2 -> 0L)
    val r = computeWorkUnits(cp, earliest, Map(0 -> 10L, 1 -> 10L, 2 -> 10L), 2)
    assert(r.totalMessages <= 2)
    // every partition still has a next-state entry (reference drops these)
    assert(r.nextState.keySet == Set(0, 1, 2))
  }

  test("data loss: FailOnLoss throws with partition and offsets") {
    val cp = Map(0 -> 100L)
    val e = intercept[DataLossException](
      computeWorkUnits(cp, Map(0 -> 250L), Map(0 -> 300L), 1000))
    assert(e.partition == 0 && e.checkpoint == 100L && e.earliest == 250L)
  }

  test("data loss: ResetToEarliest resumes from earliest and counts the loss") {
    val cp = Map(0 -> 100L, 1 -> 40L)
    val r = computeWorkUnits(cp, Map(0 -> 250L, 1 -> 0L), Map(0 -> 300L, 1 -> 50L),
      1000, ResetToEarliest)
    assert(r.lostMessages == 150L)
    assert(r.workUnits.toSet == Set(OffsetRange(0, 250, 300), OffsetRange(1, 40, 50)))
  }

  test("new partition discovered mid-stream starts from earliest") {
    val cp = Map(0 -> 100L)
    val r = computeWorkUnits(cp, Map(0 -> 0L, 1 -> 5L), Map(0 -> 100L, 1 -> 30L), 1000)
    assert(r.workUnits == Seq(OffsetRange(1, 5, 30)))
    assert(r.nextState == Map(0 -> 100L, 1 -> 30L))
  }

  test("offsets JSON matches the Spark Kafka source format") {
    val units = Seq(OffsetRange(1, 50, 80), OffsetRange(0, 100, 150))
    assert(startingOffsetsJson("events", units) == """{"events":{"0":100,"1":50}}""")
    assert(endingOffsetsJson("events", units) == """{"events":{"0":150,"1":80}}""")
  }

  test("RunState round-trip: stage after success, reload next run; topics isolated") {
    val dir = tmpDir("kafka-state")
    val rs = new RunState(dir)
    stageOffsets(rs, "events", Map(0 -> 150L, 1 -> 80L))
    stageOffsets(rs, "other", Map(0 -> 7L))
    rs.commit()
    val fresh = new RunState(dir)
    assert(loadOffsets(fresh, "events") == Map(0 -> 150L, 1 -> 80L))
    assert(loadOffsets(fresh, "other") == Map(0 -> 7L))
    assert(loadOffsets(fresh, "missing").isEmpty)
  }

  test("end-to-end policy loop over a simulated broker (3 runs)") {
    val dir = tmpDir("kafka-loop")
    var broker = (earliest, Map(0 -> 100L, 1 -> 100L, 2 -> 100L)) // (earliest, latest)
    // run 1: bootstrap
    val rs1 = new RunState(dir)
    val r1 = computeWorkUnits(loadOffsets(rs1, "t"), broker._1, broker._2, 120)
    assert(r1.workUnits.isEmpty)
    stageOffsets(rs1, "t", r1.nextState); rs1.commit()
    // run 2: 150 new messages, budget 120
    broker = (broker._1, Map(0 -> 150L, 1 -> 150L, 2 -> 150L))
    val rs2 = new RunState(dir)
    val r2 = computeWorkUnits(loadOffsets(rs2, "t"), broker._1, broker._2, 120)
    assert(r2.totalMessages == 120)
    stageOffsets(rs2, "t", r2.nextState); rs2.commit()
    // run 3: drains the remaining 30
    val rs3 = new RunState(dir)
    val r3 = computeWorkUnits(loadOffsets(rs3, "t"), broker._1, broker._2, 120)
    assert(r3.totalMessages == 30)
    val finalState = r3.nextState
    assert(finalState == Map(0 -> 150L, 1 -> 150L, 2 -> 150L))
  }
}
