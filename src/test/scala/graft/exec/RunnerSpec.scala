package graft.exec

import graft.SparkTestBase
import java.util.concurrent.ConcurrentHashMap
import scala.concurrent.duration._
import scala.util.{Failure, Success}

class RunnerSpec extends SparkTestBase {

  test("session is configured FAIR so per-pipeline pools are honored") {
    assert(spark.sparkContext.getConf.get("spark.scheduler.mode") == "FAIR")
  }

  test("runAll executes all pipelines and reports per-pipeline results") {
    val seen = new ConcurrentHashMap[String, Long]()
    val results = Runner.runAll(spark, Seq(
      "a" -> ((s: org.apache.spark.sql.SparkSession) => { seen.put("a", s.range(100).count()) }),
      "b" -> ((s: org.apache.spark.sql.SparkSession) => { seen.put("b", s.range(50).count()) }),
      "c" -> ((s: org.apache.spark.sql.SparkSession) => { seen.put("c", 0L) })))
    assert(results.map(_.name).toSet == Set("a", "b", "c"))
    assert(results.forall(_.result.isSuccess))
    assert(seen.get("a") == 100L && seen.get("b") == 50L)
  }

  test("one failing pipeline does not fail the others (isolation)") {
    val results = Runner.runAll(spark, Seq(
      "ok" -> ((s: org.apache.spark.sql.SparkSession) => { s.range(10).count(); () }),
      "boom" -> ((_: org.apache.spark.sql.SparkSession) => throw new RuntimeException("dead")),
      "ok2" -> ((s: org.apache.spark.sql.SparkSession) => { s.range(10).count(); () })))
    val byName = results.map(r => r.name -> r.result).toMap
    assert(byName("ok").isSuccess && byName("ok2").isSuccess)
    byName("boom") match {
      case Failure(e) => assert(e.getMessage == "dead")
      case Success(_) => fail("expected failure")
    }
  }

  test("shared timeout budget: late pipelines do not each get a fresh window") {
    // parallelism=1 serializes: p1 ends ~2s, p2 ~4s, p3 ~6s. A 3s SHARED
    // deadline admits only p1; per-await timeouts (the round-1 bug) would
    // have admitted p2 as well (its own 3s window ends at t=5 > 4).
    val results = Runner.runAll(spark, Seq(
      "p1" -> ((_: org.apache.spark.sql.SparkSession) => Thread.sleep(2000)),
      "p2" -> ((_: org.apache.spark.sql.SparkSession) => Thread.sleep(2000)),
      "p3" -> ((_: org.apache.spark.sql.SparkSession) => Thread.sleep(2000))),
      parallelism = 1, timeout = 3.seconds)
    val byName = results.map(r => r.name -> r.result).toMap
    assert(byName("p1").isSuccess)
    assert(byName("p2").isFailure, "p2 got a fresh timeout window")
    assert(byName("p3").isFailure)
  }

  test("orderByHistory runs longest-first, unknown pipelines first") {
    val ps = Seq[(String, org.apache.spark.sql.SparkSession => Unit)](
      "fast" -> (_ => ()), "slow" -> (_ => ()), "new" -> (_ => ()))
    val ordered = Runner.orderByHistory(ps, Map("fast" -> 10L, "slow" -> 500L))
    assert(ordered.map(_._1) == Seq("new", "slow", "fast"))
  }
}
