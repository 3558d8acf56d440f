package graft.exec

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, TimeUnit}
import scala.jdk.CollectionConverters._

/** JobSubDag two-phase semantics (reference common/job/TestJobSubDag.java):
  * execute-all before any commit; commits ordered by priority; execute
  * failure aborts with zero commits; children execute in parallel.
  */
class SubDagSpec extends SparkTestBase {

  private def payload = spark.range(100).toDF("id")

  test("all executes run before any commit; commits follow priority order") {
    val log = new ConcurrentLinkedQueue[String]()
    val dag = SubDag("parent",
      execute = df => { df.count(); log.add("exec:parent") },
      commit = () => log.add("commit:parent"),
      children = Seq(
        SubDag("hudi", priority = 1,
          execute = _ => log.add("exec:hudi"), commit = () => log.add("commit:hudi")),
        SubDag("errors", priority = 0,
          execute = _ => log.add("exec:errors"), commit = () => log.add("commit:errors"))))
    SubDag.run(dag, payload)
    val events = log.asScala.toSeq
    val (execs, commits) = events.partition(_.startsWith("exec:"))
    assert(execs.toSet == Set("exec:parent", "exec:hudi", "exec:errors"))
    // every execute precedes every commit
    assert(events.lastIndexWhere(_.startsWith("exec:")) <
      events.indexWhere(_.startsWith("commit:")))
    // priority 0 commits before priority 1; parent last (JobSubDag.java:205-225)
    assert(commits == Seq("commit:errors", "commit:hudi", "commit:parent"))
    // parent executes before children (preprocess contract)
    assert(events.head == "exec:parent")
  }

  test("execute failure aborts the dag with zero commits") {
    val log = new ConcurrentLinkedQueue[String]()
    val dag = SubDag("parent",
      children = Seq(
        SubDag("ok", execute = _ => log.add("exec:ok"), commit = () => log.add("commit:ok")),
        SubDag("bad", execute = _ => throw new RuntimeException("sink down"),
          commit = () => log.add("commit:bad"))))
    intercept[RuntimeException](SubDag.run(dag, payload))
    assert(!log.asScala.exists(_.startsWith("commit:")), s"commits ran: $log")
  }

  test("children execute concurrently (latch deadlocks if serialized)") {
    val latch = new CountDownLatch(2)
    def child(n: String) = SubDag(n, execute = _ => {
      latch.countDown()
      assert(latch.await(10, TimeUnit.SECONDS), "children did not overlap")
    })
    SubDag.run(SubDag("p", children = Seq(child("a"), child("b"))), payload)
  }

  test("routeForChild hands each child its own projection") {
    val seen = new ConcurrentLinkedQueue[Long]()
    val dag = SubDag("p", children = Seq(
      SubDag("evens", execute = df => seen.add(df.count())),
      SubDag("all", execute = df => seen.add(df.count()))))
    SubDag.run(dag, payload, routeForChild = (child, df) =>
      if (child.name == "evens") df.where(col("id") % 2 === 0) else df)
    assert(seen.asScala.toSet == Set(50L, 100L))
  }
}
