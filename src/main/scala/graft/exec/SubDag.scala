package graft.exec

import org.apache.spark.sql.DataFrame
import java.util.concurrent.Executors
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

/** Multi-sink fan-out with two-phase execute/commit — the reference's
  * JobSubDag tree (common/job/JobSubDag.java:39-72 doc, :144-170 execute,
  * :205-225 commit):
  *
  *   - phase 1 EXECUTE: parent preprocess, then every child's heavy work
  *     runs in parallel (Spark jobs overlap under FAIR scheduling); any
  *     failure aborts the dag BEFORE side effects publish;
  *   - phase 2 COMMIT: children commit ordered by priority (lower first),
  *     same-priority commits in parallel, parent's commit last — so
  *     all-or-nothing publication ordering is explicit.
  *
  * The payload router (`routeForChild`) mirrors getDataForChild: the parent
  * may hand each child a different projection/filter of its payload. The
  * payload should be persisted by the caller when children share a scan
  * (same reasoning as Fork: one materialization, N consumers).
  */
final case class SubDag(
    name: String,
    priority: Int = 0,
    execute: DataFrame => Unit = _ => (),
    commit: () => Unit = () => (),
    children: Seq[SubDag] = Nil)

object SubDag {

  /** Run the full tree: execute-all (parallel), then commit in priority
    * order. Throws on the first execute failure — with NO commits run. */
  def run(dag: SubDag, payload: DataFrame,
          routeForChild: (SubDag, DataFrame) => DataFrame = (_, df) => df,
          parallelism: Int = 6, timeout: Duration = Duration.Inf): Unit = {
    val pool = Executors.newFixedThreadPool(parallelism)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      executePhase(dag, payload, routeForChild, timeout)
      commitPhase(dag, timeout)
    } finally {
      pool.shutdown()
    }
  }

  private def executePhase(node: SubDag, payload: DataFrame,
                           route: (SubDag, DataFrame) => DataFrame,
                           timeout: Duration)(implicit ec: ExecutionContext): Unit = {
    // parent preprocesses first (JobSubDag.java:146-152)...
    node.execute(payload)
    // ...then children execute concurrently (JobSubDag.java:154-166)
    val fs = node.children.map { child =>
      Future(executePhase(child, route(child, payload), route, timeout))
    }
    fs.foreach(Await.result(_, timeout))
  }

  private def commitPhase(node: SubDag, timeout: Duration)
                         (implicit ec: ExecutionContext): Unit = {
    // children by ascending priority; ties commit in parallel
    // (JobSubDag.java:205-218), parent's own commit last (:220-225)
    node.children.groupBy(_.priority).toSeq.sortBy(_._1).foreach { case (_, group) =>
      val fs = group.map(c => Future(commitPhase(c, timeout)))
      fs.foreach(Await.result(_, timeout))
    }
    node.commit()
  }
}
