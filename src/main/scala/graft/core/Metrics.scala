package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** Metrics layer — replaces the reference's accumulator/metric plumbing
  * (ForkFunction counts, KafkaSource bytes-read LongAccumulator
  * sum/count/max at KafkaSource.java:128-148, DataFeedMetrics) with
  * Spark-native observed metrics: `df.observe` computes named aggregates
  * DURING the action that materializes the plan (no extra job, no second
  * scan — the property the reference built accumulators for), and a
  * QueryExecutionListener collects them on the driver.
  */
object Metrics {

  /** Attach named aggregate observations to a DataFrame; values arrive at
    * the collector when an action on this plan completes. */
  def observed(df: DataFrame, pointName: String, aggs: (String, Column)*): DataFrame = {
    require(aggs.nonEmpty, "at least one observed aggregate required")
    val named = aggs.map { case (n, c) => c.as(n) }
    df.observe(pointName, named.head, named.tail: _*)
  }

  /** Driver-side collector of observed metrics (register once per session).
    * Thread-safe; last write per (point, metric) wins, like the
    * reference's metric registry. */
  final class Collector extends QueryExecutionListener {
    private val metrics = TrieMap.empty[String, Map[String, Any]]
    private val durations = TrieMap.empty[String, Long]

    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
      qe.observedMetrics.foreach { case (point, row: Row) =>
        val m = row.schema.fieldNames.zipWithIndex
          .map { case (n, i) => n -> row.get(i) }.toMap
        metrics.put(point, m)
        durations.put(point, durationNs)
      }
    }
    override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()

    def get(pointName: String): Option[Map[String, Any]] = metrics.get(pointName)
    def getLong(pointName: String, metric: String): Option[Long] =
      get(pointName).flatMap(_.get(metric)).map {
        case l: Long => l
        case i: Int  => i.toLong
        case other   => other.toString.toLong
      }
    def durationNs(pointName: String): Option[Long] = durations.get(pointName)
    def all: Map[String, Map[String, Any]] = metrics.toMap
    def clear(): Unit = { metrics.clear(); durations.clear() }
  }

  /** Register a collector on the session (idempotent per collector). */
  def register(spark: SparkSession): Collector = {
    val c = new Collector
    spark.listenerManager.register(c)
    c
  }

  /** Driver-side metric event — for values the observe() path cannot
    * capture: counters produced by iterative DRIVER loops (e.g.
    * connected-components round counts), which exist only after the loop
    * ends, not during any single action's execution. `scope` identifies
    * the logical run that recorded the event (see [[withScope]]); empty
    * when recorded outside any scope. */
  final case class DriverEvent(point: String, metric: String, value: Long,
                               tags: String, at: java.sql.Timestamp,
                               scope: String = "")

  private val driverQueue =
    new java.util.concurrent.ConcurrentLinkedQueue[DriverEvent]()

  // Dynamic scope for driver events: a plain ThreadLocal, NOT inheritable
  // — pooled executor threads (Runner) predate the scope, so propagation
  // is explicit (Runner captures the caller's scope and re-establishes it
  // inside each pipeline task).
  private val scopeLocal = new ThreadLocal[String] { override def initialValue(): String = "" }

  /** The current thread's driver-event scope ("" when unscoped). */
  def currentScope: String = scopeLocal.get()

  /** Run `f` with the current thread's driver-event scope set to `scope`;
    * every [[recordDriver]] on this thread inside `f` is stamped with it,
    * and [[drainDriverEvents(scope*]] recovers exactly those events even
    * when other pipelines record concurrently. Restores the previous
    * scope on exit (scopes nest). Code that hands work to OTHER threads
    * must re-establish the scope there ([[Runner.runAll]] does). */
  def withScope[T](scope: String)(f: => T): T = {
    val prev = scopeLocal.get()
    scopeLocal.set(scope)
    try f finally scopeLocal.set(prev)
  }

  /** Record a driver-loop metric, stamped with the current thread's
    * scope. Appends per call — concurrent pipelines interleave without
    * clobbering each other (the failure mode of a shared mutable field). */
  def recordDriver(point: String, metric: String, value: Long,
                   tags: String = ""): Unit =
    driverQueue.add(DriverEvent(point, metric, value, tags,
      new java.sql.Timestamp(System.currentTimeMillis()), scopeLocal.get()))

  /** Remove and return all driver events recorded so far, in record
    * order — the whole-process telemetry drain. The drain-bracket
    * pattern (drain-discard before, drain-append after) is only exact
    * when NO other thread records during the window; concurrent
    * pipelines must use [[withScope]] + [[drainDriverEvents(scope*]],
    * which cannot steal or misattribute across runs. */
  def drainDriverEvents(): Seq[DriverEvent] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[DriverEvent]
    var e = driverQueue.poll()
    while (e != null) { buf += e; e = driverQueue.poll() }
    buf.toSeq
  }

  /** Remove and return only the driver events recorded under `scope`,
    * in record order; events from other scopes stay queued for their
    * own drains. Safe under concurrent recording: the iterator is
    * weakly consistent, and events for this scope are produced by the
    * draining caller's own (completed) run, so none can be missed. */
  def drainDriverEvents(scope: String): Seq[DriverEvent] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[DriverEvent]
    val it = driverQueue.iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.scope == scope) { it.remove(); buf += e }
    }
    buf.toSeq
  }
}
