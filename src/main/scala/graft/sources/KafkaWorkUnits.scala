package graft.sources

import graft.core.RunState

/** Kafka incremental-batch offset policy — the pure-logic core of the
  * reference's KafkaWorkUnitCalculator
  * (common/sources/kafka/KafkaWorkUnitCalculator.java:159-255 compute +
  * water-fill, :318-362 loss detection/reset, KafkaBootstrapOffsetSelector
  * .java:33-46 bootstrap). Broker I/O stays outside (the caller fetches
  * earliest/latest offsets via the Kafka admin/consumer API or lets the
  * Spark Kafka source do it); everything here is deterministic and
  * unit-testable without a broker.
  *
  * Lifecycle per run (mirrors JobDag.execute, common/job/JobDag.java:158-186):
  *   1. `loadOffsets(runState, topic)` — checkpointed offsets, or empty on
  *      the first run;
  *   2. `computeWorkUnits(...)` — diff vs broker earliest/latest, detect
  *      loss, budget `maxMessages` across partitions;
  *   3. read the batch with `Sources.kafkaBatch(startingOffsetsJson,
  *      endingOffsetsJson)`;
  *   4. after ALL sinks succeed: `stageOffsets(runState, topic, nextState)`
  *      then `runState.commit()` — never before.
  */
object KafkaWorkUnits {

  final case class OffsetRange(partition: Int, fromOffset: Long, untilOffset: Long) {
    require(untilOffset >= fromOffset, s"inverted range $fromOffset..$untilOffset")
    def count: Long = untilOffset - fromOffset
  }

  /** @param workUnits    ranges to read this run (empty on bootstrap)
    * @param nextState    per-partition offsets to checkpoint AFTER success
    * @param lostMessages messages expired past the checkpoint (0 unless a
    *                     reset policy recovered from data loss)
    */
  final case class Result(workUnits: Seq[OffsetRange], nextState: Map[Int, Long],
                          lostMessages: Long) {
    def totalMessages: Long = workUnits.map(_.count).sum
  }

  /** Data-loss handling when broker earliest has passed the checkpoint
    * (retention expired messages we never read). */
  sealed trait LossPolicy
  /** Abort the run (reference default when no resetter is configured). */
  case object FailOnLoss extends LossPolicy
  /** Resume from broker earliest, reporting the lost count
    * (KafkaOffsetResetter semantics). */
  case object ResetToEarliest extends LossPolicy

  final case class DataLossException(partition: Int, checkpoint: Long, earliest: Long)
    extends RuntimeException(
      s"DATA_LOSS:MISSED_KAFKA_MESSAGES:partition:$partition:" +
        s"startOffset:$checkpoint:endOffset:$earliest")

  /** First-run bootstrap: start from latest — i.e. checkpoint latest now,
    * read nothing this run (KafkaBootstrapOffsetSelector.java:33-46). */
  def bootstrapFromLatest(latest: Map[Int, Long]): Result =
    Result(Nil, latest, 0L)

  /** Compute this run's offset ranges and the next checkpoint state.
    *
    * Differences from the reference, deliberate:
    *   - partitions whose budget share rounds to zero keep their checkpoint
    *     in nextState (the reference drops them from the next-run map,
    *     which re-bootstraps them as "new" partitions on the next run);
    *   - lost messages are counted as max(0, earliest - checkpoint) summed
    *     over affected partitions.
    */
  def computeWorkUnits(checkpoint: Map[Int, Long], earliest: Map[Int, Long],
                       latest: Map[Int, Long], maxMessages: Long,
                       lossPolicy: LossPolicy = FailOnLoss): Result = {
    require(maxMessages > 0, s"maxMessages must be positive: $maxMessages")
    if (checkpoint.isEmpty) return bootstrapFromLatest(latest)

    // New partitions start from earliest; expired checkpoints are data loss.
    var lost = 0L
    val starts = scala.collection.mutable.Map.empty[Int, Long]
    checkpoint.foreach { case (p, off) => starts(p) = off }
    earliest.foreach { case (p, eo) =>
      checkpoint.get(p) match {
        case None => starts(p) = eo // newly discovered partition
        case Some(cp) if eo > cp =>
          lossPolicy match {
            case FailOnLoss      => throw DataLossException(p, cp, eo)
            case ResetToEarliest => lost += eo - cp; starts(p) = eo
          }
        case _ =>
      }
    }

    // Messages available per partition (skip gone/empty partitions).
    val avail = latest.toSeq.flatMap { case (p, lo) =>
      starts.get(p).map(s => p -> math.max(0L, lo - s)).filter(_._2 > 0)
    }
    if (avail.isEmpty) return Result(Nil, starts.toMap, lost)

    // Water-fill the budget smallest-partition-first
    // (KafkaWorkUnitCalculator.java:224-255): partitions under the average
    // take everything they have; the freed budget rolls to bigger ones.
    val totalNew = avail.map(_._2).sum
    val hasExtra = totalNew > maxMessages
    var pendingMessages = math.min(totalNew, maxMessages)
    var pendingPartitions = avail.size
    val ranges = Seq.newBuilder[OffsetRange]
    // sort by (messages, partition) so equal counts break ties stably
    avail.sortBy { case (p, m) => (m, p) }.foreach { case (p, m) =>
      val selected =
        if (!hasExtra) m
        else {
          val share = math.min(pendingMessages / pendingPartitions, m)
          pendingMessages -= share
          pendingPartitions -= 1
          share
        }
      if (selected > 0) ranges += OffsetRange(p, starts(p), starts(p) + selected)
    }
    val units = ranges.result().sortBy(_.partition)
    val nextState = starts.toMap ++ units.map(u => u.partition -> u.untilOffset)
    Result(units, nextState, lost)
  }

  // ------------------------------------------------------------- RunState

  private def key(topic: String, partition: Int) = s"kafka:$topic:$partition"
  private val KeyRe = "kafka:(.+):(\\d+)".r

  /** Checkpointed offsets for `topic` (empty map on first run). */
  def loadOffsets(rs: RunState, topic: String): Map[Int, Long] =
    rs.all.collect {
      case (KeyRe(t, p), v) if t == topic => p.toInt -> v.toLong
    }

  /** Stage next-run offsets; caller commits AFTER sink success
    * (save-only-on-success, JobDag.java:166-186). */
  def stageOffsets(rs: RunState, topic: String, offsets: Map[Int, Long]): Unit =
    offsets.foreach { case (p, off) => rs.set(key(topic, p), off.toString) }

  /** One full incremental batch run — the JobDag.execute loop for Kafka
    * (load checkpoint -> compute units -> read -> sink -> stage -> commit,
    * JobDag.java:158-186). `earliest`/`latest` come from the caller's
    * broker query (Kafka admin API); when the run has no work (bootstrap
    * or fully caught up) the sink is skipped but the state still commits.
    */
  def runBatch(spark: org.apache.spark.sql.SparkSession, rs: RunState,
               bootstrap: String, topic: String,
               earliest: Map[Int, Long], latest: Map[Int, Long],
               maxMessages: Long, lossPolicy: LossPolicy = FailOnLoss,
               minPartitions: Option[Int] = None)
              (sink: org.apache.spark.sql.DataFrame => Unit): Result = {
    val result = computeWorkUnits(loadOffsets(rs, topic), earliest, latest,
      maxMessages, lossPolicy)
    if (result.workUnits.nonEmpty) {
      val df = Sources.kafkaBatch(spark, bootstrap, topic,
        startingOffsetsJson(topic, result.workUnits),
        endingOffsetsJson(topic, result.workUnits),
        minPartitions)
      sink(df)
    }
    // state advances ONLY here — after the sink returned without throwing
    stageOffsets(rs, topic, result.nextState)
    rs.commit()
    result
  }

  // ----------------------------------------------------- Spark source glue

  /** Starting-offsets JSON for the Spark Kafka batch source
    * (`Sources.kafkaBatch`). */
  def startingOffsetsJson(topic: String, units: Seq[OffsetRange]): String =
    offsetsJson(topic, units.map(u => u.partition -> u.fromOffset))

  /** Ending-offsets JSON (exclusive until-offsets). */
  def endingOffsetsJson(topic: String, units: Seq[OffsetRange]): String =
    offsetsJson(topic, units.map(u => u.partition -> u.untilOffset))

  private def offsetsJson(topic: String, offs: Seq[(Int, Long)]): String = {
    val parts = offs.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }.mkString(",")
    s"""{"$topic":{$parts}}"""
  }
}
