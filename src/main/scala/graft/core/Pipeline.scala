package graft.core

import graft.convert.Validator
import graft.operators.Fork
import graft.sinks.Sinks
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The canonical ingestion pipeline spine: source -> transform ->
  * validate -> valid/error split -> sinks -> checkpoint commit
  * (reference JobDag.execute, common/job/JobDag.java:139-211).
  *
  * Checkpoint state advances ONLY if every sink succeeded — the reference's
  * central correctness contract (JobDag.java:166-186).
  */
final case class Pipeline(
    name: String,
    source: SparkSession => DataFrame,
    transform: DataFrame => DataFrame = identity,
    rules: Seq[Validator.Rule] = Nil,
    validSink: DataFrame => Unit,
    errorSink: Option[DataFrame => Unit] = None,
    checkpoint: Option[(RunState, Map[String, String])] = None) {

  final case class RunResult(inputCount: Long, validCount: Long, errorCount: Long)

  def run(spark: SparkSession): RunResult = {
    val df = transform(source(spark))
    if (rules.isEmpty) {
      validSink(df)
      checkpoint.foreach { case (rs, updates) => updates.foreach((rs.set _).tupled); rs.commit() }
      RunResult(-1, -1, 0)
    } else {
      val withErr = Validator.withErrors(df, rules)
      val fork = Fork.validErrorSplit(withErr, Validator.ErrorCol)
      try {
        validSink(fork.stream(0).drop(Validator.ErrorCol))
        errorSink.foreach(s => s(fork.stream(1)))
        checkpoint.foreach { case (rs, updates) => updates.foreach((rs.set _).tupled); rs.commit() }
        RunResult(fork.inputCount, fork.count(0), fork.count(1))
      } finally fork.close()
    }
  }
}
