package graft.core

import org.apache.spark.sql.{SaveMode, SparkSession}
import java.sql.Timestamp
import java.time.LocalDate

/** Job telemetry tables — the reference's UtilTable/UtilRecord family
  * (common/dataset/UtilTable.java:47-95, ErrorRecord/ExceptionRecord/
  * MetricRecord.java): typed records appended as date-partitioned parquet
  * for retention/inspection. `Dataset[case class]` + partitionBy replaces
  * the Encoders.bean + manual destPath/yyyy-MM-dd plumbing.
  */
object Telemetry {

  final case class MetricRecord(job: String, metric: String, value: Long,
                                tags: String, created_at: Timestamp)
  final case class ErrorRecord(job: String, row_key: String, error: String,
                               created_at: Timestamp)
  final case class ExceptionRecord(job: String, exception: String, stacktrace: String,
                                   is_driver: Boolean, created_at: Timestamp)

  private def write[T <: Product](spark: SparkSession, records: Seq[T], dest: String,
                                  date: LocalDate)
                                 (implicit enc: org.apache.spark.sql.Encoder[T]): Unit =
    spark.createDataset(records)
      .withColumn("date", org.apache.spark.sql.functions.lit(date.toString))
      .write.mode(SaveMode.Append).partitionBy("date").parquet(dest)

  def appendMetrics(spark: SparkSession, records: Seq[MetricRecord], dest: String,
                    date: LocalDate): Unit = {
    import spark.implicits._
    write(spark, records, dest, date)
  }

  def appendErrors(spark: SparkSession, records: Seq[ErrorRecord], dest: String,
                   date: LocalDate): Unit = {
    import spark.implicits._
    write(spark, records, dest, date)
  }

  def appendExceptions(spark: SparkSession, records: Seq[ExceptionRecord], dest: String,
                       date: LocalDate): Unit = {
    import spark.implicits._
    write(spark, records, dest, date)
  }

  /** Driver-loop events (Metrics.recordDriver) as MetricRecords — the
    * channel for counters no action computes, e.g. connected-components
    * round counts. */
  def fromDriverEvents(job: String, events: Seq[Metrics.DriverEvent]): Seq[MetricRecord] =
    events.map(e => MetricRecord(job, s"${e.point}.${e.metric}", e.value, e.tags, e.at))

  /** Snapshot a Metrics.Collector into MetricRecords (long-valued points). */
  def fromCollector(job: String, collector: Metrics.Collector,
                    at: Timestamp): Seq[MetricRecord] =
    collector.all.toSeq.flatMap { case (point, m) =>
      m.toSeq.collect {
        case (k, v: Long) => MetricRecord(job, s"$point.$k", v, "", at)
        case (k, v: Int)  => MetricRecord(job, s"$point.$k", v.toLong, "", at)
      }
    }
}
