package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import java.time.LocalDate

/** Incremental-batch sources. Each source returns a plain DataFrame and a
  * description of what it read, so the caller can checkpoint AFTER sinks
  * succeed (reference contract: work units computed up front, state saved
  * only on success — common/job/JobDag.java:158-186).
  */
object Sources {

  /** One-Hive-partition-per-run incremental Parquet source — semantics of
    * ParquetWorkUnitCalculator.computeWorkUnits
    * (common/sources/hive/ParquetWorkUnitCalculator.java:163-180) +
    * HDFSPartitionManager (common/metadata/HDFSPartitionManager.java:76-113):
    * list first-level `key=value` dirs, skip hidden, sort lexically, pick the
    * first strictly greater than the checkpoint.
    *
    * Listing is driver-side but O(#partitions) names only — no data touched;
    * the read itself is a normal pruned parquet scan.
    */
  final case class PartitionWorkUnit(partition: String, path: String)

  def listPartitions(spark: SparkSession, tableDir: String): Seq[String] = {
    val p = new Path(tableDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration: Configuration)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toIndexedSeq
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith(".") && !s.getPath.getName.startsWith("_"))
      .map(_.getPath.getName).sorted
  }

  def nextPartition(spark: SparkSession, tableDir: String,
                    checkpoint: Option[String]): Option[PartitionWorkUnit] =
    listPartitions(spark, tableDir)
      .find(name => checkpoint.forall(name > _))
      .map(name => PartitionWorkUnit(name, s"$tableDir/$name"))

  /** Date-partitioned variant (`key=YYYY-MM-DD`) with a configurable start
    * date — HDFSDatePartitionManager.getNextPartition
    * (common/metadata/HDFSDatePartitionManager.java:61-98). */
  def nextDatePartition(spark: SparkSession, tableDir: String, partitionKey: String,
                        checkpoint: Option[String], startDate: Option[LocalDate])
      : Option[PartitionWorkUnit] = {
    val floor = startDate.map(d => s"$partitionKey=$d")
    listPartitions(spark, tableDir)
      .filter(_.startsWith(s"$partitionKey="))
      .filter(name => floor.forall(name >= _))
      .find(name => checkpoint.forall(name > _))
      .map(name => PartitionWorkUnit(name, s"$tableDir/$name"))
  }

  def readPartition(spark: SparkSession, wu: PartitionWorkUnit): DataFrame =
    spark.read.parquet(wu.path)

  /** Whole-table parquet read (the non-incremental path). */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** JSON file source with explicit schema and a first-class corrupt-record
    * channel — replaces FileSource + MercifulJsonConverter error records
    * (common/sources/file/FileSource.java:58-77,
    * JSONFileSourceDataConverter.java:64-73). PERMISSIVE mode keeps malformed
    * lines in `_corrupt_record`, which the Validator maps onto the
    * error_message channel; extension filtering via pathGlobFilter mirrors
    * FileWorkUnitCalculator.java:74-80.
    */
  val CorruptCol = "_corrupt_record"

  def json(spark: SparkSession, dir: String, schema: StructType,
           extension: Option[String] = None): DataFrame = {
    val withCorrupt =
      if (schema.fieldNames.contains(CorruptCol)) schema
      else schema.add(CorruptCol, org.apache.spark.sql.types.StringType, nullable = true)
    val r = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
    extension.fold(r)(ext => r.option("pathGlobFilter", s"*.$ext")).json(dir)
  }

  /** CSV file source (header-aware), same channelization. */
  def csv(spark: SparkSession, dir: String, schema: StructType,
          header: Boolean = true): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .csv(dir)

  /** Kafka batch source over an offset window — the reference's Kafka work
    * unit model (KafkaWorkUnitCalculator + KafkaSource) collapses to the
    * built-in DSv2 Kafka batch source: starting/ending offsets are the work
    * unit; `minPartitions` replaces the hand-rolled parallel broker read
    * (KafkaSource.java:164-221); `failOnDataLoss` replaces the
    * earliest>checkpoint loss detection (KafkaWorkUnitCalculator.java:342-362).
    * Compiles against the option surface only (no Kafka broker in the test
    * environment); returned reader is fully configured.
    */
  def kafkaBatch(spark: SparkSession, bootstrap: String, topic: String,
                 startingOffsetsJson: String, endingOffsetsJson: String,
                 minPartitions: Option[Int] = None,
                 failOnDataLoss: Boolean = true): DataFrame = {
    val r = spark.read.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsetsJson)
      .option("endingOffsets", endingOffsetsJson)
      .option("failOnDataLoss", failOnDataLoss.toString)
    minPartitions.fold(r)(n => r.option("minPartitions", n.toString)).load()
  }
}
