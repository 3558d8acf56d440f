package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's scale-oriented defaults.
  *
  * Defaults encode the 100TB design point: AQE on (runtime coalescing +
  * skew-join handling replaces the reference's hand-balanced partitioning,
  * cf. reference KafkaSource.getKafkaPartitionOffsetToOutputSparkPartitionMap,
  * common/sources/kafka/KafkaSource.java:319-382), shuffle partitions sized
  * for the local harness (a real cluster would set this to ~2-3x total cores
  * or rely on AQE's initial partition num).
  */
object GraftSession {
  // session-scoped warehouse for bucketed/catalog tables (saveAsTable):
  // one temp dir per JVM so local runs never accrete ./spark-warehouse
  private lazy val warehouseDir: String =
    java.nio.file.Files.createTempDirectory("graft-warehouse").toString

  def builder(appName: String = "graft", master: String = "local[32]",
              shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      // native expressions as SQL functions (graft_cosine_similarity, …) —
      // plain-SQL pipelines get the same codegen'd kernels, no UDF tax
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      // FAIR + a default pool spec so Runner's per-pipeline
      // `spark.scheduler.pool` actually isolates pipelines (under the
      // default FIFO the pool property is silently ignored).
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // TIMESTAMP(NANOS) parquet (e.g. the events table) reads as bigint nanos
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", warehouseDir)
      .config("spark.ui.enabled", "false")

  def local(appName: String = "graft"): SparkSession = {
    val s = builder(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
