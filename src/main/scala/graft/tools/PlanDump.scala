package graft.tools

import java.nio.file.{Files, Paths}

/** Dumps `.explain("formatted")` for named declared queries to files —
  * the round-17 optimization evidence trail (plans/r17/<q>_<suffix>.txt).
  * Session config mirrors graft.Bench.newSession so the captured plan is
  * the plan the bench actually times (AQE on, shuffle partitions = cpus).
  *
  * Usage: PlanDump <sfDir> <outDir> <suffix> <query> [query ...]
  *        (suffix "before"/"after"; query "ALL" dumps every declared one)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, rest @ _*) = args.toSeq.toArray: @unchecked
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val names =
      if (rest.contains("ALL")) graft.SparkEntry.queries.keys.toSeq.sorted
      else rest.toSeq
    for (q <- names) {
      try {
        val df = graft.SparkEntry.queries(q)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"${q}_$suffix.txt"), txt)
        println(s"dumped $q (${txt.linesIterator.size} lines)")
      } catch {
        case e: Throwable => println(s"FAILED $q: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
