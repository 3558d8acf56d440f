package graft.tools

/** Per-OPERATOR time attribution for one declared query — the SQL-tab
  * complement to [[JobProf]] (which attributes to jobs/stages but cannot
  * name the operator inside a broadcast-thread stage): runs the query
  * through the bench's noop sink, then walks the SQL status store's
  * per-execution plan graphs and prints every node whose time-like
  * metrics are large, plus rows/bytes, so the expensive OPERATOR is
  * identifiable headlessly (guide §7.1's SQL tab, reconstructed).
  *
  * Usage: SqlProf <sfDir> <query> [minMs]
  */
object SqlProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val q = args(1)
    val minMs = if (args.length > 2) args(2).toLong else 200L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // keep EVERY execution of the timed run (the bench caps this at 8
      // for heap hygiene; a profiler wants the whole history)
      .config("spark.sql.ui.retainedExecutions", "5000")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.trim.nonEmpty => builder.config(k.trim, v.trim)
        case _ =>
      }
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def reset(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }
    val w = run(); reset()
    println(f"warmup: $w%.2fs")
    val store = org.apache.spark.sql.GraftSqlStatusBridge.statusStore(spark)
    val before = store.executionsList().map(_.executionId).toSet
    val dt = run()
    println(f"timed run: $dt%.2fs")

    // parse the display value of a time metric to ms: formats are
    // "1.2 s", "345 ms", "2.1 m", or "total (min, med, max...)\n1.2 s (...)"
    def toMs(display: String): Long = {
      val head = display.linesIterator.toSeq.lastOption.getOrElse("")
        .split("\\(").head.trim
      val m = "([0-9.,]+)\\s*(ms|s|m|h)?".r.findFirstMatchIn(head)
      m.fold(0L) { g =>
        val v = g.group(1).replace(",", "").toDouble
        g.group(2) match {
          case "s" => (v * 1000).toLong
          case "m" => (v * 60000).toLong
          case "h" => (v * 3600000).toLong
          case _ => v.toLong
        }
      }
    }
    val timeLike = Seq("time", "duration")
    val execs = store.executionsList()
      .filter(e => !before.contains(e.executionId))
    val rows = execs.flatMap { e =>
      val vals = e.metricValues
      if (vals == null) Nil
      else {
        val g = store.planGraph(e.executionId)
        g.allNodes.flatMap { n =>
          val ms = n.metrics.filter(m =>
              timeLike.exists(m.name.toLowerCase.contains))
            .flatMap(m => vals.get(m.accumulatorId).map(toMs)).sum
          if (ms < minMs) Nil
          else {
            val extras = n.metrics
              .filter(m => Seq("number of output rows", "shuffle bytes written",
                "data size").contains(m.name))
              .flatMap(m => vals.get(m.accumulatorId)
                .map(v => s"${m.name}=${v.linesIterator.toSeq.last.trim}"))
            Seq((ms, e.executionId, n.name, extras.mkString(" ")))
          }
        }
      }
    }.sortBy(-_._1)
    val descs = execs.map(e =>
      e.executionId -> e.description.linesIterator.toSeq.headOption
        .getOrElse("").take(60)).toMap
    println(s"== operator time (>= ${minMs}ms summed time metrics), " +
      s"${execs.size} executions ==")
    rows.take(40).foreach { case (ms, eid, name, extra) =>
      println(f"  $ms%7dms  exec=$eid%-4d ${name.take(46)}%-46s $extra  [${descs.getOrElse(eid, "")}]")
    }
    // per-execution wall ranking for context
    println("== executions by wall ==")
    execs.map(e => (e.completionTime.map(_.getTime - e.submissionTime)
        .getOrElse(0L), e.executionId, descs.getOrElse(e.executionId, "")))
      .sortBy(-_._1).take(15)
      .foreach { case (ms, id, d) => println(f"  $ms%7dms  exec=$id%-4d $d") }
    spark.stop()
  }
}
