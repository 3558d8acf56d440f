package graft
object Explain9 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("d26_pack_sequences", "d27_boilerplate_spans",
                  "d28_regex_tokens", "d29_unigram_familiarity")) {
      println(s"\n===== $q =====")
      val df = SparkEntry.queries(q)(spark, dir)
      println(df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head)
    }
    spark.stop()
  }
}
