package graft.core

import graft.SparkTestBase
import graft.convert.Validator
import org.apache.spark.sql.functions._

/** Pipeline spine semantics, mirroring TestJobDag
  * (marmaray/src/test/java/.../job/TestJobDag.java:85-127): the checkpoint
  * advances ONLY when every sink succeeded.
  */
class PipelineSpec extends SparkTestBase {

  private def sourceDf = {
    val s = spark; import s.implicits._
    (1 to 50).map(i => (i.toLong, if (i % 5 == 0) null else s"u$i")).toDF("id", "user")
  }

  test("checkpoint does not advance when the sink fails") {
    val stateDir = tmpDir("pipe-state")
    val rs = new RunState(stateDir)
    rs.set("watermark", "10"); rs.commit()
    val p = Pipeline(
      name = "failing",
      source = _ => sourceDf,
      rules = Validator.requiredKeys(Seq("user")),
      validSink = _ => throw new RuntimeException("sink down"),
      checkpoint = Some((rs, Map("watermark" -> "20"))))
    intercept[RuntimeException](p.run(spark))
    assert(new RunState(stateDir).get("watermark").contains("10"),
      "checkpoint advanced despite sink failure")
  }

  test("success path: valid/error routed, counted, checkpoint advanced") {
    val stateDir = tmpDir("pipe-state")
    val validOut = tmpDir("pipe-valid")
    val errorOut = tmpDir("pipe-error")
    val rs = new RunState(stateDir)
    val p = Pipeline(
      name = "ok",
      source = _ => sourceDf,
      rules = Validator.requiredKeys(Seq("user")),
      validSink = df => df.write.mode("overwrite").parquet(validOut),
      errorSink = Some(df => df.write.mode("overwrite").parquet(errorOut)),
      checkpoint = Some((rs, Map("watermark" -> "20"))))
    val res = p.run(spark)
    assert(res.inputCount == 50)
    assert(res.validCount == 40)
    assert(res.errorCount == 10)
    assert(spark.read.parquet(validOut).count() == 40)
    val errs = spark.read.parquet(errorOut)
    assert(errs.count() == 10)
    assert(errs.filter(col(Validator.ErrorCol) =!= "missing_required_field:user").count() == 0)
    // valid stream must not carry the error column
    assert(!spark.read.parquet(validOut).columns.contains(Validator.ErrorCol))
    assert(new RunState(stateDir).get("watermark").contains("20"))
  }

  test("no-rules pipeline writes straight through and checkpoints") {
    val stateDir = tmpDir("pipe-state")
    val out = tmpDir("pipe-out")
    val rs = new RunState(stateDir)
    val p = Pipeline(
      name = "plain",
      source = _ => sourceDf,
      transform = _.filter(col("id") <= 10),
      validSink = df => df.write.mode("overwrite").parquet(out),
      checkpoint = Some((rs, Map("done" -> "yes"))))
    p.run(spark)
    assert(spark.read.parquet(out).count() == 10)
    assert(new RunState(stateDir).get("done").contains("yes"))
  }
}
