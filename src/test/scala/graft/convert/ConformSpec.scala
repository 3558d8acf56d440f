package graft.convert

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class ConformSpec extends SparkTestBase {

  test("conformTo recurses into structs: widen, add-null, drop, keep null structs null") {
    val srcSchema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("addr", StructType(Seq(
        StructField("zip", IntegerType),
        StructField("legacy", StringType))))))
    val target = StructType(Seq(
      StructField("id", LongType),
      StructField("addr", StructType(Seq(
        StructField("zip", LongType),        // widened
        StructField("country", StringType)   // added as null
        // legacy dropped
      )))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1, Row(94107, "x")),
        Row(2, null))),
      srcSchema)
    val out = Validator.conformTo(df, target)
    assert(out.schema.fieldNames.toSeq == Seq("id", "addr"))
    assert(out.schema("id").dataType == LongType)
    assert(out.schema("addr").dataType.asInstanceOf[StructType].fieldNames.toSeq ==
      Seq("zip", "country"))
    val rows = out.collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getStruct(1).getLong(0) == 94107L)
    assert(rows(1L).getStruct(1).isNullAt(1))
    assert(rows(2L).isNullAt(1), "null struct became non-null")
  }

  test("conformTo recurses into arrays and maps") {
    val srcSchema = StructType(Seq(
      StructField("xs", ArrayType(IntegerType)),
      StructField("m", MapType(StringType, IntegerType))))
    val target = StructType(Seq(
      StructField("xs", ArrayType(LongType)),
      StructField("m", MapType(StringType, LongType))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(Seq(1, 2), Map("a" -> 3)))),
      srcSchema)
    val out = Validator.conformTo(df, target)
    val r = out.head()
    assert(r.getSeq[Long](0) == Seq(1L, 2L))
    assert(r.getMap[String, Long](1) == Map("a" -> 3L))
  }

  test("post-actions: best-effort, failures reported not thrown") {
    import graft.exec.Runner
    val results = Seq(
      Runner.PipelineResult("ok", scala.util.Success(()), 5L),
      Runner.PipelineResult("bad", scala.util.Failure(new RuntimeException("x")), 7L))
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val out = Runner.runPostActions(results, Seq(
      r => seen += s"notify:${r.name}:${r.result.isSuccess}",
      r => if (r.name == "ok") throw new RuntimeException("action broke")))
    assert(seen.toSeq == Seq("notify:ok:true", "notify:bad:false"))
    assert(out.count(_._2.isFailure) == 1)
    assert(out.count(_._2.isSuccess) == 3)
  }
}
