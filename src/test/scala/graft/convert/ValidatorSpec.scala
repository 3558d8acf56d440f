package graft.convert

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class ValidatorSpec extends SparkTestBase {

  private def df = {
    val s = spark; import s.implicits._
    Seq(
      (1L, Some("a"), 10),
      (2L, None, 10),
      (3L, Some("c"), -1),
      (4L, None, -1) // fails both rules; first must win
    ).toDF("id", "name", "qty")
  }

  test("first failing rule wins, stable order; null means valid") {
    val rules = Seq(
      Validator.Rule("missing_name", col("name").isNull),
      Validator.Rule("neg_qty", col("qty") < 0))
    val out = Validator.withErrors(df, rules).cache()
    def err(id: Long) =
      out.where(col("id") === id).select(Validator.ErrorCol).head().getString(0)
    assert(err(1) == null)
    assert(err(2) == "missing_name")
    assert(err(3) == "neg_qty")
    assert(err(4) == "missing_name")
    assert(Validator.valid(out).count() == 1)
    assert(Validator.errors(out).count() == 3)
    out.unpersist()
  }

  test("requiredKeys builds missing_required_field rules") {
    val rules = Validator.requiredKeys(Seq("name"))
    val out = Validator.withErrors(df, rules)
    assert(out.where(col(Validator.ErrorCol) === "missing_required_field:name").count() == 2)
  }

  test("dropInternalFields removes underscore-prefixed columns") {
    val withMeta = df.withColumn("_corrupt_record", lit(null).cast(StringType))
      .withColumn("_hoodie_commit", lit("c1"))
    assert(Validator.dropInternalFields(withMeta).columns.toSeq == Seq("id", "name", "qty"))
  }

  test("conformTo: widening cast, missing column becomes null, unknown dropped") {
    val target = StructType(Seq(
      StructField("id", LongType),
      StructField("qty", DoubleType),  // int -> double widening
      StructField("added", StringType) // absent in source -> null
    ))
    val out = Validator.conformTo(df, target)
    assert(out.schema.fields.map(f => f.name -> f.dataType).toSeq == Seq(
      "id" -> LongType, "qty" -> DoubleType, "added" -> StringType))
    assert(out.where(col("added").isNull).count() == 4)
    assert(out.where(col("qty") === -1.0d).count() == 2)
    assert(!out.columns.contains("name"))
  }
}
