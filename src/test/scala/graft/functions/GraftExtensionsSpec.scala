package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The SparkSessionExtensions surface: every native kernel callable from
  * plain SQL, producing the exact values of its DataFrame-API twin (same
  * Expression underneath — this gates the registration, arity checks, and
  * literal-extraction plumbing, not the kernels themselves). */
class GraftExtensionsSpec extends SparkTestBase {

  test("vector kernels callable from plain SQL") {
    val r = spark.sql(
      """SELECT graft_cosine_similarity(array(3.0D, 4.0D), array(4.0D, 3.0D)) AS c,
        |       graft_dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 24.0 / 25.0) < 1e-15)
    assert(r.getDouble(1) == 11.0)
  }

  test("SQL results are bit-identical to the DataFrame-API twins") {
    import spark.implicits._
    val df = Seq(("doc one common text", 1), ("doc two common text", 2))
      .toDF("text", "id")
    df.createOrReplaceTempView("ext_docs")
    val sql = spark.sql(
      """SELECT id, graft_simhash(transform(split(text, ' '), t -> xxhash64(t))) AS sh,
        |       graft_chargram_md5(text, 4) AS grams,
        |       graft_winnowing_minima(graft_chargram_md5(text, 4), 2) AS fps
        |FROM ext_docs""".stripMargin)
    def bridge(e: org.apache.spark.sql.catalyst.expressions.Expression) =
      org.apache.spark.sql.GraftColumnBridge.column(e)
    def expr(c: org.apache.spark.sql.Column) =
      org.apache.spark.sql.GraftColumnBridge.expression(c)
    val api = df.select(col("id"),
      graft.llm.Dedup.simhashBitsFromHashes(
        transform(split(col("text"), " "), t => xxhash64(t))).as("sh"),
      bridge(CharGramMd5(expr(col("text")), 4)).as("grams"),
      bridge(WinnowingMinima(expr(bridge(CharGramMd5(expr(col("text")), 4))), 2)).as("fps"))
    assert(sql.orderBy("id").collect().toSeq == api.orderBy("id").collect().toSeq)
  }

  test("avro encode/decode round-trips through SQL") {
    val schema =
      """{"type":"record","name":"R","fields":[
        |{"name":"a","type":"long"},{"name":"b","type":"string"}]}""".stripMargin
    val r = spark.sql(
      s"""SELECT graft_avro_decode(
         |  graft_avro_encode(named_struct('a', 7L, 'b', 'hi'), '$schema'),
         |  '$schema') AS rec""".stripMargin).select("rec.a", "rec.b").head()
    assert(r.getLong(0) == 7L && r.getString(1) == "hi")
  }

  test("non-literal static args are rejected with a clear message") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_chargram_md5('abcd', length('xx'))").collect()
    }
    assert(e.getMessage.contains("integer literal"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft_winnowing_minima(array(1L), 2, 3)").collect()
    }
    assert(e2.getMessage.contains("2 arguments"))
  }
}
