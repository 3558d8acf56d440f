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
    val i = spark.sql(
      """SELECT graft_dot_product_int(array(CAST(127 AS TINYINT), CAST(-2 AS TINYINT)),
        |                             array(CAST(3 AS TINYINT), CAST(4 AS TINYINT))) AS di""".stripMargin)
      .head()
    assert(i.getLong(0) == 381L - 8L)
    val lv = spark.sql(
      """SELECT graft_levenshtein_within('kitten', 'sitting', 3) AS d3,
        |       graft_levenshtein_within('kitten', 'sitting', 2) AS d2,
        |       graft_levenshtein_within(NULL, 'x', 2) AS dn""".stripMargin)
      .head()
    assert(lv.getInt(0) == 3 && lv.getInt(1) == -1 && lv.isNullAt(2), lv)
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

  test("graft_minhash_minima is bit-identical to Dedup.minhashSignature") {
    import spark.implicits._
    val df = Seq(("the quick brown fox jumps over the lazy dog", 1),
        ("a different document entirely with other words here", 2),
        ("", 3)) // empty text -> all-null signature on both surfaces
      .toDF("text", "id")
    df.createOrReplaceTempView("mh_docs")
    // same staging on both sides: tokens -> shingles -> signature
    val sql = spark.sql(
      """SELECT id, graft_minhash_minima(sh, 12) AS sig FROM (
        |  SELECT id, CASE WHEN size(toks) < 3 THEN array(array_join(toks, ' '))
        |    ELSE transform(sequence(0, size(toks) - 3),
        |      i -> array_join(slice(toks, i + 1, 3), ' ')) END AS sh FROM (
        |    SELECT id, filter(split(lower(text), ' '), x -> x != '') AS toks
        |    FROM mh_docs))""".stripMargin)
    val api = df
      .select(col("id"), graft.llm.TextAnalysis.tokens(lower(col("text"))).as("toks"))
      .select(col("id"), graft.llm.Dedup.shinglesFromTokens(col("toks"), 3).as("sh"))
      .select(col("id"), graft.llm.Dedup.minhashSignature(col("sh"), 12).as("sig"))
    assert(sql.orderBy("id").collect().toSeq == api.orderBy("id").collect().toSeq)
  }

  test("graft_srp_bucket is bit-identical to Similarity.srpBucket") {
    import spark.implicits._
    val df = Seq((1L, Array(0.5f, -1.0f, 2.0f, 0.25f)),
        (2L, Array(-0.5f, 1.0f, -2.0f, -0.25f)),
        (3L, Array(0.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("id", "vec")
    df.createOrReplaceTempView("srp_vecs")
    val sql = spark.sql(
      "SELECT id, graft_srp_bucket(vec, 4, 6) AS bucket FROM srp_vecs")
    val api = df.select(col("id"),
      graft.llm.Similarity.srpBucket(col("vec"), 4, 6).as("bucket"))
    assert(sql.orderBy("id").collect().toSeq == api.orderBy("id").collect().toSeq)
    // buckets vary across these vectors (degenerate-weights tripwire)
    assert(sql.select("bucket").distinct().count() > 1)
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
