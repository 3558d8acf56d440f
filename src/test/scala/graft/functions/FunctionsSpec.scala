package graft.functions

import graft.SparkTestBase
import graft.functions.Functions._
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import java.sql.Timestamp

class FunctionsSpec extends SparkTestBase {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("mapToString/stringToMap round-trip (ScalaCheck)") {
    val s = spark; import s.implicits._
    val kv = for {
      k <- Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(8))
      v <- Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(8))
    } yield (k, v)
    val gen = Gen.mapOf(kv).suchThat(_.nonEmpty)
    check(Prop.forAll(gen) { m =>
      val df = Seq(m).toDF("m")
      val back = df.select(stringToMap(mapToString(col("m"))).as("m2"))
        .head().getMap[String, String](0)
      back.toMap == m
    })
  }

  test("timestamp millis encode/decode round-trip") {
    val s = spark; import s.implicits._
    val ts = Timestamp.valueOf("2024-06-01 12:34:56.789")
    val df = Seq(Tuple1(ts)).toDF("ts")
    val row = df.select(
      timestampToMillis(col("ts")).as("ms"),
      millisToTimestamp(timestampToMillis(col("ts"))).as("back")).head()
    assert(row.getLong(0) == ts.getTime)
    assert(row.getTimestamp(1) == ts)
  }

  test("millisToMicros pads by 1000 (reference TimeUnitUtil)") {
    val s = spark; import s.implicits._
    assert(Seq(Tuple1(5L)).toDF("ms").select(millisToMicros(col("ms")))
      .head().getLong(0) == 5000L)
  }

  test("decimalSum is exact and partitioning-invariant (unlike double sum)") {
    val s = spark; import s.implicits._
    val vals = (1 to 10000).map(_ => 0.1)
    val a = vals.toDF("v").repartition(1)
      .agg(decimalSum(col("v"), 2)).head().getDouble(0)
    val b = vals.toDF("v").repartition(37)
      .agg(decimalSum(col("v"), 2)).head().getDouble(0)
    assert(a == 1000.0 && b == 1000.0) // plain double sum would drift
  }

  test("csvLine and jsonObject shapes") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "x")).toDF("id", "name")
    assert(df.select(csvLine(Seq(col("id").cast("string"), col("name"))))
      .head().getString(0) == "1,x")
    assert(df.select(jsonObject(col("id"), col("name"))).head().getString(0)
      == """{"id":1,"name":"x"}""")
  }

  test("parseUtcDate and hexify") {
    val s = spark; import s.implicits._
    val r = Seq(Tuple1("2024-03-05")).toDF("d")
      .select(parseUtcDate(col("d"))).head().getDate(0)
    assert(r.toString == "2024-03-05")
    assert(Seq(Tuple1(Array[Byte](0x0f, 0x10))).toDF("b")
      .select(hexify(col("b"))).head().getString(0) == "0F10")
  }
}
