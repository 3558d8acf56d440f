package graft.model

import graft.SparkTestBase
import org.apache.avro.Schema
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}
import java.sql.Timestamp

class SchemaBridgeSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("score", DoubleType, nullable = false),
    StructField("ts", TimestampType, nullable = true),
    StructField("blob", BinaryType, nullable = true),
    StructField("tags", ArrayType(StringType, containsNull = false), nullable = true),
    StructField("attrs", MapType(StringType, LongType, valueContainsNull = false), nullable = true),
    StructField("addr", StructType(Seq(
      StructField("city", StringType, nullable = true),
      StructField("zip", IntegerType, nullable = false))), nullable = true)))

  test("StructType -> Avro -> StructType round-trips, timestamp prop preserved") {
    val avro = SchemaBridge.structToAvro(schema)
    assert(avro.getType == Schema.Type.RECORD)
    // nullable field is union[null, T]
    assert(avro.getField("name").schema().getType == Schema.Type.UNION)
    // timestamp marker survives (reference SchemaUtil timestamp=true)
    val tsSchema = avro.getField("ts").schema().getTypes.get(1)
    assert(tsSchema.getType == Schema.Type.LONG)
    assert(tsSchema.getProp(SchemaBridge.TimestampProp) == "true")
    assert(SchemaBridge.avroToStruct(avro) == schema)
  }

  test("binary encode/decode round-trips rows incl. nested/array/map/null") {
    val rows = Seq(
      Row(1L, "alice", 0.5, Timestamp.valueOf("2024-01-15 10:30:00.123"),
        Array[Byte](1, 2, 3), Seq("a", "b"), Map("k" -> 9L), Row("sf", 94107)),
      Row(2L, null, -1.25, null, null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val avroJson = SchemaBridge.structToAvro(schema).toString

    val encoded = SchemaBridge.encode(df).cache()
    assert(encoded.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Seq(("value", BinaryType)))
    assert(encoded.count() == 2)

    val back = SchemaBridge.decode(encoded, avroJson)
    assert(back.schema == schema)
    val byId = back.collect().map(r => r.getLong(0) -> r).toMap
    val r1 = byId(1L)
    assert(r1.getString(1) == "alice")
    assert(r1.getTimestamp(3) == Timestamp.valueOf("2024-01-15 10:30:00.123"))
    assert(r1.getAs[Array[Byte]](4).toSeq == Seq[Byte](1, 2, 3))
    assert(r1.getSeq[String](5) == Seq("a", "b"))
    assert(r1.getMap[String, Long](6) == Map("k" -> 9L))
    assert(r1.getStruct(7).getString(0) == "sf" && r1.getStruct(7).getInt(1) == 94107)
    val r2 = byId(2L)
    assert(r2.isNullAt(1) && r2.isNullAt(3) && r2.isNullAt(4) && r2.isNullAt(7))
    encoded.unpersist()
  }

  test("expression codec is byte- and row-identical to the RDD codec") {
    val rows = Seq(
      Row(1L, "alice", 0.5, Timestamp.valueOf("2024-01-15 10:30:00.123"),
        Array[Byte](1, 2, 3), Seq("a", "b"), Map("k" -> 9L), Row("sf", 94107)),
      Row(2L, null, -1.25, null, null, null, null, null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val avroJson = SchemaBridge.structToAvro(schema).toString
    // byte parity: same Avro binary from both encoders
    val exprBytes = SchemaBridge.encode(df).collect()
      .map(_.getAs[Array[Byte]](0).toSeq).toSet
    val rddBytes = SchemaBridge.encodeViaRdd(df).collect()
      .map(_.getAs[Array[Byte]](0).toSeq).toSet
    assert(exprBytes == rddBytes)
    // row parity: each decoder inverts the other's encoder (blob hexed —
    // Array[Byte] equality inside Row is referential)
    def render(d: org.apache.spark.sql.DataFrame) = d
      .withColumn("blob", org.apache.spark.sql.functions.hex(
        org.apache.spark.sql.functions.col("blob")))
      .collect().map(_.toString).sorted.toSeq
    val viaExpr = SchemaBridge.decode(SchemaBridge.encodeViaRdd(df), avroJson)
    val viaRdd = SchemaBridge.decodeViaRdd(SchemaBridge.encode(df), avroJson)
    assert(viaExpr.schema == viaRdd.schema)
    assert(render(viaExpr) == render(viaRdd))
    // date + decimal stringification parity (LocalDate vs sql.Date
    // rendering; Decimal vs java BigDecimal scale preservation)
    val ddSchema = StructType(Seq(
      StructField("d", DateType, nullable = true),
      StructField("m", DecimalType(10, 2), nullable = true)))
    val ddRows = Seq(
      Row(java.sql.Date.valueOf("2024-02-29"), new java.math.BigDecimal("1234.50")),
      Row(java.sql.Date.valueOf("0987-01-02"), new java.math.BigDecimal("-0.01")),
      Row(null, null))
    val dd = spark.createDataFrame(spark.sparkContext.parallelize(ddRows), ddSchema)
    val exprB = SchemaBridge.encode(dd).collect().map(_.getAs[Array[Byte]](0).toSeq).toSet
    val rddB = SchemaBridge.encodeViaRdd(dd).collect().map(_.getAs[Array[Byte]](0).toSeq).toSet
    assert(exprB == rddB, "date/decimal bytes diverge between codec paths")
  }

  test("date and decimal serialize as portable strings") {
    val st = StructType(Seq(
      StructField("d", DateType, nullable = false),
      StructField("m", DecimalType(10, 2), nullable = false)))
    val avro = SchemaBridge.structToAvro(st)
    assert(avro.getField("d").schema().getType == Schema.Type.STRING)
    assert(avro.getField("m").schema().getType == Schema.Type.STRING)
  }

  test("DirSchemaRegistry: versioned .avsc files, latest wins") {
    val dir = tmpDir("schemas")
    def record(v: Int) = {
      val fields = Seq(
        """{"name":"id","type":"long"}""") ++
        (if (v > 1) Seq("""{"name":"email","type":["null","string"],"default":null}""") else Nil)
      s"""{"type":"record","name":"person","fields":[${fields.mkString(",")}]}"""
    }
    Files.write(Paths.get(dir, "person.1.avsc"), record(1).getBytes)
    Files.write(Paths.get(dir, "person.2.avsc"), record(2).getBytes)
    Files.write(Paths.get(dir, "other.1.avsc"), record(1).getBytes)
    val reg = new DirSchemaRegistry(dir)
    assert(reg.listVersions("person") == Seq(1, 2))
    assert(reg.getSchema("person").getFields.size() == 2)
    assert(reg.getSchema("person", 1).getFields.size() == 1)
    intercept[IllegalArgumentException](reg.getSchema("missing"))
    intercept[IllegalArgumentException](reg.getSchema("person", 9))
  }

  test("decode of registry-versioned payloads (schema-service Kafka shape)") {
    // writer uses v1 (id only); a consumer resolving via the registry decodes
    val st = StructType(Seq(StructField("id", LongType, nullable = false)))
    val s = spark
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(7L), Row(8L))), st)
    val avroJson = SchemaBridge.structToAvro(st).toString
    val decoded = SchemaBridge.decode(SchemaBridge.encode(df), avroJson)
    assert(decoded.collect().map(_.getLong(0)).sorted.toSeq == Seq(7L, 8L))
  }
}
