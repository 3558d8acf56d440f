package graft.functions

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import scala.jdk.CollectionConverters._

/** Codegen'd Avro binary codec over avro-core — the expression form of
  * SchemaBridge's record codec (reference behavioral contract:
  * HDFSSchemaService.java:213-248). The RDD `mapPartitions` form exits
  * Tungsten and boxes every row; these expressions keep the Kafka-payload
  * path — the highest-volume decode lane at 100TB — inside whole-stage
  * codegen, converting Catalyst internal values (UTF8String, micros
  * epochs, ArrayData) straight to Avro generic values.
  *
  * Value encodings are IDENTICAL to SchemaBridge's external-Row codec
  * (parity-tested in SchemaBridgeSpec): timestamps as ms-since-epoch
  * longs (`timestamp=true` prop), dates and decimals as strings,
  * short/byte widened to int, nested record/array/map recursion.
  */
private[graft] final class AvroRowCodec(val schemaJson: String,
                                        val st: StructType) extends Serializable {
  @transient private lazy val schema = new Schema.Parser().parse(schemaJson)
  @transient private lazy val writer = new GenericDatumWriter[GenericRecord](schema)
  @transient private lazy val reader = new GenericDatumReader[GenericRecord](schema)
  // per-thread reusable buffers/coders (an expression instance may be
  // evaluated from several tasks in local mode)
  @transient private lazy val encState =
    ThreadLocal.withInitial[(ByteArrayOutputStream, Array[BinaryEncoder])](
      () => (new ByteArrayOutputStream(), new Array[BinaryEncoder](1)))
  @transient private lazy val decState =
    ThreadLocal.withInitial[Array[BinaryDecoder]](() => new Array[BinaryDecoder](1))

  private def nonNullBranch(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  // ------------------------------------------------- internal -> avro value

  private def toAvro(v: Any, dt: DataType, sch: Schema): Any =
    if (v == null) null
    else (dt, nonNullBranch(sch)) match {
      case (TimestampType, _) =>
        // micros -> ms; floorDiv matches java.sql.Timestamp.getTime for
        // pre-1970 instants (the RDD path's encoding)
        Math.floorDiv(v.asInstanceOf[Long], 1000L)
      case (DateType, _) =>
        java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).toString
      case (_: DecimalType, _) => v.asInstanceOf[Decimal].toString
      case (StringType, _) => v.toString // UTF8String -> String
      case (BinaryType, _) => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case (ShortType, _) => v.asInstanceOf[Short].toInt
      case (ByteType, _) => v.asInstanceOf[Byte].toInt
      case (nested: StructType, s) =>
        rowToRecord(v.asInstanceOf[InternalRow], nested, s)
      case (ArrayType(et, _), s) =>
        val arr = v.asInstanceOf[ArrayData]
        val out = new java.util.ArrayList[Any](arr.numElements())
        var i = 0
        while (i < arr.numElements()) {
          out.add(toAvro(arr.get(i, et), et, s.getElementType)); i += 1
        }
        out
      case (MapType(StringType, vt, _), s) =>
        val m = v.asInstanceOf[MapData]
        val keys = m.keyArray(); val vals = m.valueArray()
        val out = new java.util.HashMap[String, Any](m.numElements())
        var i = 0
        while (i < m.numElements()) {
          out.put(keys.getUTF8String(i).toString,
            toAvro(vals.get(i, vt), vt, s.getValueType))
          i += 1
        }
        out
      case _ => v // boolean/int/long/float/double pass through
    }

  private def rowToRecord(row: InternalRow, rowType: StructType,
                          sch: Schema): GenericRecord = {
    val rec = new GenericData.Record(sch)
    var i = 0
    while (i < rowType.fields.length) {
      val f = rowType.fields(i)
      val v = if (row.isNullAt(i)) null else row.get(i, f.dataType)
      rec.put(f.name, toAvro(v, f.dataType, sch.getField(f.name).schema()))
      i += 1
    }
    rec
  }

  // ------------------------------------------------- avro -> internal value

  private def toInternal(v: Any, dt: DataType): Any =
    if (v == null) null
    else dt match {
      case StringType => UTF8String.fromString(v.toString) // Utf8/String/enum
      case TimestampType => v.asInstanceOf[Long] * 1000L // ms -> micros
      case BinaryType => v match {
        case bb: ByteBuffer =>
          val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr); arr
        case fixed: org.apache.avro.generic.GenericFixed => fixed.bytes().clone()
        case other => other.asInstanceOf[Array[Byte]]
      }
      case nested: StructType => recordToRow(v.asInstanceOf[GenericRecord], nested)
      case ArrayType(et, _) =>
        val in = v.asInstanceOf[java.util.List[Any]]
        val out = new Array[Any](in.size())
        var i = 0
        while (i < in.size()) { out(i) = toInternal(in.get(i), et); i += 1 }
        new GenericArrayData(out)
      case MapType(StringType, vt, _) =>
        val in = v.asInstanceOf[java.util.Map[Any, Any]]
        val keys = new Array[Any](in.size()); val vals = new Array[Any](in.size())
        var i = 0
        val it = in.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          keys(i) = UTF8String.fromString(e.getKey.toString)
          vals(i) = toInternal(e.getValue, vt)
          i += 1
        }
        new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
      case _ => v
    }

  private def recordToRow(rec: GenericRecord, rowType: StructType): InternalRow = {
    val out = new Array[Any](rowType.fields.length)
    var i = 0
    while (i < rowType.fields.length) {
      out(i) = toInternal(rec.get(rowType.fields(i).name), rowType.fields(i).dataType)
      i += 1
    }
    InternalRow.fromSeq(out.toIndexedSeq)
  }

  // ------------------------------------------------------------ entry points

  def encode(row: InternalRow): Array[Byte] = {
    val (out, encHolder) = encState.get()
    out.reset()
    val enc = EncoderFactory.get().binaryEncoder(out, encHolder(0))
    encHolder(0) = enc
    writer.write(rowToRecord(row, st, schema), enc)
    enc.flush()
    out.toByteArray
  }

  def decode(bytes: Array[Byte]): InternalRow = {
    val holder = decState.get()
    val dec = DecoderFactory.get().binaryDecoder(bytes, holder(0))
    holder(0) = dec
    recordToRow(reader.read(null, dec), st)
  }
}

/** `struct -> binary`: one Avro-binary record per row. */
case class AvroEncode(child: Expression, schemaJson: String) extends UnaryExpression {
  @transient private lazy val codec =
    new AvroRowCodec(schemaJson, child.dataType.asInstanceOf[StructType])

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StructType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a struct input, got ${other.simpleString}")
  }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "avro_encode"

  override protected def nullSafeEval(input: Any): Any =
    codec.encode(input.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val codecRef = ctx.addReferenceObj("avroCodec", codec, classOf[AvroRowCodec].getName)
    nullSafeCodeGen(ctx, ev, in => s"${ev.value} = $codecRef.encode($in);")
  }

  override protected def withNewChildInternal(newChild: Expression): AvroEncode =
    copy(child = newChild)
}

/** `binary -> struct`: decode Avro-binary records written with
  * `schemaJson` (the schema-registry consumer path). */
case class AvroDecode(child: Expression, schemaJson: String) extends UnaryExpression {
  @transient private lazy val structType: StructType =
    graft.model.SchemaBridge.avroToStruct(new Schema.Parser().parse(schemaJson))
  @transient private lazy val codec = new AvroRowCodec(schemaJson, structType)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input, got ${other.simpleString}")
  }

  override def dataType: DataType = structType
  override def prettyName: String = "avro_decode"

  override protected def nullSafeEval(input: Any): Any =
    codec.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val codecRef = ctx.addReferenceObj("avroCodec", codec, classOf[AvroRowCodec].getName)
    nullSafeCodeGen(ctx, ev, in => s"${ev.value} = $codecRef.decode($in);")
  }

  override protected def withNewChildInternal(newChild: Expression): AvroDecode =
    copy(child = newChild)
}
