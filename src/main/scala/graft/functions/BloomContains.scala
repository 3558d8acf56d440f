package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built `spark.util.sketch.BloomFilter`,
  * codegen'd — the map-side pre-filter of a Bloom anti-join
  * ([[graft.sinks.Sinks.bloomDedupAgainstExisting]]). The serialized
  * filter rides in the expression (an Array[Byte] constructor param, NOT
  * a child — it is not a column) and deserializes once per executor via
  * the codegen reference array; per row the probe is a few hash
  * multiplies against the bit array, no shuffle, no join.
  *
  * Hashing matches what `DataFrameStatFunctions.bloomFilter` put in:
  * longs probe `mightContainLong`, strings probe `mightContainBinary`
  * over the UTF-8 bytes (= `putString`'s encoding, straight off the
  * UTF8String with no java.lang.String round-trip). May return a false
  * POSITIVE (callers re-verify positives exactly); never a false
  * negative — the property the definitely-new fast path rests on. */
case class BloomContains(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(bloomBytes)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType | StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral or string key, got ${other.simpleString}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case StringType =>
      filter.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)
    case _ =>
      filter.mightContainLong(input.asInstanceOf[Number].longValue())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => child.dataType match {
      case StringType => s"${ev.value} = $bf.mightContainBinary($c.getBytes());"
      case _ => s"${ev.value} = $bf.mightContainLong((long) $c);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContains =
    copy(child = newChild)
}
