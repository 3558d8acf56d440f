package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built `spark.util.sketch.BloomFilter`,
  * codegen'd — the map-side pre-filter of a Bloom anti-join
  * ([[graft.sinks.Sinks.bloomDedupAgainstExisting]]). The filter rides
  * in a BROADCAST variable (a constructor param, NOT a child — it is
  * not a column): the driver holds one copy, the plan/task closures
  * carry only the broadcast handle (O(1) bytes — a serialized-literal
  * form would embed the full filter in every task at ~1.2 GB for 10^9
  * keys at 1% fpp), and each executor torrent-fetches the bits once.
  * The codegen caches `bloom.value` in a per-operator mutable slot so
  * the per-row cost is a few hash multiplies against the bit array —
  * no shuffle, no join, no per-row broadcast lookup.
  *
  * Hashing matches what `DataFrameStatFunctions.bloomFilter` put in:
  * longs probe `mightContainLong`, strings probe `mightContainBinary`
  * over the UTF-8 bytes (= `putString`'s encoding, straight off the
  * UTF8String with no java.lang.String round-trip). May return a false
  * POSITIVE (callers re-verify positives exactly); never a false
  * negative — the property the definitely-new fast path rests on. */
case class BloomContains(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  @transient private lazy val filter: BloomFilter = bloom.value

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
    val bfClass = classOf[BloomFilter].getName
    val bcRef = ctx.addReferenceObj("bloomBroadcast", bloom,
      classOf[Broadcast[_]].getName)
    // fetch the broadcast value once per operator instance, not per row
    val bf = ctx.addMutableState(bfClass, "graftBloomFilter",
      v => s"$v = ($bfClass) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, c => child.dataType match {
      case StringType => s"${ev.value} = $bf.mightContainBinary($c.getBytes());"
      case _ => s"${ev.value} = $bf.mightContainLong((long) $c);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContains =
    copy(child = newChild)
}
