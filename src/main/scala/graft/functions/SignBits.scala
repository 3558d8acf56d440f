package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd sign-bit packing: bit p of the result is set iff element p of
  * the input array<double> is non-null and >= 0. The second half of the
  * SRP bucket key (the first half is the VectorLiteralFold dot-product
  * array); together they make the whole bucket computation one codegen'd
  * pipeline with no interpreted higher-order folds.
  *
  * Null-element semantics mirror the composable form it replaces
  * (`when(d >= 0, bit).otherwise(0)` inside a zip_with: null compares
  * false -> bit 0). A null input ARRAY yields null — callers wrap in
  * `coalesce(..., 0)` exactly as the HOF form did.
  */
case class SignBits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "sign_bits"

  override protected def nullSafeEval(input: Any): Any =
    SignBits.pack(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.SignBits.pack($in);")

  override protected def withNewChildInternal(newChild: Expression): SignBits =
    copy(child = newChild)
}

object SignBits {
  def pack(arr: ArrayData): Long = {
    val n = arr.numElements()
    require(n <= 63, s"sign_bits input has $n elements; max 63 (long bucket key)")
    var bits = 0L
    var p = 0
    while (p < n) {
      if (!arr.isNullAt(p) && arr.getDouble(p) >= 0.0) bits |= 1L << p
      p += 1
    }
    bits
  }
}
