package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Occurrence count of the most frequent element of a string array —
  * the per-doc "most common n-gram" kernel of the repetition quality
  * signals ([[graft.llm.TextAnalysis.repetitionReport]]). One fused
  * copy + sort + run-scan per ROW replaces the interpreted
  * array_sort + aggregate-fold chain (a boxed lambda call and a struct
  * accumulator allocation per ELEMENT), and the call participates in
  * whole-stage codegen as a single static invoke. The count is
  * sort-order independent, so any total order works — binary UTF8String
  * order here — and the result is engine-portable by construction.
  *
  * Empty array -> 0. Null elements (never produced by the gram
  * builders, which concat_ws non-null tokens) group as one value. */
case class ModeCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "mode_count"

  override protected def nullSafeEval(input: Any): Any =
    ModeCount.kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ModeCount.kernel($a);")

  override protected def withNewChildInternal(newChild: Expression): ModeCount =
    copy(child = newChild)
}

object ModeCount {
  /** Static kernel shared by eval and generated code. */
  def kernel(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n == 0) return 0L
    var nulls = 0L
    val a = new Array[UTF8String](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) nulls += 1
      else { a(m) = arr.getUTF8String(i); m += 1 }
      i += 1
    }
    java.util.Arrays.sort(a.asInstanceOf[Array[Object]], 0, m)
    var best = nulls
    var run = 0L
    i = 0
    while (i < m) {
      if (i > 0 && a(i).equals(a(i - 1))) run += 1 else run = 1
      if (run > best) best = run
      i += 1
    }
    best
  }
}
