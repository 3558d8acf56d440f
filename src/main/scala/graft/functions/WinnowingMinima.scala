package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd winnowing minima (Schleimer/Wilkerson/Aiken, SIGMOD'03): the
  * distinct per-window minimum of each window of `w` consecutive gram
  * hashes, in first-occurrence order.
  *
  * Replaces the interpreted composable form
  * `array_distinct(transform(sequence(1, greatest(n-(w-1),1)),
  *    j -> least(element_at(g, j+0), ..., element_at(g, j+w-1))))`
  * — which evaluates w boxed `element_at` expressions plus a `least`
  * through lambda interpretation PER WINDOW — with one fused loop.
  * Semantics match that form exactly:
  *   - windows run 1..max(n-w+1, 1), so short arrays yield one window;
  *   - `element_at` past the end is null and `least` ignores nulls
  *     (trailing short windows take the min of what exists);
  *   - a window of only nulls (possible only for an empty input array)
  *     contributes null, and array_distinct keeps a single null;
  *   - string comparison is UTF8String binary order — identical to
  *     Spark's `least` on StringType (and to DuckDB's list_min over
  *     ascii md5 hex, the oracle's form).
  */
case class WinnowingMinima(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"window size must be >= 1: $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "winnowing_minima"

  override protected def nullSafeEval(input: Any): Any =
    WinnowingMinima.minima(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WinnowingMinima.minima($a, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowingMinima =
    copy(child = newChild)
}

object WinnowingMinima {
  /** Distinct window minima of `g` (windows of `w`, 1-based semantics as
    * documented on the case class). */
  def minima(g: ArrayData, w: Int): GenericArrayData = {
    val n = g.numElements()
    val numWindows = math.max(n - (w - 1), 1)
    // distinct with first-occurrence order, like array_distinct
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var sawNull = false
    val out = new java.util.ArrayList[Any]()
    var j = 0
    while (j < numWindows) {
      var min: UTF8String = null
      var s = 0
      while (s < w) {
        val idx = j + s
        if (idx < n && !g.isNullAt(idx)) {
          val v = g.getUTF8String(idx)
          if (min == null || v.compareTo(min) < 0) min = v
        }
        s += 1
      }
      if (min == null) {
        if (!sawNull) { sawNull = true; out.add(null) }
      } else if (seen.add(min)) {
        out.add(min)
      }
      j += 1
    }
    new GenericArrayData(out.toArray)
  }
}
