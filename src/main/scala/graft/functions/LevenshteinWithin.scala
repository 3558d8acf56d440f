package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Thresholded Levenshtein distance as a native codegen'd expression:
  * returns the distance when <= k, else -1 — the same contract as Spark's
  * `levenshtein(l, r, k)`, but engineered for the edit-dedup verify loop
  * where CANDIDATE PAIRS ARE MOSTLY TRUE near-dups sharing almost all of
  * their text:
  *
  *   - common prefix and suffix strip FIRST (distance-preserving, the
  *     classic reduction): two 300-char docs differing in a trailing
  *     token collapse to a few-char DP instead of a 300x300 table;
  *   - true banded DP over the survivor: O(min(n,m) * (2k+1)) cells with
  *     an early bail when a whole row's band exceeds k — never the full
  *     O(n*m) table (the r9 ScaleBench re-measure of the d58 verify:
  *     287s -> see edit_secs with this expression);
  *   - code-point semantics, matching both Spark's levenshtein and
  *     DuckDB's (oracle compares stay bit-exact).
  *
  * Null if either side is null. */
case class LevenshteinWithin(left: Expression, right: Expression, k: Int)
  extends BinaryExpression {

  private def ok(dt: DataType): Boolean =
    dt == StringType || dt == org.apache.spark.sql.types.NullType

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType) && k >= 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string inputs and k >= 0, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}, k=$k")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "levenshtein_within"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    LevenshteinWithin.within(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.LevenshteinWithin.within($a, $b, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LevenshteinWithin =
    copy(left = newLeft, right = newRight)
}

object LevenshteinWithin {

  /** Distance if <= k else -1. See the expression scaladoc. */
  def within(ua: UTF8String, ub: UTF8String, k: Int): Int = {
    val x = ua.toString.codePoints().toArray
    val y = ub.toString.codePoints().toArray
    var lo = 0
    var xe = x.length
    var ye = y.length
    // length filter before anything else
    if (math.abs(xe - ye) > k) return -1
    while (lo < xe && lo < ye && x(lo) == y(lo)) lo += 1
    while (xe > lo && ye > lo && x(xe - 1) == y(ye - 1)) { xe -= 1; ye -= 1 }
    // keep y the longer side (the DP below indexes j over y)
    var n = xe - lo
    var m = ye - lo
    if (n == 0) return m // |n - m| <= k already established
    if (m == 0) return n
    val swap = n > m
    if (swap) { val t = n; n = m; m = t }
    val xs = if (swap) y else x
    val ys = if (swap) x else y
    val inf = k + 1
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= k) j else inf; j += 1 }
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, inf)
      if (i <= k) cur(0) = i
      val jLo = math.max(1, i - k)
      val jHi = math.min(m, i + k)
      var best = inf
      var jj = jLo
      while (jj <= jHi) {
        val cost = if (xs(lo + i - 1) == ys(lo + jj - 1)) 0 else 1
        var v = prev(jj - 1) + cost
        val del = prev(jj) + 1
        if (del < v) v = del
        val ins = cur(jj - 1) + 1
        if (ins < v) v = ins
        if (v > inf) v = inf
        cur(jj) = v
        if (v < best) best = v
        jj += 1
      }
      if (best >= inf) return -1
      val t = prev; prev = cur; cur = t
      i += 1
    }
    if (prev(m) <= k) prev(m) else -1
  }
}
