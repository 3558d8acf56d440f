package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd character k-gram md5 hashes: one loop emitting
  * md5(substr(text, i, k)) for every gram position — the rolling-hash
  * producer of the winnowing fingerprint pipeline, without the
  * interpreted `transform` lambda's per-element expression evaluation.
  *
  * Exactly matches the composable form
  * `transform(sequence(1, n-k+1), i -> md5(text.substr(i, k)))`:
  * `substringSQL` is the same code-point-based substring `Column.substr`
  * lowers to, and the digest runs over the gram's UTF-8 bytes like
  * Spark's `md5` (so DuckDB oracle parity is preserved).
  */
case class CharGramMd5(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"gram size must be >= 1: $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_gram_md5"

  override protected def nullSafeEval(input: Any): Any =
    CharGramMd5.grams(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.CharGramMd5.grams($t, $k);")

  override protected def withNewChildInternal(newChild: Expression): CharGramMd5 =
    copy(child = newChild)
}

object CharGramMd5 {
  private val digest = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))
  private val hexChars = "0123456789abcdef".toCharArray

  private def md5Hex(s: UTF8String): UTF8String = {
    val d = digest.get()
    d.reset()
    val bytes = d.digest(s.getBytes)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(bytes(i) & 0xf)
      i += 1
    }
    UTF8String.fromString(new String(out))
  }

  /** All k-gram md5 hex hashes of `t` (single gram of the whole string
    * when shorter than k — sequence(1, max(n-k+1, 1)) semantics). */
  def grams(t: UTF8String, k: Int): GenericArrayData = {
    val n = math.max(t.numChars() - (k - 1), 1)
    val arr = new Array[Any](n)
    var i = 0
    while (i < n) {
      arr(i) = md5Hex(t.substringSQL(i + 1, k))
      i += 1
    }
    new GenericArrayData(arr)
  }
}
