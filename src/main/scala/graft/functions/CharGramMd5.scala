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
  private val digestBuf = ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](16))
  private val hexBytes = "0123456789abcdef".getBytes

  /** All k-gram md5 hex hashes of `t` (single gram of the whole string
    * when shorter than k — sequence(1, max(n-k+1, 1)) semantics).
    *
    * Hot path of the winnowing pipeline: instead of materializing a
    * UTF8String + byte[] per gram (substringSQL copies), code-point byte
    * offsets are computed once and each gram digests a slice of the base
    * byte array in place; the hex render writes straight into the output
    * UTF8String's backing array. Identical output to
    * `md5(substringSQL(i, k))` — same code-point slicing, same UTF-8
    * bytes digested (parity-tested against the composable form). */
  def grams(t: UTF8String, k: Int): GenericArrayData = {
    val nChars = t.numChars()
    val n = math.max(nChars - (k - 1), 1)
    val bytes = t.getBytes
    val offs = new Array[Int](nChars + 1)
    var ci = 0; var bi = 0
    while (ci < nChars) {
      offs(ci) = bi
      bi += UTF8String.numBytesForFirstByte(bytes(bi))
      ci += 1
    }
    offs(nChars) = bytes.length
    val d = digest.get()
    val md = digestBuf.get()
    val arr = new Array[Any](n)
    var g = 0
    while (g < n) {
      val start = offs(g)
      val end = offs(math.min(g + k, nChars))
      d.reset()
      d.update(bytes, start, end - start)
      d.digest(md, 0, 16)
      val hex = new Array[Byte](32)
      var i = 0
      while (i < 16) {
        hex(2 * i) = hexBytes((md(i) >> 4) & 0xf)
        hex(2 * i + 1) = hexBytes(md(i) & 0xf)
        i += 1
      }
      arr(g) = UTF8String.fromBytes(hex)
      g += 1
    }
    new GenericArrayData(arr)
  }
}
