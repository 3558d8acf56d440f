package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd MinHash signature over a shingle array: ONE md5 per shingle,
  * expanded into `numHashes` hash families by Kirsch–Mitzenmacher double
  * hashing (family_i(s) = h1(s) + i*h2(s), with h1/h2 the two unsigned
  * 32-bit halves of the md5 digest), all `numHashes` minima accumulated in
  * a single loop.
  *
  * Replaces the salted-md5 construction (numHashes separate
  * `array_min(transform(sh, s -> md5(salt_i || s)))` passes — 12 digests
  * per shingle, evaluated through interpreted higher-order lambdas) with
  * one digest per shingle and 12 adds/compares: the dominant cost of the
  * LSH dedup tier at any scale. The K-M family is the standard minwise
  * scheme (Kirsch & Mitzenmacher, ESA'06): pairwise-independent families
  * derived from one strong hash preserve the MinHash Jaccard estimator.
  *
  * Engine-portable: h1/h2 are exactly
  * `('0x' || substr(md5(s), 1, 8))::BIGINT` / `substr(.., 9, 8)` in
  * DuckDB (hex-parse of the digest halves), and h1 + i*h2 < 2^36 so the
  * arithmetic is exact in any 64-bit integer engine — no overflow, no
  * modulo, bit-identical signatures everywhere (the property incremental
  * cross-run dedup state depends on).
  *
  * Empty or all-null shingle arrays yield null signature components
  * (`list_min([]) IS NULL` in the oracle mirror); null shingles are
  * skipped.
  */
case class MinhashMinima(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes >= 1, s"numHashes must be >= 1: $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_minima"

  override protected def nullSafeEval(input: Any): Any =
    MinhashMinima.minima(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinhashMinima.minima($a, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): MinhashMinima =
    copy(child = newChild)
}

object MinhashMinima {
  private val digest = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))
  private val digestBuf = ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](16))

  def minima(shingles: ArrayData, numHashes: Int): GenericArrayData = {
    val n = shingles.numElements()
    val d = digest.get()
    val md = digestBuf.get()
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var seen = false
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        seen = true
        val s = shingles.getUTF8String(i)
        d.reset()
        d.update(s.getBytes)
        d.digest(md, 0, 16)
        // unsigned big-endian 32-bit halves — identical to hex-parsing the
        // first/second 8 hex chars of the digest
        val h1 = ((md(0) & 0xffL) << 24) | ((md(1) & 0xffL) << 16) |
          ((md(2) & 0xffL) << 8) | (md(3) & 0xffL)
        val h2 = ((md(4) & 0xffL) << 24) | ((md(5) & 0xffL) << 16) |
          ((md(6) & 0xffL) << 8) | (md(7) & 0xffL)
        var j = 0
        var v = h1
        while (j < numHashes) {
          if (v < mins(j)) mins(j) = v
          v += h2
          j += 1
        }
      }
      i += 1
    }
    if (!seen) new GenericArrayData(new Array[Any](numHashes)) // all-null sig
    else new GenericArrayData(mins)
  }
}
