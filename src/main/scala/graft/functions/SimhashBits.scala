package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Codegen'd 64-bit SimHash over an array of token hashes, rendered as a
  * 64-char '0'/'1' string (MSB first).
  *
  * Replaces 64 interpreted `aggregate` passes (one per bit, each
  * re-traversing the token-hash array through boxed lambdas) with ONE
  * loop accumulating all 64 bit votes per token — the majority-vote
  * semantics of `Dedup.simhashBitsFromHashes` exactly: bit j votes +1
  * when (h >>> j & 1) == 1 else -1 (a null token hash votes -1 on every
  * bit, matching `when(null).otherwise(-1)` in the fold), output '1'
  * where votes > 0.
  */
case class SimhashBits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "simhash_bits"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Long](64)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        var j = 0
        while (j < 64) { votes(j) -= 1; j += 1 }
      } else {
        val h = arr.getLong(i)
        var j = 0
        while (j < 64) {
          votes(j) += (if (((h >>> j) & 1L) == 1L) 1L else -1L)
          j += 1
        }
      }
      i += 1
    }
    val sb = new java.lang.StringBuilder(64)
    var j = 63
    while (j >= 0) { sb.append(if (votes(j) > 0) '1' else '0'); j -= 1 }
    UTF8String.fromString(sb.toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val h = ctx.freshName("h")
      val votes = ctx.freshName("votes"); val sb = ctx.freshName("sb")
      s"""
         |int $n = $a.numElements();
         |long[] $votes = new long[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) {
         |    for (int $j = 0; $j < 64; $j++) { $votes[$j] -= 1L; }
         |  } else {
         |    long $h = $a.getLong($i);
         |    for (int $j = 0; $j < 64; $j++) {
         |      $votes[$j] += ((($h >>> $j) & 1L) == 1L) ? 1L : -1L;
         |    }
         |  }
         |}
         |java.lang.StringBuilder $sb = new java.lang.StringBuilder(64);
         |for (int $j = 63; $j >= 0; $j--) { $sb.append($votes[$j] > 0 ? '1' : '0'); }
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($sb.toString());
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimhashBits =
    copy(child = newChild)
}

/** Packed-long twin of [[SimhashBits]]: the same md5-token majority vote,
  * but emitted as one 64-bit long (bit 63 = the string form's first
  * character) instead of a 64-char '0'/'1' string. `lpad(bin(x), 64, '0')`
  * of this value equals `SimhashBits` exactly. The detector path shuffles
  * and XORs these — 8 bytes per signature instead of 64+, and Hamming is a
  * single `bit_count(a ^ b)` with no string parsing. */
case class SimhashPacked(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_packed"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Long](64)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        var j = 0
        while (j < 64) { votes(j) -= 1; j += 1 }
      } else {
        val h = arr.getLong(i)
        var j = 0
        while (j < 64) {
          votes(j) += (if (((h >>> j) & 1L) == 1L) 1L else -1L)
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    java.lang.Long.valueOf(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val h = ctx.freshName("h")
      val votes = ctx.freshName("votes"); val sig = ctx.freshName("sig")
      s"""
         |int $n = $a.numElements();
         |long[] $votes = new long[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) {
         |    for (int $j = 0; $j < 64; $j++) { $votes[$j] -= 1L; }
         |  } else {
         |    long $h = $a.getLong($i);
         |    for (int $j = 0; $j < 64; $j++) {
         |      $votes[$j] += ((($h >>> $j) & 1L) == 1L) ? 1L : -1L;
         |    }
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($votes[$j] > 0L) { $sig |= (1L << $j); }
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimhashPacked =
    copy(child = newChild)
}
