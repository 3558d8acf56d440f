package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** The shared 64-bit SimHash majority-vote kernel: ONE loop accumulating
  * all 64 bit votes per token hash (vs 64 interpreted `aggregate` passes).
  * Bit j votes +1 when (h >>> j & 1) == 1 else -1; a null token hash votes
  * -1 on every bit (matching `when(null).otherwise(-1)` in the composable
  * fold); bit j of the result is set where votes > 0. Both renderings —
  * [[SimhashBits]] (64-char '0'/'1' string, MSB first) and
  * [[SimhashPacked]] (one long, bit 63 = the string's first char) — MUST
  * come from this kernel: d14's oracle equality rests on
  * `lpad(bin(packed), 64, '0') == string` (unit-asserted in DedupSpec). */
private[functions] object SimhashVotes {

  def checkInput(prettyName: String, dt: DataType): TypeCheckResult = dt match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }

  /** Interpreted path: the packed signature of one token-hash array. */
  def packed(arr: ArrayData): Long = {
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
    sig
  }

  /** Codegen for the vote loop: emits java that leaves the packed long in
    * `sigVar` (declared by this snippet), reading the array from `a`. */
  def genPacked(ctx: CodegenContext, a: String, sigVar: String): String = {
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    val j = ctx.freshName("j"); val h = ctx.freshName("h")
    val votes = ctx.freshName("votes")
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
       |long $sigVar = 0L;
       |for (int $j = 0; $j < 64; $j++) {
       |  if ($votes[$j] > 0L) { $sigVar |= (1L << $j); }
       |}
     """.stripMargin
  }

  /** Render a packed signature as the 64-char MSB-first bit string. */
  def toBitString(sig: Long): UTF8String = {
    val sb = new java.lang.StringBuilder(64)
    var j = 63
    while (j >= 0) { sb.append(if (((sig >>> j) & 1L) == 1L) '1' else '0'); j -= 1 }
    UTF8String.fromString(sb.toString)
  }
}

/** Codegen'd 64-bit SimHash over an array of token hashes, rendered as a
  * 64-char '0'/'1' string (MSB first) — the engine-portable surface (d05,
  * signature state). See [[SimhashVotes]] for the shared kernel. */
case class SimhashBits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    SimhashVotes.checkInput(prettyName, child.dataType)

  override def dataType: DataType = StringType
  override def prettyName: String = "simhash_bits"

  override protected def nullSafeEval(input: Any): Any =
    SimhashVotes.toBitString(SimhashVotes.packed(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sig = ctx.freshName("sig")
      val sb = ctx.freshName("sb")
      val j = ctx.freshName("j")
      s"""
         |${SimhashVotes.genPacked(ctx, a, sig)}
         |java.lang.StringBuilder $sb = new java.lang.StringBuilder(64);
         |for (int $j = 63; $j >= 0; $j--) {
         |  $sb.append(((($sig >>> $j) & 1L) == 1L) ? '1' : '0');
         |}
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($sb.toString());
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimhashBits =
    copy(child = newChild)
}

/** Packed-long twin of [[SimhashBits]]: the same majority vote emitted as
  * one 64-bit long (bit 63 = the string form's first character) —
  * `lpad(bin(x), 64, '0')` equals [[SimhashBits]] exactly. The detector
  * path shuffles and XORs these: 8 bytes per signature instead of 64+,
  * Hamming = one `bit_count(a ^ b)`. See [[SimhashVotes]]. */
case class SimhashPacked(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    SimhashVotes.checkInput(prettyName, child.dataType)

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_packed"

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(SimhashVotes.packed(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sig = ctx.freshName("sig")
      s"""
         |${SimhashVotes.genPacked(ctx, a, sig)}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimhashPacked =
    copy(child = newChild)
}
