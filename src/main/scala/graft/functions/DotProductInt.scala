package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd INTEGER dot product over two integral-array columns — the
  * scoring primitive of the int8-quantized similarity tier
  * ([[graft.llm.Similarity.bruteForceTopKQuantized]]). The accumulator
  * is a long and every product of two sub-int values fits trivially
  * (127*127*dim ≪ 2^63), so the result is EXACT — no fold-order
  * discipline needed, which is what makes quantized scores bit-exact
  * across engines. The interpreted zip_with/aggregate form costs a boxed
  * lambda call per element; this loop compiles into whole-stage codegen
  * like its float twin [[DotProduct]].
  *
  * Null array or any null element yields null (fold-poison semantics,
  * matching DotProduct).
  */
case class DotProductInt(left: Expression, right: Expression)
  extends BinaryExpression {

  private def supported(dt: DataType): Boolean = dt match {
    case ArrayType(ByteType | ShortType | IntegerType | LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (supported(left.dataType) && supported(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires integral-array inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product_int"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def get(src: ArrayData, i: Int, dt: DataType): Long = dt match {
    case ByteType => src.getByte(i).toLong
    case ShortType => src.getShort(i).toLong
    case IntegerType => src.getInt(i).toLong
    case LongType => src.getLong(i)
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val (lt, rt) = (elemType(left), elemType(right))
    var dot = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += get(x, i, lt) * get(y, i, rt)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val anyNull = ctx.freshName("anyNull")
      def getter(src: String, idx: String, dt: DataType) = dt match {
        case ByteType => s"(long) $src.getByte($idx)"
        case ShortType => s"(long) $src.getShort($idx)"
        case IntegerType => s"(long) $src.getInt($idx)"
        case LongType => s"$src.getLong($idx)"
        case other => throw new IllegalStateException(s"unreachable: $other")
      }
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $dot = 0L;
         |boolean $anyNull = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $anyNull = true; break; }
         |  $dot += ${getter(a, i, elemType(left))} * ${getter(b, i, elemType(right))};
         |}
         |if ($anyNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotProductInt =
    copy(left = newLeft, right = newRight)
}
