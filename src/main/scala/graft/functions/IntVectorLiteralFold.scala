package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** [[VectorLiteralFold]]'s INTEGER twin: squared-L2 distances from an
  * integral vector column to a LITERAL long matrix, every term a long —
  * exact, associative, order-free — so the fold is bit-identical across
  * engines, partitionings and runs. This is the per-row kernel of the
  * fixed-point k-means trainer (graft.llm.Similarity.fitKmeansInt8):
  * float distances would make the trained centroids shuffle-order-
  * dependent and un-gateable, the same reason PageRank (d79) rides
  * scaled longs.
  *
  * Overflow: |x - c| <= 2^b for b-bit inputs against same-scale
  * centroids, so dim * (2^b)^2 must stay under 2^63 — enforced by the
  * caller's input domain (int8 data: dim <= 2^47). Null semantics mirror
  * VectorLiteralFold: length mismatch or any null element poisons every
  * output element; a null array yields null. */
case class IntVectorLiteralFold(child: Expression, mat: Seq[Seq[Long]])
    extends UnaryExpression {
  require(mat.nonEmpty && mat.forall(_.length == mat.head.length),
    "matrix must be non-empty and rectangular")

  @transient private lazy val matArr: Array[Array[Long]] =
    mat.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ByteType | ShortType | IntegerType | LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<byte|short|int|long>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "int_vector_literal_fold"

  private def elemKind: Int =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case ByteType => 0
      case ShortType => 1
      case IntegerType => 2
      case _ => 3
    }

  override protected def nullSafeEval(input: Any): Any =
    IntVectorLiteralFold.fold(input.asInstanceOf[ArrayData], matArr, elemKind)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("foldMat", matArr, "long[][]")
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.IntVectorLiteralFold.fold($in, $matRef, $elemKind);")
  }

  override protected def withNewChildInternal(newChild: Expression): IntVectorLiteralFold =
    copy(child = newChild)
}

object IntVectorLiteralFold {
  def fold(vec: ArrayData, mat: Array[Array[Long]], elemKind: Int)
      : GenericArrayData = {
    val rows = mat.length
    val dim = mat(0).length
    val out = new Array[Any](rows)
    val n = vec.numElements()
    var poisoned = n != dim
    var i = 0
    while (!poisoned && i < n) {
      if (vec.isNullAt(i)) poisoned = true
      i += 1
    }
    if (poisoned) return new GenericArrayData(out) // all nulls
    val x = new Array[Long](dim)
    i = 0
    while (i < dim) {
      x(i) = elemKind match {
        case 0 => vec.getByte(i).toLong
        case 1 => vec.getShort(i).toLong
        case 2 => vec.getInt(i).toLong
        case _ => vec.getLong(i)
      }
      i += 1
    }
    var p = 0
    while (p < rows) {
      val row = mat(p)
      var acc = 0L
      var j = 0
      while (j < dim) { val d = x(j) - row(j); acc += d * d; j += 1 }
      out(p) = acc
      p += 1
    }
    new GenericArrayData(out)
  }
}
