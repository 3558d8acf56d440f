package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd fold of a vector column against a LITERAL matrix: output
  * element p is the left-to-right accumulation over i of
  * `vec(i) * mat(p)(i)` (dot) or `(vec(i) - mat(p)(i))^2` summed
  * (squared L2) — the per-row kernel of SRP bucketing (dot vs ±1
  * hyperplanes) and IVF cell assignment (distance to each centroid).
  *
  * The composable form (one `aggregate(zip_with(vec, typedLit(row)))`
  * per matrix row) is interpreted per element: planes x dim boxed lambda
  * calls per record on the corpus-wide hashing/assignment path. This
  * expression runs one fused loop under whole-stage codegen with
  * identical accumulation order, so DuckDB oracles keep matching.
  *
  * Null semantics mirror the HOF form exactly: a vector whose length
  * differs from the matrix row (zip_with pads with null) or containing a
  * null element poisons every fold -> ALL output elements null (callers
  * decide, e.g. srpBucket's `when(d >= 0, bit).otherwise(0)` maps null
  * to 0). A null input array yields a null output array.
  */
case class VectorLiteralFold(child: Expression, mat: Seq[Seq[Double]],
                             squared: Boolean) extends UnaryExpression {
  require(mat.nonEmpty && mat.forall(_.length == mat.head.length),
    "matrix must be non-empty and rectangular")

  @transient private lazy val matArr: Array[Array[Double]] =
    mat.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "vector_literal_fold"

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any =
    VectorLiteralFold.fold(input.asInstanceOf[ArrayData], matArr, squared, elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("foldMat", matArr, "double[][]")
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.VectorLiteralFold.fold($in, $matRef, $squared, $elemIsFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): VectorLiteralFold =
    copy(child = newChild)
}

object VectorLiteralFold {
  /** One output element per matrix row; all-null when the vector length
    * mismatches or any element is null (HOF-poison parity). */
  def fold(vec: ArrayData, mat: Array[Array[Double]], squared: Boolean,
           isFloat: Boolean): GenericArrayData = {
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
    val x = new Array[Double](dim)
    i = 0
    while (i < dim) {
      x(i) = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      i += 1
    }
    var p = 0
    while (p < rows) {
      val row = mat(p)
      var acc = 0.0
      var j = 0
      if (squared) {
        while (j < dim) { val d = x(j) - row(j); acc += d * d; j += 1 }
      } else {
        while (j < dim) { acc += x(j) * row(j); j += 1 }
      }
      out(p) = acc
      p += 1
    }
    new GenericArrayData(out)
  }
}
