package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over embedding arrays.
  *
  * The declarative formulation (`aggregate(zip_with(a, b, _*_), 0d, _+_)`)
  * is semantically right but interpreted per element — at ~50M
  * element-steps for a near-dup pair scan it dominates the query. This
  * expression evaluates as a tight loop over the unsafe ArrayData
  * (primitive accessors, no per-element expression tree).
  *
  * Determinism contract (oracle bit-exactness): accumulates
  * left-to-right in double precision — the identical sequence of IEEE
  * operations as the higher-order fold and as DuckDB's
  * `list_dot_product` over `DOUBLE[]`.
  */
case class VectorDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vector_dot expects array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  @transient private lazy val leftIsFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val rightIsFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any =
    VectorKernels.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      leftIsFloat, rightIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (lf, rf) = (if (leftIsFloat) "true" else "false",
      if (rightIsFloat) "true" else "false")
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorKernels.dot($a, $b, $lf, $rf)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Static kernel shared by interpreted eval and generated code. */
object VectorKernels {
  def dot(a: ArrayData, b: ArrayData, leftIsFloat: Boolean, rightIsFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (leftIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightIsFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }
}

object VectorOps {
  /** `vector_dot(a, b)` as a Column. */
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(VectorDotExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
