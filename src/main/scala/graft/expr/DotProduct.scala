package graft.expr

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Σ aᵢ·bᵢ over two `array<double>`/`array<float>` columns as a codegen'd
  * Catalyst expression. The higher-order-function route
  * (`aggregate(zip_with(...))`, graft.expr.Vectors.dotHof) evaluates its
  * lambda interpreted per element — fine for per-row use, dominant cost on
  * a candidate-pair join where the dot runs millions of times (measured
  * ~3× wall-clock on the embedding near-dup query at sf0.1). This
  * expression stays inside whole-stage codegen: one static-kernel call per
  * pair, no per-element closure dispatch.
  *
  * Float inputs are promoted element-wise to double before the multiply —
  * bit-identical to the HOF route's `x.cast("double") * y.cast("double")`
  * — so a raw `array<float>` embedding column needs no up-front
  * array-cast projection (which would double its shuffle width).
  * Arithmetic accumulates sequentially in double regardless of input type.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product requires array<double|float> on both sides, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  private def isFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Kernel selected once at plan time by child element types — the
    * generated call site is monomorphic, no per-element dispatch.
    */
  private lazy val kernel: String = (isFloat(left.dataType), isFloat(right.dataType)) match {
    case (false, false) => "dot"
    case (true, true)   => "dotFF"
    case (true, false)  => "dotFD"
    case (false, true)  => "dotDF"
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    kernel match {
      case "dot"   => DotProduct.dot(x, y)
      case "dotFF" => DotProduct.dotFF(x, y)
      case "dotFD" => DotProduct.dotFD(x, y)
      case "dotDF" => DotProduct.dotDF(x, y)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.DotProduct.$kernel($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Static kernels shared by interpreted eval and generated code.
    * Length mismatch truncates to the shorter side (engine contract:
    * embedding dims are homogeneous per table; a guard, not a feature).
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def dotFD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getDouble(i); i += 1 }
    s
  }

  def dotDF(a: ArrayData, b: ArrayData): Double = dotFD(b, a)

  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      DotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
