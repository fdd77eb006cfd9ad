package graft.expr

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** The q341/q342 ±1-hyperplane bucket array as ONE codegen'd pass — the
  * q330 kernel move (expr/SimHash.scala's SimHashMd5) applied to the
  * md5-hyperplane twins. Semantically identical to the unrolled column
  * it replaces:
  *
  *   dot(t,p) = Σ_j signs(t,p)(j) · FLOOR(cast(v_j as double) · 10⁶)
  *   bucket(t) = Σ_p 2^p · [dot(t,p) > 0]
  *
  * but the micro-quantization FLOOR runs ONCE per component instead of
  * once per (component, plane, table) — the unrolled form materialized
  * dim × planes × tables FLOOR(element_at(...)) sub-expressions
  * (64·4·4 = 1024 at the registered shape), which Catalyst then
  * re-inlined into every consumer (filter, generate, join key) — a
  * ~340 KB physical plan whose projection fell out of practical
  * codegen. One kernel call per row keeps the projection inside
  * whole-stage codegen and the plan readable.
  *
  * Null semantics mirror the unrolled original exactly: a NULL array
  * yields NULL; a NULL *element* made every plane's dot NULL, and
  * `when(d > 0, 2^p).otherwise(0)` then contributed 0 for every plane —
  * i.e. every bucket 0 — so the kernel short-circuits to an all-zero
  * bucket array when any element is NULL.
  *
  * FLOOR parity: Spark's FLOOR(double) is math.floor(x).toLong — the
  * kernel uses the identical expression, so signatures replay in the
  * DuckDB oracle bit-for-bit (the oracle derives the same ±1 matrix
  * from md5 and the same micro-unit floors).
  */
case class MicroSignBuckets(child: Expression, signs: Seq[Seq[Seq[Int]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"micro_sign_buckets requires array<double|float>, got ${child.dataType.catalogString}")

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Plane-major flat sign matrix for the kernel: row (t·P + p) holds
    * the dim ±1 bytes of plane p of table t.
    */
  @transient private lazy val flatSigns: Array[Array[Byte]] =
    signs.flatten.map(_.map(_.toByte).toArray).toArray

  @transient private lazy val planesPerTable: Int = signs.head.length

  override def nullSafeEval(a: Any): Any =
    MicroSignBuckets.compute(a.asInstanceOf[ArrayData], flatSigns,
      planesPerTable, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signs", flatSigns, "byte[][]")
    val fl = if (isFloat) "true" else "false"
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expr.MicroSignBuckets.compute($a, $signsRef, $planesPerTable, $fl);")
  }

  override protected def withNewChildInternal(newChild: Expression): MicroSignBuckets =
    copy(child = newChild)
}

object MicroSignBuckets {

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(v: ArrayData, signs: Array[Array[Byte]],
              planesPerTable: Int, isFloat: Boolean): ArrayData = {
    val nPlanes = signs.length
    val nTables = nPlanes / planesPerTable
    val buckets = new Array[Long](nTables)
    val n = v.numElements()
    var hasNull = false
    var i = 0
    while (i < n && !hasNull) { hasNull = v.isNullAt(i); i += 1 }
    if (!hasNull) {
      // micro-quantize once per component (the whole point)
      val q = new Array[Long](n)
      i = 0
      while (i < n) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        q(i) = math.floor(x * 1000000.0).toLong
        i += 1
      }
      var tp = 0
      while (tp < nPlanes) {
        val sg = signs(tp)
        val d = math.min(n, sg.length)
        var dot = 0L
        var j = 0
        while (j < d) { dot += sg(j) * q(j); j += 1 }
        if (dot > 0L) buckets(tp / planesPerTable) |= (1L << (tp % planesPerTable))
        tp += 1
      }
    }
    new GenericArrayData(buckets)
  }

  def apply(v: Column, signs: Seq[Seq[Seq[Int]]]): Column =
    GraftColumnBridge.column(
      MicroSignBuckets(GraftColumnBridge.expression(v), signs))
}
