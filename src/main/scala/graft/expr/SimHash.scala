package graft.expr

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over a token array — a native Catalyst expression with
  * whole-stage codegen (`doGenCode` emits a call into the static kernel),
  * not a UDF: it stays inside the generated stage, so the near-dup
  * fingerprint of a 100 TB corpus is one codegen'd projection over the
  * scan, no serialization fence.
  *
  * Semantics: each token hashes to 64 bits (XXH64, fixed seed); bit b of
  * the signature is 1 iff more tokens have bit b set than clear
  * (duplicate tokens count multiply — standard term-frequency-weighted
  * SimHash). Near-duplicate docs differ in few bits (small Hamming
  * distance).
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash64 requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash64.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.expr.SimHash64.simhash($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** 128-bit SimHash over a token array — the log₂(corpus)-grown
  * signature width the 100-TB deployment answer needs (r13 verdict
  * task 1): with 64 bits, sub-band blocking forces a choice between a
  * constant-FRACTION candidate volume (4×16-bit bands: 4/2¹⁶ of
  * all-pairs — quadratic at 10⁹ docs) and a collapsed pigeonhole
  * guarantee (2×32-bit bands: radius ≤ 1). 128 bits dissolve the
  * trade: 4×32-bit bands are simultaneously collision-free
  * (4/2³² ≈ 9e-10 of all-pairs — O(N) expected random collisions at
  * 10⁹ docs) and radius-3-complete over the 128-bit metric.
  *
  * Output is `array<bigint>` [lo, hi]. The LOW half is bit-identical
  * to [[SimHash64]] (same XXH64 seed 42 per token), so the production
  * Hamming-≤3-on-64-bits contract (q55/q56 — untouched) remains
  * computable from this signature; the HIGH half is an independent
  * second simhash (seed 1337). One token pass updates both counter
  * banks — the wider signature costs one extra hash per token, not a
  * second scan. Same codegen discipline as SimHash64: a static kernel
  * called from generated code, no UDF.
  */
case class SimHash128(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash128 requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash128.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.expr.SimHash128.simhash($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash128 =
    copy(child = newChild)
}

object SimHash128 {
  /** Seed of the high half; the low half reuses [[SimHash64.seed]] so
    * lo == simhash64 exactly.
    */
  val seedHi = 1337L

  /** Static kernel shared by interpreted eval and generated code. */
  def simhash(tokens: ArrayData): ArrayData = {
    val lo = new Array[Int](64)
    val hi = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val s = tokens.getUTF8String(i)
        val hLo = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes, SimHash64.seed)
        val hHi = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes, seedHi)
        var b = 0
        while (b < 64) {
          if (((hLo >>> b) & 1L) == 1L) lo(b) += 1 else lo(b) -= 1
          if (((hHi >>> b) & 1L) == 1L) hi(b) += 1 else hi(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var outLo = 0L
    var outHi = 0L
    var b = 0
    while (b < 64) {
      if (lo(b) > 0) outLo |= (1L << b)
      if (hi(b) > 0) outHi |= (1L << b)
      b += 1
    }
    new GenericArrayData(Array[Any](outLo, outHi))
  }

  /** Column-level entry point: array<bigint> [lo, hi]. */
  def apply(c: Column): Column =
    GraftColumnBridge.column(SimHash128(GraftColumnBridge.expression(c)))
}

object SimHash64 {
  val seed = 42L

  /** Static kernel shared by interpreted eval and generated code. */
  def simhash(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = hashToken(tokens.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def hashToken(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)

  /** Column-level entry point. */
  def apply(c: Column): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(c)))

  /** Hamming distance between two signatures as a native expression. */
  def hamming(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b))
}
