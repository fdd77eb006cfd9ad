package graft.expr

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}

/** md5-derived k-register MinHash over a shingle array — the q333
  * verification twin's signature computed the way [[SimHashMd5]]
  * computes q330's: one codegen'd pass per doc, no row fan-out, no
  * shuffled aggregate (r17; the previous plan exploded the shingle
  * relation, derived 4 digests per shingle row, fanned ×k rows and
  * min-aggregated across two exchanges — and the whole chain ran on
  * the scan's single partition at bench scale: q333 measured 6.5 s
  * warm at sf0.1).
  *
  * Semantics — bit-identical to the q333 oracle preface, which is the
  * contract:
  *   - register r's hash of shingle sh is the (r mod 4)-th 32-bit
  *     big-endian slice of md5(concat(r div 4, ':', sh)) — one digest
  *     per GROUP of four registers, exactly `conv(substring(md5_hex,
  *     (r%4)*8+1, 8), 16, 10)`;
  *   - the signature is the per-register MIN over the doc's shingles
  *     (the caller passes the per-doc DISTINCT shingle array; min is
  *     multiset-invariant, so set semantics hold either way).
  *
  * Returns array<struct<reg, minhash>> with k elements, ordered by reg
  * — or EMPTY for a shingle-less doc, so a single `explode` both
  * evaluates the kernel once and drops such docs (the SimHashMd5
  * generator discipline; a size()>0 filter on a derived column was the
  * measured double-evaluation trap).
  */
case class MinHashMd5(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(MinHashMd5.regType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_md5 requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashMd5.minhash(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.MinHashMd5.minhash($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinHashMd5 =
    copy(child = newChild)
}

object MinHashMd5 {
  val regType: StructType = StructType(Seq(
    StructField("reg", LongType, nullable = false),
    StructField("minhash", LongType, nullable = false)))

  private val EMPTY = new GenericArrayData(Array.empty[Any])

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static kernel shared by interpreted eval and generated code. */
  def minhash(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return EMPTY
    val groups = k / 4
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val d = md.get()
    var any = false
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        any = true
        val sh = shingles.getUTF8String(i).getBytes
        var g = 0
        while (g < groups) {
          d.reset()
          // concat(cast(g as string), ':', sh) — group ids are single
          // ASCII digits for any practical k (k=16 → g ∈ 0..3); the
          // general path writes the full decimal string
          if (g < 10) d.update(('0' + g).toByte)
          else d.update(String.valueOf(g).getBytes("UTF-8"))
          d.update(':'.toByte)
          d.update(sh)
          val dig = d.digest()
          var lane = 0
          while (lane < 4) {
            val r = g * 4 + lane
            if (r < k) {
              val o = lane * 4
              val v = ((dig(o) & 255L) << 24) | ((dig(o + 1) & 255L) << 16) |
                ((dig(o + 2) & 255L) << 8) | (dig(o + 3) & 255L)
              if (v < mins(r)) mins(r) = v
            }
            lane += 1
          }
          g += 1
        }
      }
      i += 1
    }
    if (!any) return EMPTY
    val out = new Array[Any](k)
    var r = 0
    while (r < k) {
      out(r) = new GenericInternalRow(Array[Any](r.toLong, mins(r)))
      r += 1
    }
    new GenericArrayData(out)
  }

  /** Column-level entry point:
    * array<struct<reg: bigint, minhash: bigint>> (0 or k elements).
    */
  def apply(c: Column, k: Int): Column =
    GraftColumnBridge.column(MinHashMd5(GraftColumnBridge.expression(c), k))
}
