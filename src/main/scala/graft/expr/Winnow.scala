package graft.expr

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD
  * 2003 — the public MOSS algorithm) as a native codegen'd Catalyst
  * expression: the rolling-hash fingerprint every training-data
  * pipeline wants for copy detection at corpus scale.
  *
  *   1. Karp-Rabin ROLLING hash over character k-grams: h(i+1) derives
  *      from h(i) in O(1) (subtract the outgoing char's base^(k-1)
  *      term, multiply by the base, add the incoming char) — one pass,
  *      wraparound Long arithmetic (exact, engine-independent).
  *   2. Winnowing: slide a w-window over the hash sequence, keep each
  *      window's MINIMUM (rightmost on ties), dedupe consecutive picks.
  *      Guarantees: any shared substring of length >= w + k - 1 yields
  *      at least one shared fingerprint; density ~= 2/(w+1).
  *
  * Emitted as sorted distinct array<long> (set semantics — order of
  * selection is an implementation detail; the guarantee is on set
  * overlap). Codegen'd like SimHash64/WsTokenize: the kernel is a
  * static method shared by interpreted eval and generated code, so the
  * fingerprint of a 100 TB corpus is one projection inside the scan
  * stage — no UDF serialization fence, no Python.
  *
  * The reference has no fingerprinting op; this extends q45's exact
  * content hash with a LOCAL-similarity-preserving one (builder-prompt
  * "document fingerprinting (rolling hash)").
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 2 && w >= 1, s"need k>=2, w>=1 (got k=$k, w=$w)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprint requires string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprint.winnow(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.WinnowFingerprint.winnow($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}

object WinnowFingerprint {
  /** Karp-Rabin base; wraparound in Z/2^64 keeps every op exact and
    * portable (no mod-prime 128-bit multiply needed).
    */
  val base = 1000003L

  /** Static kernel shared by interpreted eval and generated code.
    * One pass over the code points, O(1) extra state beyond the w-sized
    * ring buffer; total work O(n + picks·log picks).
    */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toString
    val n = s.codePointCount(0, s.length)
    if (n < k) return new GenericArrayData(Array.empty[Long])
    // code points, not chars: CJK + emoji must roll as single symbols
    val cps = new Array[Int](n)
    var ci = 0
    var off = 0
    while (off < s.length) {
      val cp = s.codePointAt(off)
      cps(ci) = cp; ci += 1; off += Character.charCount(cp)
    }
    val nGrams = n - k + 1
    // rolling Karp-Rabin over k-grams
    var pow = 1L // base^(k-1), wraparound
    var i = 1
    while (i < k) { pow *= base; i += 1 }
    val hashes = new Array[Long](nGrams)
    var h = 0L
    i = 0
    while (i < k) { h = h * base + cps(i); i += 1 }
    hashes(0) = h
    i = 1
    while (i < nGrams) {
      h = (h - cps(i - 1) * pow) * base + cps(i + k - 1)
      hashes(i) = h
      i += 1
    }
    // winnowing: min of each w-window of hashes, rightmost on ties,
    // record only when the pick changes (standard robust winnowing)
    val picks = new java.util.TreeSet[java.lang.Long]()
    if (nGrams <= w) {
      var minIdx = 0
      i = 1
      while (i < nGrams) { if (hashes(i) <= hashes(minIdx)) minIdx = i; i += 1 }
      picks.add(hashes(minIdx))
    } else {
      var minIdx = -1
      var start = 0
      while (start + w <= nGrams) {
        if (minIdx < start) { // outgoing min left the window: rescan
          minIdx = start
          var j = start + 1
          while (j < start + w) { if (hashes(j) <= hashes(minIdx)) minIdx = j; j += 1 }
          picks.add(hashes(minIdx))
        } else { // only the incoming hash can beat the current min
          val in = start + w - 1
          if (hashes(in) <= hashes(minIdx)) { minIdx = in; picks.add(hashes(in)) }
        }
        start += 1
      }
    }
    val out = new Array[Long](picks.size)
    val it = picks.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  /** Column entry point — default MOSS-ish parameters (k=5 noise
    * threshold, w=4 → guarantee threshold t = w + k - 1 = 8 chars).
    */
  def apply(c: Column, k: Int = 5, w: Int = 4): Column =
    GraftColumnBridge.column(
      WinnowFingerprint(GraftColumnBridge.expression(c), k, w))
}
