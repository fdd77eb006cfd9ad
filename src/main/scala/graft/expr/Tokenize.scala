package graft.expr

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace tokenizer as a native codegen'd Catalyst expression.
  *
  * Replaces the interpreted `filter(split(text, " "), ...)` higher-order
  * chain (HOF lambdas are evaluated per-element interpreted — Spark has
  * no codegen for them), which dominated the dedup/text hot path at
  * sf0.1 (q52 35 s / q53 30 s / q40 6 s in BENCH_r02). One byte-scan
  * over the string, one token array out, fully inside whole-stage
  * codegen.
  *
  * Semantics are IDENTICAL to the old chain (the DuckDB oracles pin
  * them): split on single 0x20 bytes (multibyte UTF-8 never contains
  * 0x20), drop empty tokens; with `filtered=true` additionally drop
  * stopwords, single-char tokens, and pure-ASCII-digit tokens — the
  * reference's post-filters (preprocess_high_energy.py:53-58).
  */
case class WsTokenize(child: Expression, filtered: Boolean) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ws_tokenize requires string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    WsTokenize.tokenize(input.asInstanceOf[UTF8String], filtered)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.WsTokenize.tokenize($c, $filtered);")

  override protected def withNewChildInternal(newChild: Expression): WsTokenize =
    copy(child = newChild)
}

object WsTokenize {
  /** Stopword set as UTF8String (byte-equality) — built once per JVM. */
  private val stopwordSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    TextFunctions.stopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  /** Static kernel shared by interpreted eval and generated code. */
  def tokenize(str: UTF8String, filtered: Boolean): ArrayData = {
    val bytes = str.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[AnyRef](8)
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        if (i > start) {
          val tok = UTF8String.fromBytes(bytes, start, i - start)
          if (!filtered || keep(tok)) out.add(tok)
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  private def keep(tok: UTF8String): Boolean = {
    if (tok.numChars() <= 1) return false
    var allDigit = true
    var i = 0
    val nb = tok.numBytes()
    while (allDigit && i < nb) {
      val b = tok.getByte(i)
      if (b < '0' || b > '9') allDigit = false
      i += 1
    }
    if (allDigit) return false
    !stopwordSet.contains(tok)
  }

  /** Column entry points; null text → empty array (the engine contract,
    * same as the old when(isNull, []) wrapper).
    */
  def tokens(c: Column): Column =
    org.apache.spark.sql.functions.coalesce(
      GraftColumnBridge.column(WsTokenize(GraftColumnBridge.expression(c), filtered = false)),
      org.apache.spark.sql.functions.typedLit(Seq.empty[String]))

  def filteredTokens(c: Column): Column =
    org.apache.spark.sql.functions.coalesce(
      GraftColumnBridge.column(WsTokenize(GraftColumnBridge.expression(c), filtered = true)),
      org.apache.spark.sql.functions.typedLit(Seq.empty[String]))
}

/** Word n-gram shingles as a native codegen'd expression: one pass over
  * the token array, each shingle a single `concatWs` — replaces the
  * interpreted `transform(sequence(...), i -> concat_ws(" ",
  * slice(toks, i+1, n)))` chain whose per-shingle interpreted slice made
  * shingle construction the single hottest kernel in the engine.
  * `size < n` → empty array (same as the old when() guard); null
  * elements inside a slice are skipped by concatWs (concat_ws parity).
  */
case class NGramShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_shingles requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    NGramShingles.shingle(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.NGramShingles.shingle($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): NGramShingles =
    copy(child = newChild)
}

object NGramShingles {
  private val SPACE = UTF8String.fromString(" ")
  private val EMPTY = new GenericArrayData(Array.empty[Any])

  /** Static kernel shared by interpreted eval and generated code. */
  def shingle(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    if (m < n) return EMPTY
    val out = new Array[Any](m - n + 1)
    var i = 0
    while (i <= m - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        parts(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(SPACE, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(toks: Column, n: Int): Column =
    GraftColumnBridge.column(NGramShingles(GraftColumnBridge.expression(toks), n))
}
