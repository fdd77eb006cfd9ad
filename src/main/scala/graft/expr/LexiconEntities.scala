package graft.expr

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The per-row canonical-entity set as ONE Aho–Corasick pass — a native
  * codegen'd replacement for the unrolled contains/when chain
  * (ops/Fidelity.entityArray): with A aliases the chain evaluates up to
  * A substring searches per row (the fanren lexicon carries ~122
  * aliases over a 5.26M-row corpus — measured ~1.6 s of the ~2.4 s
  * every danmaku-extraction query pays at sf0.1); the automaton walks
  * the text bytes once, O(len) regardless of lexicon size.
  *
  * Semantics — identical to
  * `array_sort(array_compact(array(when(OR(contains(alias)), canon))))`:
  *   - an entry's canon is emitted iff ANY of its aliases occurs as a
  *     byte substring (UTF8String.contains is plain byte search, and
  *     UTF-8 is self-synchronizing, so byte-level AC matches exactly
  *     the same set);
  *   - one output cell per MATCHED LEXICON ENTRY (duplicate canons, if
  *     a lexicon ever carried them, would repeat — exactly as the
  *     original array of per-entry cells);
  *   - output sorted by canon UTF-8 byte order (= UTF8String's
  *     compareTo, the array_sort order);
  *   - NULL text → EMPTY array, matching array_compact's all-null
  *     collapse (the expression is therefore never null).
  */
case class LexiconEntities(child: Expression, lex: Seq[(String, Seq[String])])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lexicon_entities requires string, got ${other.catalogString}")
  }

  @transient private lazy val matcher: AcMatcher = AcMatcher.build(lex)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) AcMatcher.EMPTY else matcher.run(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("matcher", matcher, classOf[AcMatcher].getName)
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          ${childGen.isNull} ? graft.expr.AcMatcher.EMPTY()
                             : $m.run(${childGen.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LexiconEntities =
    copy(child = newChild)
}

object LexiconEntities {
  def apply(c: Column, lex: Seq[(String, Seq[String])]): Column =
    GraftColumnBridge.column(
      LexiconEntities(GraftColumnBridge.expression(c), lex))
}

/** Serializable Aho–Corasick matcher over UTF-8 bytes. The goto/fail/
  * output tables are @transient and rebuilt lazily per JVM (lexicons are
  * tiny — microseconds); only the alias/canon data ships in the task
  * closure.
  */
class AcMatcher private (
    aliasBytes: Array[Array[Byte]],     // alias i → its UTF-8 bytes
    aliasEntry: Array[Int],             // alias i → lexicon entry index
    sortedEntryOrder: Array[Int],       // entry indices in canon byte order
    canonUtf8: Array[UTF8String],       // entry index → canon
    alwaysHit: Array[Boolean],          // entry has an empty alias
    nEntries: Int) extends Serializable {

  // goto(node)(byte & 0xff) → next node; fail(node) → suffix node;
  // outEntries(node) → entry ids completed at this node (dict-suffix
  // closure merged in at build time)
  @transient private lazy val tables: (Array[Array[Int]], Array[Int], Array[Array[Int]]) = {
    val root = 0
    var nodes = 1
    val maxNodes = aliasBytes.map(_.length).sum + 1
    val goto = Array.fill(maxNodes)(null: Array[Int])
    def node(): Int = { val n = nodes; nodes += 1; n }
    goto(root) = Array.fill(256)(-1)
    val outSets = Array.fill(maxNodes)(scala.collection.mutable.Set.empty[Int])
    var i = 0
    while (i < aliasBytes.length) {
      val bs = aliasBytes(i)
      var cur = root
      var j = 0
      while (j < bs.length) {
        val b = bs(j) & 0xff
        if (goto(cur)(b) < 0) {
          val n = node(); goto(n) = Array.fill(256)(-1); goto(cur)(b) = n
        }
        cur = goto(cur)(b)
        j += 1
      }
      if (bs.nonEmpty) outSets(cur) += aliasEntry(i)
      i += 1
    }
    val fail = Array.fill(nodes)(root)
    val queue = scala.collection.mutable.Queue.empty[Int]
    var b = 0
    while (b < 256) {
      val n = goto(root)(b)
      if (n < 0) goto(root)(b) = root
      else { fail(n) = root; queue.enqueue(n) }
      b += 1
    }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      outSets(u) ++= outSets(fail(u))
      var c = 0
      while (c < 256) {
        val v = goto(u)(c)
        if (v < 0) goto(u)(c) = goto(fail(u))(c)
        else { fail(v) = goto(fail(u))(c); queue.enqueue(v) }
        c += 1
      }
    }
    (goto.take(nodes), fail, outSets.take(nodes).map(_.toArray))
  }

  def run(s: UTF8String): ArrayData = {
    val (goto, _, out) = tables
    val hit = new Array[Boolean](nEntries)
    var nHit = 0
    var e = 0
    while (e < nEntries) {
      if (alwaysHit(e)) { hit(e) = true; nHit += 1 }
      e += 1
    }
    val len = s.numBytes
    var node = 0
    var i = 0
    while (i < len && nHit < nEntries) {
      node = goto(node)(s.getByte(i) & 0xff)
      val os = out(node)
      var k = 0
      while (k < os.length) {
        val en = os(k)
        if (!hit(en)) { hit(en) = true; nHit += 1 }
        k += 1
      }
      i += 1
    }
    if (nHit == 0) AcMatcher.EMPTY
    else {
      val res = new Array[Any](nHit)
      var p = 0
      var q = 0
      while (p < sortedEntryOrder.length) {
        val en = sortedEntryOrder(p)
        if (hit(en)) { res(q) = canonUtf8(en); q += 1 }
        p += 1
      }
      new GenericArrayData(res)
    }
  }
}

object AcMatcher {
  /** Shared empty result; the generated code calls this accessor. */
  def EMPTY(): ArrayData = emptyArr
  private val emptyArr = new GenericArrayData(Array.empty[Any])

  def build(lex: Seq[(String, Seq[String])]): AcMatcher = {
    val nEntries = lex.length
    val canon = lex.map(e => UTF8String.fromString(e._1)).toArray
    val aliases = lex.zipWithIndex.flatMap { case ((_, as), e) =>
      as.map(a => (a.getBytes("UTF-8"), e)) }
    val alwaysHit = new Array[Boolean](nEntries)
    aliases.foreach { case (bs, e) => if (bs.isEmpty) alwaysHit(e) = true }
    val sortedOrder = (0 until nEntries)
      .sortBy(e => canon(e))(Ordering.fromLessThan[UTF8String](_.compareTo(_) < 0))
      .toArray
    new AcMatcher(
      aliases.map(_._1).toArray, aliases.map(_._2).toArray,
      sortedOrder, canon, alwaysHit, nEntries)
  }
}
