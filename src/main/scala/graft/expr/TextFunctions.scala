package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the document pipelines (tokenize, stopwords,
  * quality, language ID). Everything here is a native Column expression
  * except the CJK tokenizer, which is the one sanctioned UDF (SURVEY.md
  * §7.4 — the reference uses jieba, preprocess_high_energy.py:39-61,
  * which has no JVM twin offline; we ship a dictionary max-match).
  */
object TextFunctions {

  /** Stopword list used by quality scoring and language ID. Mirrors the
    * role of the reference's 36-entry stopword set
    * (preprocess_high_energy.py:47-52).
    */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "and", "to", "in", "is", "it", "on",
    "for", "with", "as", "at", "by", "or", "be", "this", "that", "are")

  /** Whitespace tokenizer with empty-token and null handling: the
    * engine-level contract for already-segmented text. null → [].
    * Backed by the codegen'd WsTokenize kernel (the old
    * `filter(split(...))` HOF chain evaluated interpreted per element
    * and dominated the dedup/text hot path — see expr/Tokenize.scala).
    */
  def tokens(textCol: Column): Column = WsTokenize.tokens(textCol)

  /** Tokens with the reference's post-filters applied in the same
    * codegen'd kernel: drop stopwords, single-char tokens, and pure
    * numerics (preprocess_high_energy.py:53-58).
    */
  def filteredTokens(textCol: Column): Column = WsTokenize.filteredTokens(textCol)

  /** Dictionary-based forward max-match CJK segmentation — the jieba
    * stand-in (the one UDF in the engine; SURVEY.md §2.3 U2). Greedy
    * longest-prefix match against a shipped lexicon; non-CJK runs are
    * split on whitespace. Deterministic, serializable, broadcast-safe
    * (the dictionary is an object constant: each executor materializes
    * it once from the jar's own resource at classload, so nothing is
    * shipped per task).
    *
    * The dictionary is corpus-derived data, not a hand list: the top
    * 2/3/4-char n-gram frequencies of the reference's committed danmaku
    * corpora (tools/derive_cjk_dict.py → resources/graft/cjk_dict.txt,
    * ~2000 entries), plus every lexicon surface form from
    * [[RefLexicons]] (entity aliases and energy terms must segment as
    * units) and the engine's own core terms.
    */
  val cjkDictionary: Set[String] = {
    val fromResource = {
      val in = getClass.getResourceAsStream("/graft/cjk_dict.txt")
      require(in != null, "missing resource graft/cjk_dict.txt")
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(w => w.nonEmpty && !w.startsWith("#")).toSet
      finally in.close()
    }
    val fromLexicons =
      (RefLexicons.fanRen ++ RefLexicons.spyFamily).flatMap(_._2) ++
        RefLexicons.energyTiers.flatMap(_._1)
    val core = Set(
      "韩立", "南宫婉", "银月", "厉飞雨", "大衍神君", "高能", "名场面",
      "前方", "泪目", "哈哈哈", "草", "太强了", "神仙", "打卡")
    // multi-char entries only: a 1-char entry is the fallback anyway
    (fromResource ++ fromLexicons ++ core).filter(_.length >= 2)
  }

  /** Longest dictionary entry — bound for the max-match window; a val
    * so the per-row loop doesn't rescan the 2k-entry set.
    */
  private val cjkDictMaxLen: Int =
    if (cjkDictionary.isEmpty) 1 else cjkDictionary.iterator.map(_.length).max

  def segmentCjk(text: String): Seq[String] = {
    if (text == null || text.isEmpty) return Seq.empty
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    val maxLen = cjkDictMaxLen
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (c.isWhitespace) { i += 1 }
      else if (isCjk(c)) {
        // forward maximum match against the dictionary
        var matched = 0
        var l = math.min(maxLen, n - i)
        while (l >= 2 && matched == 0) {
          if (cjkDictionary.contains(text.substring(i, i + l))) matched = l
          l -= 1
        }
        if (matched == 0) matched = 1 // single CJK char fallback
        buf += text.substring(i, i + matched)
        i += matched
      } else {
        var j = i
        while (j < n && !text.charAt(j).isWhitespace && !isCjk(text.charAt(j))) j += 1
        buf += text.substring(i, j)
        i = j
      }
    }
    buf.toSeq
  }

  private def isCjk(c: Char): Boolean =
    Character.UnicodeBlock.of(c) == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS

  val segmentCjkUdf = udf(segmentCjk _)

  /** Quality signals per document, all native expressions (builder-prompt
    * "text analysis" component): token count, distinct ratio, stopword
    * ratio, mean token length. Callers round before comparing.
    */
  def tokenCount(textCol: Column): Column = size(tokens(textCol))

  def distinctRatio(textCol: Column): Column = {
    val t = tokens(textCol)
    when(size(t) === 0, 0.0)
      .otherwise(size(array_distinct(t)).cast("double") / size(t))
  }

  def stopwordRatio(textCol: Column): Column = {
    val t = tokens(textCol)
    val hits = size(filter(t, w => array_contains(typedLit(stopwords), w)))
    when(size(t) === 0, 0.0).otherwise(hits.cast("double") / size(t))
  }

  def meanTokenLen(textCol: Column): Column = {
    val t = tokens(textCol)
    when(size(t) === 0, 0.0)
      .otherwise(aggregate(t, lit(0L), (acc, w) => acc + length(w)).cast("double") / size(t))
  }

  /** Composite quality score in [0,1]: favors longer docs with diverse,
    * non-stopword vocabulary. Weights are engine constants (constant-
    * folded by Catalyst).
    */
  def qualityScore(textCol: Column, nCharsCol: Column): Column = {
    val lenScore = least(nCharsCol.cast("double") / 500.0, lit(1.0))
    lenScore * 0.4 + distinctRatio(textCol) * 0.4 + (lit(1.0) - stopwordRatio(textCol)) * 0.2
  }

  /** N-gram-heuristic language ID: score = stopword-hit ratio per
    * language lexicon, argmax wins, 'und' when no lexicon fires. Over
    * the synthetic corpus all languages share an English-like vocabulary,
    * so this exercises the machinery (argmax over per-lexicon ratios)
    * rather than real linguistics.
    */
  val langLexicons: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "que", "de", "y"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Codegen'd single-pass kernel (expr/LangId.scala): one hash probe
    * per token instead of five interpreted HOF filter walks — measured
    * ~20× on the sf0.1 corpus; [[langIdFold]] keeps the original
    * declarative form and the spec pins corpus-wide equality.
    */
  def langId(textCol: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      LangId(org.apache.spark.sql.GraftColumnBridge.expression(tokens(textCol))))

  /** The original five-filter fold — the independent reference
    * implementation [[langId]] is spec-pinned against.
    */
  private[graft] def langIdFold(textCol: Column): Column = {
    val t = tokens(textCol)
    val scores = langLexicons.toSeq.sortBy(_._1).map { case (lang, lex) =>
      lang -> size(filter(t, w => array_contains(typedLit(lex), w)))
    }
    // argmax with deterministic tie-break on language code (alphabetical,
    // first wins because later langs must be strictly greater).
    val best = scores.tail.foldLeft((lit(scores.head._1), scores.head._2)) {
      case ((bl, bs), (lang, s)) =>
        (when(s > bs, lang).otherwise(bl), when(s > bs, s).otherwise(bs))
    }
    when(best._2 === 0, "und").otherwise(best._1)
  }
}
