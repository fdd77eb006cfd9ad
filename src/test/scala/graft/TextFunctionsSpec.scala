package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.expr.TextFunctions

/** U2 + text-quality contracts (SURVEY.md §2.3, preprocess_high_energy
  * .py:39-61): tokenizer null-safety, the stopword/len/numeric filters,
  * CJK max-match segmentation, quality signals, language ID.
  */
class TextFunctionsSpec extends AnyFunSuite with SparkTestBase {

  private def run1[T](v: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): org.apache.spark.sql.Row = {
    val s = spark
    import s.implicits._
    Seq(Option(v)).toDF("text").select(c(col("text")).as("out")).collect()(0)
  }

  test("tokens: null → empty array, runs of spaces collapse") {
    assert(run1(null, TextFunctions.tokens).getSeq[String](0) == Seq.empty)
    assert(run1("a  b   c", TextFunctions.tokens).getSeq[String](0) == Seq("a", "b", "c"))
  }

  test("filteredTokens drops stopwords, single-char and pure-numeric tokens") {
    val out = run1("the spark 7 x 42 engine a of", TextFunctions.filteredTokens)
      .getSeq[String](0)
    assert(out == Seq("spark", "engine"))
  }

  test("segmentCjk: dictionary max-match with single-char fallback") {
    assert(TextFunctions.segmentCjk("韩立和南宫婉") == Seq("韩立", "和", "南宫婉"))
    // longest match wins over a shorter dictionary prefix
    assert(TextFunctions.segmentCjk("大衍神君") == Seq("大衍神君"))
  }

  test("segmentCjk: mixed CJK/latin, whitespace, null") {
    assert(TextFunctions.segmentCjk("abc韩立 def") == Seq("abc", "韩立", "def"))
    assert(TextFunctions.segmentCjk(null) == Seq.empty)
    assert(TextFunctions.segmentCjk("") == Seq.empty)
  }

  test("segmentCjk property: concatenation reproduces input minus whitespace") {
    val cjkChars = Gen.oneOf('韩', '立', '和', '南', '宫', '婉', '高', '能', 'a', 'b', ' ')
    val strs = Gen.listOf(cjkChars).map(_.mkString)
    val prop = Prop.forAll(strs) { s =>
      TextFunctions.segmentCjk(s).mkString == s.replaceAll("\\s", "")
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop).passed)
  }

  test("distinctRatio / stopwordRatio / meanTokenLen on known input") {
    assert(run1("x x y", c => TextFunctions.distinctRatio(c)).getDouble(0) === 2.0 / 3.0)
    assert(run1("the x", c => TextFunctions.stopwordRatio(c)).getDouble(0) === 0.5)
    assert(run1("ab abcd", c => TextFunctions.meanTokenLen(c)).getDouble(0) === 3.0)
  }

  test("ratios are 0 on empty text (no division by zero)") {
    assert(run1("", c => TextFunctions.distinctRatio(c)).getDouble(0) === 0.0)
    assert(run1("", c => TextFunctions.stopwordRatio(c)).getDouble(0) === 0.0)
    assert(run1("", c => TextFunctions.meanTokenLen(c)).getDouble(0) === 0.0)
  }

  test("qualityScore stays in [0, 1]") {
    val s = spark
    import s.implicits._
    val rows = Seq(("", 0L), ("the the the", 11L), ("unique diverse vocabulary rich", 1000L))
      .toDF("text", "n_chars")
      .select(TextFunctions.qualityScore(col("text"), col("n_chars")).as("q"))
      .collect().map(_.getDouble(0))
    assert(rows.forall(q => q >= 0.0 && q <= 1.0))
  }

  test("langId: argmax over lexicon hits, 'und' when nothing fires") {
    assert(run1("the and of x", c => TextFunctions.langId(c)).getString(0) == "en")
    assert(run1("le la et puis", c => TextFunctions.langId(c)).getString(0) == "fr")
    assert(run1("zzz qqq", c => TextFunctions.langId(c)).getString(0) == "und")
    assert(run1(null, c => TextFunctions.langId(c)).getString(0) == "und")
  }

  test("cjk dictionary is corpus-derived: resource-loaded, >=1000 multi-char entries, lexicon terms present") {
    assert(TextFunctions.cjkDictionary.size >= 1000)
    assert(TextFunctions.cjkDictionary.forall(_.length >= 2))
    // every lexicon surface form must segment as a unit
    val aliases = (graft.expr.RefLexicons.fanRen ++ graft.expr.RefLexicons.spyFamily)
      .flatMap(_._2).filter(_.length >= 2)
    assert(aliases.forall(TextFunctions.cjkDictionary.contains))
    // and corpus-frequent n-grams made it in (spot pins from the
    // committed dictionary file, stable under re-derivation because the
    // corpus is committed and the tool is deterministic)
    Seq("哈哈哈哈", "前方高能", "名场面", "泪目").foreach(w =>
      assert(TextFunctions.cjkDictionary.contains(w), w))
  }

  test("winnow fingerprints: rolling hash algebra, guarantee threshold, codegen/interp parity") {
    import graft.expr.WinnowFingerprint
    def fp(s: String, k: Int = 5, w: Int = 4): Seq[Long] = {
      val arr = WinnowFingerprint.winnow(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), k, w)
      (0 until arr.numElements()).map(arr.getLong(_))
    }
    // deterministic, sorted, distinct
    val a = fp("the quick brown fox jumps over the lazy dog")
    assert(a == a.sorted && a.distinct == a && a.nonEmpty)
    assert(fp("the quick brown fox jumps over the lazy dog") == a)
    // below k code points → empty; exactly k → the single k-gram hash
    assert(fp("abcd").isEmpty)
    val h = "abcde".foldLeft(0L)((acc, c) => acc * WinnowFingerprint.base + c)
    assert(fp("abcde") == Seq(h))
    // rolling == direct: every picked hash equals a directly-computed
    // k-gram polynomial hash (catches rolling-update algebra bugs)
    val text = "winnowing rolling hash fingerprints"
    val direct = text.sliding(5).map(
      _.foldLeft(0L)((acc, c) => acc * WinnowFingerprint.base + c)).toSet
    assert(fp(text).forall(direct.contains))
    // the winnowing guarantee: docs sharing a substring of length
    // >= w + k - 1 = 8 share at least one fingerprint
    val shared = "SHARED-SEGMENT-0123456789"
    val d1 = fp("prefix one " + shared + " tail A")
    val d2 = fp("completely different start " + shared + " other end")
    assert(d1.toSet.intersect(d2.toSet).nonEmpty)
    // disjoint texts share nothing
    assert(fp("aaaaaaaaaaaaaaa").toSet.intersect(fp("bbbbbbbbbbbbbbb").toSet).isEmpty)
    // Spark side: codegen'd projection agrees with the kernel, and the
    // SQL registration works
    val s = spark
    import s.implicits._
    val viaDf = Seq(text).toDF("t")
      .select(WinnowFingerprint(col("t")).as("fps")).collect()(0)
      .getSeq[Long](0)
    assert(viaDf == fp(text))
    val viaSql = s.sql(s"SELECT winnow_fingerprint('$text') AS fps")
      .collect()(0).getSeq[Long](0)
    assert(viaSql == fp(text))
  }

  test("q156 hashed features: buckets/signs re-derived from md5, counts conserved") {
    val s = spark
    import s.implicits._
    def md5hex(w: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def bucketOf(w: String): Int = Integer.parseInt(md5hex(w).take(2), 16)
    def signOf(w: String): Long =
      if (Integer.parseInt(md5hex(w).substring(2, 3), 16) < 8) 1L else -1L
    val docs = Seq((1L, "alpha beta alpha", "en"), (2L, "beta gamma", "zh"),
      (3L, null.asInstanceOf[String], "en"))
      .toDF("doc_id", "text", "lang")
    // independent reference computation, token-by-token
    val expected = Seq("en" -> Seq("alpha", "beta", "alpha"),
      "zh" -> Seq("beta", "gamma"))
      .flatMap { case (lang, ws) =>
        ws.groupBy(w => bucketOf(w)).map { case (b, inB) =>
          (lang, b, inB.size.toLong, inB.distinct.size.toLong,
            inB.map(signOf).sum)
        }
      }.toSet
    val got = graft.ops.TextAnalysis.hashedFeaturesCore(docs).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
    // real corpus: buckets in range, signed mass bounded by token mass
    val real = graft.ops.TextAnalysis.hashedFeatures(spark, sf).collect()
    assert(real.nonEmpty)
    assert(real.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 256))
    assert(real.forall(r => math.abs(r.getLong(4)) <= r.getLong(2)))
    assert(real.forall(r => r.getLong(3) <= r.getLong(2)))
  }

  test("langId kernel equals the five-filter fold corpus-wide, with " +
    "tie-break and und edges") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, sf)
    val diff = docs.select(
        graft.expr.TextFunctions.langId(col("text")).as("k"),
        graft.expr.TextFunctions.langIdFold(col("text")).as("f"))
      .filter(col("k") =!= col("f") ||
        col("k").isNull =!= col("f").isNull)
      .count()
    assert(diff === 0L)
    // edges: tie (es and fr both score 1 → alphabetical first = es),
    // no marker → und, empty/null text → und
    val s = spark
    import s.implicits._
    val edge = Seq("le el", "zzz qqq", "", null.asInstanceOf[String])
      .toDF("text")
    val got = edge.select(graft.expr.TextFunctions.langId(col("text")))
      .collect().map(_.getString(0)).toSeq
    val fold = edge.select(graft.expr.TextFunctions.langIdFold(col("text")))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("es", "und", "und", "und"))
    assert(got === fold)
  }

  test("segmentCjk on real corpus phrases: longest dictionary match wins") {
    // 前方高能 is a dictionary 4-gram: matched whole, not 前方+高能
    assert(TextFunctions.segmentCjk("前方高能") == Seq("前方高能"))
    // greedy window caps at the longest entry; leftover falls back to chars
    assert(TextFunctions.segmentCjk("哈哈哈哈哈") == Seq("哈哈哈哈", "哈"))
    // alias + corpus words, no boundary bleed
    assert(TextFunctions.segmentCjk("韩老魔泪目打卡") == Seq("韩老魔", "泪目", "打卡"))
  }
}
