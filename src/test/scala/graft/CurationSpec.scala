package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{GlobalIndex, Sampling, TextAnalysis}

/** Pins for the curation-planning batch: LM doc scoring (q196),
  * vocabulary OOV audit (q198), mixture reweighting (q199), and the
  * equi-depth histogram (q200) — hand-computed fixtures plus balance
  * invariants.
  */
class CurationSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("q196: doc score is the exact mean conditional bigram ppm") {
    val docs = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "x"))
      .toDF("doc_id", "text")
    // bigrams: "a b"×2, "a c"×1 → c1(a)=3
    // p(b|a) = 2_000_000 div 3 = 666666; p(c|a) = 333333
    val out = TextAnalysis.lmDocScoresCore(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      (1L, 1L, 666666L), (2L, 1L, 666666L), (3L, 1L, 333333L)))
    // doc 4 has no bigrams and is absent — the q41 zero-token stance
  }

  test("q198: OOV rate counts occurrences outside the top-N vocab") {
    val docs = Seq(
      (1L, "en", "web", "the the the cat"),
      (2L, "en", "web", "the dog"),
      (3L, "fr", "book", "le le chat"))
      .toDF("doc_id", "lang", "source", "text")
    // corpus counts: the=4, le=2, cat=1, dog=1, chat=1 → vocab(2) = {the, le}
    val out = TextAnalysis.vocabOovCore(docs, vSize = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq === Seq(
      ("en", "web", 6L, 2L, 333333L),   // cat + dog OOV of 6 tokens
      ("fr", "book", 3L, 1L, 333333L))) // chat OOV of 3
  }

  test("q199: scarce language keeps everything, bulk is downsampled") {
    val out = Sampling.mixtureReweight(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.nonEmpty)
    val langRows = out.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val total = langRows.values.sum
    val target = total / langRows.size
    out.foreach { case (lang, _, n, ppm, exp) =>
      assert(ppm >= 0 && ppm <= 1000000L)
      // rate matches the capped integral formula for this language
      val expPpm = math.min(1000000L, target * 1000000L / langRows(lang))
      assert(ppm === expPpm, s"$lang rate")
      assert(exp === n * ppm / 1000000L)
    }
    // at least one language must be at the cap or below it strictly —
    // i.e. the plan actually differentiates (uniform target over a
    // skewed corpus cannot give every language the same rate)
    assert(out.map(_._4).distinct.length > 1)
  }

  test("q200: buckets are balanced to within one row and cover the span") {
    val out = GlobalIndex.equidepthHistogram(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.length === GlobalIndex.histBuckets)
    val n = out.map(_._2).sum
    val (floor, ceil) = (n / GlobalIndex.histBuckets,
      (n + GlobalIndex.histBuckets - 1) / GlobalIndex.histBuckets)
    out.foreach { case (b, rows, lo, hi) =>
      assert(rows === floor || rows === ceil, s"bucket $b unbalanced: $rows")
      assert(lo <= hi)
    }
    // boundaries are non-decreasing across buckets
    out.sliding(2).foreach {
      case Array((_, _, _, hi1), (_, _, lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }

  test("q230 chunking: geometry, full coverage, and md5 identity on " +
    "hand-built docs") {
    import graft.ops.CorpusPrep
    val S = CorpusPrep.chunkStride
    // 150 tokens → starts 0, 48, 96; lens 64, 64, 54. 10 tokens → one
    // chunk. Tokens are distinct so slices are unambiguous.
    val words150 = (0 until 150).map(i => s"w$i")
    val words10 = (0 until 10).map(i => s"v$i")
    val docs = Seq((1L, words150.mkString(" ")), (2L, words10.mkString(" ")))
      .toDF("doc_id", "text")
    val rows = CorpusPrep.chunkCore(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSeq.sortBy(x => (x._1, x._2))
    val md = java.security.MessageDigest.getInstance("MD5")
    def m(s: String): String = md.digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val expect = Seq(
      (1L, 0L, 0L, 64L, m(words150.slice(0, 64).mkString(" "))),
      (1L, 1L, 48L, 64L, m(words150.slice(48, 112).mkString(" "))),
      (1L, 2L, 96L, 54L, m(words150.slice(96, 150).mkString(" "))),
      (2L, 0L, 0L, 10L, m(words10.mkString(" "))))
    assert(rows === expect)
    // coverage: consecutive chunks advance by exactly S ≤ chunk length,
    // so no token gap
    rows.filter(_._1 == 1L).sliding(2).foreach {
      case Seq((_, _, s1, l1, _), (_, _, s2, _, _)) =>
        assert(s2 <= s1 + l1, "chunks must not leave a gap")
        assert(s2 - s1 == S)
      case _ =>
    }
  }
}
