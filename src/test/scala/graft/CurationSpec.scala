package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{CorpusPrep, GlobalIndex, Sampling, TextAnalysis}

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

  test("q234: symbol pairs on a hand fixture (terminal marker included)") {
    import graft.ops.CorpusPrep
    val docs = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    // wf: ab→2, b→1; pairs: (a,b)×2, (b,</w>)×2 from 'ab', (b,</w>)×1
    val out = CorpusPrep.symbolPairCore(docs)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq(("b", "</w>", 3L), ("a", "b", 2L)))
  }

  /** Independent plain-Scala BPE trainer (Sennrich greedy): the q233
    * oracle stand-in. Distinct words map to distinct symbol vectors
    * (concatenation is injective), so the map never collides.
    */
  private def refBpe(wf0: Map[String, Long], k: Int)
      : (Seq[(Long, String, String, Long)],
         Map[String, (Vector[String], Long)]) = {
    var vocab: Map[String, (Vector[String], Long)] = wf0.map {
      case (w, f) => w -> ((w.map(_.toString).toVector :+ "</w>", f))
    }
    val out = scala.collection.mutable.ListBuffer
      .empty[(Long, String, String, Long)]
    for (r <- 1 to k) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((_, (syms, f)) <- vocab; i <- 0 until syms.length - 1) {
        val key = (syms(i), syms(i + 1))
        counts(key) = counts.getOrElse(key, 0L) + f
      }
      if (counts.nonEmpty) {
        val ((l, rr), c) = counts.toSeq
          .minBy { case ((a, b), n) => (-n, a, b) }
        out += ((r.toLong, l, rr, c))
        vocab = vocab.map { case (w, (syms, f)) =>
          val nb = scala.collection.mutable.ArrayBuffer.empty[String]
          for (x <- syms) {
            if (nb.nonEmpty && nb.last == l && x == rr)
              nb(nb.length - 1) = l + rr
            else nb += x
          }
          w -> ((nb.toVector, f))
        }
      }
    }
    (out.toSeq, vocab)
  }

  test("q233: merge table equals an independent in-JVM BPE trainer on " +
    "the corpus word-frequency table") {
    import graft.ops.CorpusPrep
    val wf = CorpusPrep.wordFreqs(graft.Tables.documents(spark, sf))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = refBpe(wf, CorpusPrep.bpeMerges)._1
    val got = CorpusPrep.bpeMergeTable(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(got === expect)
  }

  test("q236: segmented-vocabulary stats equal the independent trainer's " +
    "final vocabulary") {
    import graft.ops.CorpusPrep
    val wf = CorpusPrep.wordFreqs(graft.Tables.documents(spark, sf))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val vocab = refBpe(wf, CorpusPrep.bpeMerges)._2
    val expect = vocab.toSeq
      .flatMap { case (w, (syms, f)) => syms.map(s => (s, w, f)) }
      .groupBy(_._1).toSeq
      .map { case (s, occ) =>
        (s, occ.map(_._3).sum, occ.map(_._2).distinct.size.toLong,
          s.length.toLong) }
      .sortBy { case (s, tf, _, _) => (-tf, s) }
    val got = CorpusPrep.bpeSegmentStats(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === expect)
  }

  test("q231: BM25 top-k equals an independent BigInt replication") {
    val stop = graft.expr.TextFunctions.stopwords.toSet
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .flatMap(r => Option(r.getAs[String]("text")).map(r.getLong(0) -> _))
    def toks(t: String): Seq[String] = t.split("\\s+").toSeq
      .filter(w => w.length > 1 && !w.forall(_.isDigit) && !stop(w))
    val tf = scala.collection.mutable.Map.empty[(Long, String), Long]
    val dl = scala.collection.mutable.Map.empty[Long, Long]
    for ((id, t) <- docs; w <- toks(t)) {
      tf((id, w)) = tf.getOrElse((id, w), 0L) + 1
      dl(id) = dl.getOrElse(id, 0L) + 1
    }
    val bigN = BigInt(dl.size)
    val bigT = BigInt(dl.values.sum)
    val dfm = tf.keys.toSeq.groupBy(_._2).view.mapValues(_.size).toMap
    val termFreq = tf.toSeq.groupBy(_._1._2).view
      .mapValues(_.map(_._2).sum).toMap
    val top = termFreq.toSeq.sortBy { case (t, f) => (-f, t) }
      .take(graft.ops.TextAnalysis.bm25TopTerms).map(_._1)
    val expect = top.zipWithIndex
      .groupBy(_._2 / graft.ops.TextAnalysis.bm25TermsPerQuery)
      .toSeq.sortBy(_._1)
      .flatMap { case (qid, terms) =>
        val scored = dl.keys.toSeq.flatMap { doc =>
          val hits = terms.map(_._1).filter(t => tf.contains((doc, t)))
          if (hits.isEmpty) None
          else {
            val s = hits.map { t =>
              val df = BigInt(dfm(t))
              val idf = (2 * (bigN - df) + 1) * 1000000 / (2 * df + 1)
              val tfv = BigInt(tf((doc, t)))
              val dlv = BigInt(dl(doc))
              val tfp = (22 * bigT * tfv * 1000000) /
                (10 * bigT * tfv + 3 * bigT + 9 * bigN * dlv)
              idf * tfp / 1000000
            }.sum
            Some((doc, hits.size.toLong, s.toLong))
          }
        }
        scored.sortBy { case (doc, _, s) => (-s, doc) }
          .take(graft.ops.TextAnalysis.bm25K).zipWithIndex
          .map { case ((doc, nh, s), i) =>
            (qid.toLong, (i + 1).toLong, doc, nh, s) }
      }
    val got = graft.ops.TextAnalysis.bm25TopK(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === expect)
  }

  test("q245 RRF: fused score is the exact reciprocal identity and the " +
      "BM25-side ranking agrees with q231") {
    val rrf = TextAnalysis.rrfFusion(spark, sf).collect()
    assert(rrf.nonEmpty)
    rrf.foreach { r =>
      val (rb, rt, s) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(s == 1000000000L / (TextAnalysis.rrfK + rb)
        + 1000000000L / (TextAnalysis.rrfK + rt))
    }
    // the doc q231 ranks first is rank_bm25 = 1 in the fused frame
    // whenever it survives into the fused top-k
    val bmTop = TextAnalysis.bm25TopK(spark, sf).collect()
      .filter(_.getLong(1) == 1L).map(r => r.getLong(0) -> r.getLong(2)).toMap
    val fusedBm1 = rrf.filter(_.getLong(3) == 1L)
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    fusedBm1.foreach { case (q, d) => assert(bmTop(q) == d) }
  }

  test("q271 RBO: weights are the exact decimal series and the overlap " +
      "curve equals an independent in-JVM prefix intersection") {
    // decimal-exact weights: (1-p)p^(d-1) at 1e9, p = 0.9
    assert(TextAnalysis.rboWeightE9(1) == 100000000L)
    assert(TextAnalysis.rboWeightE9(2) == 90000000L)
    assert(TextAnalysis.rboWeightE9(10) == 38742048L)
    val out = TextAnalysis.rboOverlap(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty)
    // independent replication: collect the shared score frame, rank in
    // plain Scala, intersect explicit prefixes
    val scored = TextAnalysis.bm25ScoresCore(
        graft.Tables.documents(spark, sf))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Long]("score_e6"), r.getLong(4)))
      .groupBy(_._1)
    val wantOverlap = scored.flatMap { case (q, rows) =>
      val byBm = rows.sortBy(r => (-r._3, r._2)).map(_._2)
      val byTf = rows.sortBy(r => (-r._4, r._2)).map(_._2)
      (1 to TextAnalysis.bm25K).map { d =>
        (q, d.toLong) ->
          byBm.take(d).toSet.intersect(byTf.take(d).toSet).size.toLong
      }
    }
    out.foreach { case (q, d, overlap, agree, w, cum) =>
      assert(overlap == wantOverlap((q, d)),
        s"query $q depth $d: overlap $overlap != ${wantOverlap((q, d))}")
      assert(agree == overlap * 1000000L / d)
      assert(w == TextAnalysis.rboWeightE9(d.toInt))
    }
    // cumulative identity per query
    out.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      val cums = sorted.scanLeft(0L)((acc, r) => acc + r._4 * r._5).tail
      assert(sorted.map(_._6).toSeq === cums.toSeq)
    }
  }

  test("q275 lang-ID confusion: cells equal a regrouped q44 and rates " +
      "are the truncating window divisions") {
    val preds = TextAnalysis.langIdPredictions(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val want = preds.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val out = TextAnalysis.langIdConfusion(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.map(_._3).sum === preds.length.toLong)
    val rowTot = preds.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val colTot = preds.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    out.foreach { case (a, p, n, rt, ct, rr, cr) =>
      assert(n === want((a, p)))
      assert(rt === rowTot(a) && ct === colTot(p))
      assert(rr === n * 1000000L / rt && cr === n * 1000000L / ct)
    }
  }

  test("q276 Cohen's kappa: po/pe/kappa equal an in-JVM replication " +
      "from the q44 predictions") {
    val preds = TextAnalysis.langIdPredictions(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val n = preds.length.toLong
    val agree = preds.count { case (a, p) => a == p }.toLong
    val rt = preds.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val ct = preds.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val peNum = (rt.keySet ++ ct.keySet).toSeq
      .map(k => BigInt(rt.getOrElse(k, 0L)) * BigInt(ct.getOrElse(k, 0L)))
      .sum
    val po = agree * 1000000L / n
    val pe = (peNum * 1000000 / (BigInt(n) * BigInt(n))).toLong
    val kappa = (po - pe) * 1000000L / (1000000L - pe)
    val r = TextAnalysis.cohensKappa(spark, sf).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === ((n, agree, po, pe, kappa)))
  }

  test("q284 macro F1: per-class chain, predicted-only class row, and " +
      "the truncating macro means on a hand fixture") {
    import spark.implicits._
    val docs = Seq(
      ("the and of", "en"),  // en → en: correct
      ("the and of", "en"),  // en → en: correct
      ("xyz", "en"),         // en → und: en recall miss, und false pos
      ("le la et", "fr"),    // fr → fr: correct
      ("the and of", "fr"))  // fr → en: en precision miss, fr recall miss
      .toDF("text", "lang")
    val out = TextAnalysis.macroF1Core(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toList
    // en: actual 3, predicted 3, correct 2 → P = R = 666666, F1 = 666666
    // fr: actual 2, predicted 1, correct 1 → P 1e6, R 500000,
    //     F1 = 2·1e6·5e5 div 15e5 = 666666
    // und: actual 0, predicted 1, correct 0 → all 0 (zero-div rule)
    val macroP = (666666L + 1000000L + 0L) / 3
    assert(out === List(
      ("en", 3L, 3L, 2L, 666666L, 666666L, 666666L),
      ("fr", 2L, 1L, 1L, 1000000L, 500000L, 666666L),
      ("und", 0L, 1L, 0L, 0L, 0L, 0L),
      ("~macro", 5L, 5L, 3L, macroP, (666666L + 500000L) / 3,
        (666666L + 666666L) / 3)))
  }

  test("q291 gopher rules: each gate trips on its own violation, " +
      "clean doc keeps") {
    import spark.implicits._
    val clean = "the and of to is " + Seq.fill(50)("word").mkString(" ")
    val short = "the and just a few words here"
    val symbols = Seq.fill(50)("###").mkString(" ")
    val numeric = Seq.fill(50)("123").mkString(" ")
    val docs = Seq((1L, clean), (2L, short), (3L, symbols), (4L, numeric))
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherRulesCore(docs).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(6), r.getBoolean(7),
        r.getBoolean(8), r.getBoolean(9), r.getBoolean(10),
        r.getBoolean(11))).toMap
    // (wc, mwl, sym, alpha, stop, keep)
    assert(out(1L) === ((true, true, true, true, true, true)))
    assert(out(2L)._1 === false && out(2L)._6 === false)
    assert(out(3L)._3 === false && out(3L)._4 === false)
    assert(out(4L)._4 === false && out(4L)._5 === false
      && out(4L)._2 === true)
  }

  test("q305 gopher repetition: top-gram masses, duplicate-5-gram " +
      "coverage and thresholds on hand fixtures") {
    import spark.implicits._
    // doc 1: "aa bb aa bb aa" — top 2-gram ties at c=2/gc=4, g DESC
    //   picks "bb aa"; masses 8/12/8; no duplicated 5-gram
    // doc 2: 50 distinct 3-char tokens — all grams unique, tiny
    //   masses, every gate passes
    // doc 3: a repeated 5-token run (xx1..xx5) around 45 distinct
    //   fillers — top-gram gates sized to pass, dup5 coverage = 10
    //   positions x 3 chars = 30 of 165 > 0.15 → dup5 trips alone
    val doc2 = (0 until 50).map(i => f"t$i%02d").mkString(" ")
    val run = (1 to 5).map(i => s"xx$i")
    val doc3 = (run ++ (0 until 45).map(i => f"f$i%02d") ++ run)
      .mkString(" ")
    val docs = Seq((1L, "aa bb aa bb aa"), (2L, doc2), (3L, doc3))
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherRepetitionCore(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7),
        r.getBoolean(8), r.getBoolean(9), r.getBoolean(10),
        r.getBoolean(11)))).toMap
    assert(out(1L) === ((5L, 10L, 800000L, 1200000L, 800000L, 0L,
      false, false, false, true, false)))
    assert(out(2L) === ((50L, 150L, 40000L, 60000L, 80000L, 0L,
      true, true, true, true, true)))
    assert(out(3L) === ((55L, 165L, 72727L, 109090L, 145454L, 181818L,
      true, true, true, false, false)))
    // sub-n docs pass vacuously with mass 0 (the scaladoc contract):
    // r15 fix — sequence(1, greatest(0, size-n+1)) REVERSES to [1, 0]
    // for short docs and threw from slice(ws, 0, n); never fired on
    // the testdata corpora (no sub-4-word docs)
    val shorts = Seq((10L, "one"), (11L, "one two"), (12L, "one two three"),
        (13L, "one two three four"))
      .toDF("doc_id", "text")
    val so = TextAnalysis.gopherRepetitionCore(shorts).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4), r.getLong(5),
        r.getBoolean(11)))).toMap
    // (top2_ppm, top3_ppm, top4_ppm, keep): rule n is vacuous (ppm 0)
    // exactly where size < n; the 1-word doc passes everything, while
    // 2-4-word docs legitimately trip top-2 — their single most
    // frequent 2-gram IS most of the char mass even at count 1
    assert(so(10L) === ((0L, 0L, 0L, true)))
    assert(so(11L)._2 == 0L && so(11L)._3 == 0L && !so(11L)._4)
    assert(so(12L)._3 == 0L && !so(12L)._4)
    assert(!so(13L)._4)
  }

  test("q312 dup-line/paragraph gates: hand multiline fixtures trip " +
      "each rule; clean doc keeps") {
    import spark.implicits._
    val mdocs = Seq(
      // lines a,b,a,c → dup pair a: dup_lines 2/4, chars 2/4; paras
      // "a\nb","a\nc" distinct → para side clean
      (1L, "a\nb\n\na\nc"),
      // wall-to-wall repetition: lines 6/6 dup, paras 3/3 dup
      (2L, "aa\nbb\n\naa\nbb\n\naa\nbb"),
      // all grains distinct → keep
      (3L, "x1\nx2\n\nx3\nx4")
    ).toDF("mdoc_id", "text")
    val out = TextAnalysis.gopherDupLinesCore(mdocs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7),
        r.getBoolean(8), r.getBoolean(9), r.getBoolean(10),
        r.getBoolean(11)))).toMap
    // (n_lines, n_paras, line_ppm, para_ppm, line_char_ppm,
    //  para_char_ppm, line_ok, para_ok, line_char_ok, para_char_ok, keep)
    assert(out(1L) === ((4L, 2L, 500000L, 0L, 500000L, 0L,
      false, true, false, true, false)))
    assert(out(2L) === ((6L, 3L, 1000000L, 1000000L, 1000000L, 1000000L,
      false, false, false, false, false)))
    assert(out(3L) === ((4L, 2L, 0L, 0L, 0L, 0L,
      true, true, true, true, true)))
  }

  test("q312 derivation: content-addressed grouping, (text, doc_id) " +
      "member order, pair-paragraphs — replica over every bucket") {
    import spark.implicits._
    // four copies of one text (different ids, deliberately unordered)
    // plus two other texts; the replica recomputes every bucket from
    // first principles, so an md5 bucket collision cannot break it
    val members = Seq((9L, "t one"), (1L, "t one"), (7L, "t one"),
      (2L, "t one"), (3L, "u two"), (4L, "v three"))
    val got = TextAnalysis.multilineCorpus(
        members.toDF("doc_id", "text").withColumn("lang", lit("en")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def bucket(t: String): Long =
      (java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))(0) & 0xff).toLong
    val expected = members.groupBy(m => bucket(m._2)).map { case (b, ms) =>
      val ts = ms.sortBy(m => (m._2, m._1)).map(_._2)
      b -> ts.grouped(2).map(_.mkString("\n")).mkString("\n\n")
    }
    assert(got === expected)
    // the 4-copy text makes two identical paragraphs somewhere — the
    // grain the paragraph rules exist for
    val stats = TextAnalysis.gopherDupLinesCore(
      TextAnalysis.multilineCorpus(
        members.toDF("doc_id", "text").withColumn("lang", lit("en"))))
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(stats(bucket("t one")) > 0L, "dup_para_ppm must fire")
  }

  test("q312 on the corpus: every non-empty text is exactly one line " +
      "of exactly one derived multidoc") {
    val docs = graft.Tables.documents(spark, sf)
      .filter(col("text").isNotNull && col("text") =!= "")
    val nDocs = docs.count()
    val out = TextAnalysis.queries("q312_gopher_dup_lines")(spark, sf)
    assert(out.agg(sum("n_lines")).head().getLong(0) === nDocs)
  }

  test("q319 cross-doc line dedup: first occurrence (mdoc_id, pos) keeps, " +
      "all later instances corpus-wide are removed") {
    import spark.implicits._
    val mdocs = Seq(
      // lines a,b,(empty),a,c → the second 'a' is an IN-doc later
      // instance: removed. kept a,b,c → removed_chars 1 of 4
      (1L, "a\nb\n\na\nc"),
      // 'b' first occurred in doc 1 (cross-doc removal), 'd' is new
      (2L, "b\nd"),
      // all new → nothing removed
      (3L, "e")
    ).toDF("mdoc_id", "text")
    val out = TextAnalysis.ccnetLineDedupCore(mdocs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    // (n_lines, kept_lines, removed_chars, removed_char_ppm)
    assert(out(1L) === ((4L, 3L, 1L, 250000L)))
    assert(out(2L) === ((2L, 1L, 1L, 500000L)))
    assert(out(3L) === ((1L, 1L, 0L, 0L)))
  }

  test("q319 on the corpus: kept instances = distinct line contents, " +
      "the wrap preserves every word, and the rule genuinely fires") {
    val docs = graft.Tables.spread(graft.Tables.documents(spark, sf))
    val mdocs = TextAnalysis.wordWrapCorpus(docs)
    val lines = mdocs
      .select(explode(expr("filter(split(text, '\\n'), x -> x <> '')"))
        .as("line"))
    val distinctLines = lines.select("line").distinct().count()
    val out = TextAnalysis.queries("q319_ccnet_line_dedup")(spark, sf)
    val agg = out.agg(sum("kept_lines"), sum("n_lines")).head()
    assert(agg.getLong(0) === distinctLines,
      "every distinct content keeps exactly one instance")
    assert(agg.getLong(1) === lines.count())
    assert(agg.getLong(1) > agg.getLong(0),
      "no cross-doc duplicate lines at this sf — the gate is vacuous")
    // content preservation: the wrap drops no word
    val wrapWords = mdocs.select(explode(expr("split(text, '[ \\n]')"))
      .as("w")).filter(col("w") =!= "").count()
    val docWords = docs.filter(col("text").isNotNull)
      .select(explode(expr("filter(split(text, ' '), x -> x <> '')")))
      .count()
    assert(wrapWords === docWords)
  }

  test("q322 Zipf fit equals an independent plain-Scala OLS over the " +
      "collected frequency table, and the corpus slope is negative") {
    val docs = graft.Tables.spread(graft.Tables.documents(spark, sf))
    val freqs = docs.filter(col("text").isNotNull)
      .select(explode(expr("filter(split(text, ' '), x -> x <> '')"))
        .as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val ranked = freqs.sortBy { case (w, f) => (-f, w) }.zipWithIndex
      .map { case ((_, f), i) => (i + 1L, f) }
    val pts = ranked.map { case (rn, f) =>
      (math.log(rn.toDouble), math.log(f.toDouble)) }
    val n = pts.length.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val syy = pts.map(p => p._2 * p._2).sum
    val num = n * sxy - sx * sy
    val slope = num / (n * sxx - sx * sx)
    val r = TextAnalysis.queries("q322_zipf_fit")(spark, sf).head()
    assert(r.getLong(0) === freqs.length.toLong)
    assert(r.getLong(1) === freqs.map(_._2).sum)
    assert(math.abs(r.getDouble(2) - slope) < 1e-5, s"slope ${r.getDouble(2)} vs $slope")
    assert(math.abs(r.getDouble(3) - (sy - slope * sx) / n) < 1e-5)
    assert(math.abs(r.getDouble(4)
      - num * num / ((n * sxx - sx * sx) * (n * syy - sy * sy))) < 1e-5)
    assert(r.getDouble(2) < 0.0, "rank-frequency slope must be negative")
  }

  test("q316 CCNet buckets: start-offset thirds by token mass per " +
      "language — replica over the engine's own q196 scores") {
    import spark.implicits._
    // two languages; per-doc scores come from the shared corpus bigram
    // model (q196-gated arithmetic — the replica only re-derives the
    // NEW logic: ordering, mass thirds, rollup). Texts engineered so
    // scores differ (repetitive bigrams score high, unique ones low)
    // and 'b' has one doc heavy enough to cross the first boundary.
    val docs = Seq(
      (1L, "a", "x y x y x y x y"),                 // predictable → high
      (2L, "a", "p q r s t u v w"),                 // unique bigrams → low
      (3L, "a", "x y x y p q"),
      (4L, "a", "m n m n m n"),
      (5L, "b", ("x y " * 10).trim),                // heavy best doc
      (6L, "b", "g h i j"),
      (7L, "b", "k l x y"))
      .toDF("doc_id", "lang", "text")
    val got = TextAnalysis.ccnetBucketsCore(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    val scores = TextAnalysis.lmDocScoresCore(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val toks = docs.collect().map(r =>
      (r.getLong(0), r.getString(1),
        r.getString(2).split("\\s+").count(_.nonEmpty).toLong)).toSeq
    val expected = toks.groupBy(_._2).toSeq.flatMap { case (lang, ds) =>
      val ordered = ds.filter(d => scores.contains(d._1))
        .sortBy(d => (-scores(d._1), d._1))
      val tot = ordered.map(_._3).sum
      var cum = 0L
      val rows = ordered.map { case (id, _, n) =>
        val start = cum; cum += n
        val b = if (start * 3 < tot) "1_head"
          else if (start * 3 < 2 * tot) "2_middle" else "3_tail"
        (b, id, n)
      }
      rows.groupBy(_._1).toSeq.map { case (b, rs) =>
        (lang, b, rs.size.toLong, rs.map(_._3).sum,
          rs.map(_._3).sum * 1000000L / tot,
          rs.map(r => scores(r._2)).min, rs.map(r => scores(r._2)).max)
      }
    }.sortBy(e => (e._1, e._2))
    assert(got === expected, s"got $got vs $expected")
    // the fixture genuinely exercises all three buckets somewhere and
    // the first doc of each language is head
    assert(expected.count(_._2 == "1_head") == 2)
    assert(expected.exists(_._2 == "3_tail"))
  }

  test("q283 McNemar: the four paired cells and the discordant-only " +
      "statistic on a hand fixture") {
    import spark.implicits._
    val docs = Seq(
      ("the and of", "en"),    // heuristic en, baseline en → both right
      ("le la et", "fr"),      // heuristic fr, baseline wrong → heur only
      ("der die und", "de"),   // heuristic de, baseline wrong → heur only
      ("xyz qqq", "en"),       // heuristic und, baseline right → base only
      ("hola mundo", "es"))    // heuristic und, baseline wrong → both wrong
      .toDF("text", "lang")
    val r = TextAnalysis.mcnemarCore(docs).collect()(0)
    // (b-c)^2 * 1e6 div (b+c) = (2-1)^2 * 1e6 div 3
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === ((1L, 2L, 1L, 1L, 333333L)))
    // zero-discordant convention: statistic 0, not null/NaN
    val same = Seq(("the and of", "en"), ("xyz", "zz"))
      .toDF("text", "lang")
    // "xyz" → und ≠ zz (heur wrong) and zz ≠ en (base wrong): both wrong
    val r2 = TextAnalysis.mcnemarCore(same).collect()(0)
    assert((r2.getLong(1), r2.getLong(2), r2.getLong(4)) === ((0L, 0L, 0L)))
  }

  test("q247 levenshtein near-dups: planted edit found, cross-block " +
      "pair skipped by design") {
    import graft.ops.Dedup
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zetX"), // 1 edit, same block
      (3L, "alpha beta gamma delta epsilon zeta"), // exact dup of 1
      (4L, "omega beta gamma delta epsilon zeta"), // other block: missed
      (5L, "alpha beta " + ("q" * 200))            // same block, far
    ).toDF("doc_id", "text")
    val got = Dedup.levNearDupsCore(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 1L), (1L, 3L, 0L), (2L, 3L, 1L)))
  }

  test("q248 BPE encode: corpus token total reconciles with q236's " +
      "vocabulary token frequencies") {
    import graft.ops.CorpusPrep
    val enc = CorpusPrep.bpeEncodeStats(spark, sf).collect()
    assert(enc.nonEmpty)
    val encTotal = enc.map(_.getLong(2)).sum
    val segTotal = CorpusPrep.bpeSegmentStats(spark, sf).collect()
      .map(_.getLong(1)).sum
    assert(encTotal == segTotal,
      s"encode total $encTotal vs segment-stats total $segTotal")
    // ratio sanity: merges can only shorten, so chars+eow >= tokens
    enc.foreach(r => assert(r.getLong(3) >= 1000L))
  }

  test("q259 greedy coverage: marginal-gain trajectory on a fixture where " +
    "greedy diverges from size ranking, and exhaustion stops early") {
    import graft.ops.CorpusPrep
    // A={1,2,3,4} B={3,4,5} C={5,6} D={1,2}:
    //   round 1: A wins on gain 4
    //   round 2: B's marginal gain is {5}=1 but C's is {5,6}=2 → C wins,
    //     even though B is the bigger set (size ranking would pick B)
    //   round 3: every remaining doc has gain 0 → absent from the
    //     anti-joined counts → loop exhausts at 2 picks despite k=6
    val shRows = Seq(
      10L -> Seq("s1", "s2", "s3", "s4"), 20L -> Seq("s3", "s4", "s5"),
      30L -> Seq("s5", "s6"), 40L -> Seq("s1", "s2"))
      .flatMap { case (d, shs) => shs.map(sh => (d, sh)) }
      .toDF("doc_id", "sh")
    val out = CorpusPrep.greedyCoverageCore(shRows, k = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((1L, 10L, 4L, 4L), (2L, 30L, 2L, 6L)))
  }

  test("q266 vocab growth: first-seen types land in their min " +
    "checkpoint, cumulatives add up") {
    // ckpt 0 = docs 0,1 (stride 64); ckpt 1 = docs 64,65.
    // types a,b,c debut in ckpt 0; d,e in ckpt 1 (c recurs — not new).
    val docs = Seq(
      (0L, "a b"), (1L, "b c"), (64L, "c d d"), (65L, "e"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.vocabGrowthCore(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq === Seq(
      (0L, 2L, 4L, 3L, 4L, 3L),
      (1L, 2L, 4L, 2L, 8L, 5L)))
  }

  test("q267 importance scores: hand-computed two-cohort Laplace " +
    "ratios, integral per-doc means") {
    // model: x(c_t=2,c_r=1) y(1,0) z(0,1); N_t=3 N_r=2 V=3
    // r_ppm = (c_t+1)(N_r+V)·1e6 div ((c_r+1)(N_t+V)):
    //   x: 15e6 div 12 = 1250000; y: 10e6 div 6 = 1666666
    //   z:  5e6 div 12 =  416666
    val docs = Seq(
      (1L, "en", "x x y"), (2L, "de", "x z"))
      .toDF("doc_id", "lang", "text")
    val out = TextAnalysis.importanceScoresCore(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, "en", 3L, (1250000L + 1250000L + 1666666L) / 3),
      (2L, "de", 2L, (1250000L + 416666L) / 2)))
  }

  test("q260 packed offsets: hand-computed chop across the 128 boundary") {
    import graft.ops.CorpusPrep
    // doc1: 3 tok → seq 0 only; doc2: 130 tok from offset 3 → crosses
    // the 128 cut (seqs 0..1); doc3: 5 tok at 133 → seq 1 only.
    val docs = Seq(
      (1L, "a b c"),
      (2L, Seq.fill(130)("x").mkString(" ")),
      (3L, "p q r s t")).toDF("doc_id", "text")
    val out = CorpusPrep.packedOffsetsCore(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(out.toSeq === Seq(
      (1L, 3L, 0L, 0L, 0L, false),
      (2L, 130L, 3L, 0L, 1L, true),
      (3L, 5L, 133L, 1L, 1L, false)))
  }

  test("q263 length-bucket padding: sorted batching beats arrival on a " +
    "hand-computed 40-doc mix") {
    import graft.ops.CorpusPrep
    // lens cycle 2,3,4,5,1 (i%5+1 for i=1..40): sorted batch0 holds the
    // 32 shortest (1..4 ×8 each), batch1 the eight 5s — zero tail pad.
    val docs = (1 to 40).map(i =>
      (i.toLong, Seq.fill(i % 5 + 1)("w").mkString(" "))).toDF("doc_id", "text")
    val out = CorpusPrep.lengthBucketPaddingCore(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq === Seq(
      ("arrival", 0L, 32L, 5L, 95L, 65L),
      ("arrival", 1L, 8L, 5L, 25L, 15L),
      ("sorted", 0L, 32L, 4L, 80L, 48L),
      ("sorted", 1L, 8L, 5L, 40L, 0L)))
    // the claim the query exists to measure: sorted wastes strictly less
    val waste = out.groupBy(_._1).view.mapValues(_.map(_._6).sum).toMap
    assert(waste("sorted") < waste("arrival"))
  }

  test("q294 Krippendorff alpha: hand fixture with known rational " +
      "alpha, plus the q276-style in-JVM replica on the sf corpus") {
    import spark.implicits._
    // u1 agree(en), u2 disagree(en/fr), u3 agree(fr), u4 disagree(fr/en)
    // → N=4, disagree=2, pooled m_en = m_fr = 4, Σm² = 32;
    // De-num = 4·16 − 32 = 32, num' = 2·2·7 = 28 → alpha = 4/32
    val docs = Seq(
      ("the and of", "en"), ("le la et", "en"),
      ("le la et", "fr"), ("the and of", "fr")).toDF("text", "lang")
    val r = TextAnalysis.krippendorffCore(docs).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === ((4L, 2L, 500000L, 571428L, 125000L)))
    // corpus replica, independent arithmetic from the q44 predictions
    val preds = TextAnalysis.langIdPredictions(spark, sf).collect()
      .map(p => (p.getString(1), p.getString(2)))
    val n = preds.length.toLong
    val dis = preds.count { case (a, p) => a != p }.toLong
    val pooled = (preds.map(_._1) ++ preds.map(_._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val sumM2 = pooled.values.map(m => BigInt(m) * m).sum
    val deNum = BigInt(4) * n * n - sumM2
    val alpha = ((deNum - BigInt(2) * dis * (2 * n - 1)) * 1000000 / deNum)
      .toLong
    val c = TextAnalysis.krippendorffAlpha(spark, sf).collect()(0)
    assert((c.getLong(0), c.getLong(1)) === ((n, dis)))
    assert(c.getLong(2) === dis * 1000000L / n)
    assert(c.getLong(3) ===
      (deNum * 1000000 / (BigInt(2) * n * (2 * n - 1))).toLong)
    assert(c.getLong(4) === alpha)
  }

  test("q295 vocabulary richness: spectrum, integer Chao1 and " +
      "Good-Turing unseen mass on a hand fixture") {
    import spark.implicits._
    // tokens: a×3, b, c, d → n_tokens 6, types 4, f1 3, f2 0;
    // chao1 = 4 + 3·2 div (2·1) = 7; unseen = 3e6 div 6 = 500000
    val docs = Seq((1L, "a b a c"), (2L, "d a"), (3L, null))
      .toDF("doc_id", "text")
    val r = TextAnalysis.vocabRichnessCore(docs).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) === ((6L, 4L, 3L, 0L, 7L, 500000L)))
    // f2 path: e×2 alone → f1 0, f2 1, chao1 = types (0 correction)
    val docs2 = Seq((1L, "e e")).toDF("doc_id", "text")
    val r2 = TextAnalysis.vocabRichnessCore(docs2).collect()(0)
    assert((r2.getLong(0), r2.getLong(1), r2.getLong(2), r2.getLong(3),
      r2.getLong(4), r2.getLong(5)) === ((2L, 1L, 0L, 1L, 1L, 0L)))
  }

  test("q302 curation pipeline: every tier fires on a hand-built corpus " +
      "and the manifest matches an in-test replica") {
    import spark.implicits._
    // 60-word gopher-passing template: 2 stopwords + 58 7-char words
    def words(tag: String) =
      Seq("the", "and") ++ (1 to 58).map(i => f"$tag%sw$i%02d")
    val base = words("b")
    val texts = Seq(
      0L -> words("d0").mkString(" "),            // bench doc (0 % 97 = 0)
      1L -> base.mkString(" "),                   // survives (cluster rep)
      2L -> base.mkString(" "),                   // exact dup of 1 → dropped
      3L -> base.updated(31, "changedw").mkString(" "), // near dup → dropped
      4L -> "the and short",                      // gopher n_words < 50 → dropped
      // shares the consecutive triple (d0w10 d0w11 d0w12) with the
      // bench doc → contaminated → dropped
      5L -> (words("d5").take(30) ++ Seq("d0w10", "d0w11", "d0w12")
        ++ words("d5").drop(33)).mkString(" ")
    ) ++ (6L to 15L).map(i => i -> words(s"d$i").mkString(" "))
    val docs = texts.toDF("doc_id", "text").withColumn("lang", lit("en"))
      .select("doc_id", "lang", "text")
    val got = CorpusPrep.curationPipelineCore(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6))).toSeq
    // replica: survivors are 1 and 6..15, 60 tokens each; split by the
    // q59 nibble rule recomputed here from first principles; offsets a
    // per-split running sum in doc_id order; chop at 128
    def nibble(id: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:split".getBytes("UTF-8"))
      (d(0) & 0xf0) >>> 4
    }
    val survivors = (Seq(1L) ++ (6L to 15L)).sorted
    val expected = Seq("train", "eval").flatMap { sp =>
      var cum = 0L
      survivors.filter(id =>
          (if (nibble(id) < 14) "train" else "eval") == sp)
        .map { id =>
          cum += 60L
          val start = cum - 60L
          (id, sp, 60L, start, start / 128L, (cum - 1) / 128L,
            (cum - 1) / 128L > start / 128L)
        }
    }.sortBy(_._1)
    assert(got == expected, s"got $got")
    // the fixture genuinely exercises both splits and a chop boundary
    assert(expected.map(_._2).distinct.size == 2)
    assert(expected.exists(_._7), "some survivor must cross a boundary")
  }

  test("q311 scored pipeline: the repetition gate drops what q302's " +
      "battery keeps, the DSIR score rides the manifest, offsets " +
      "replicate") {
    import spark.implicits._
    def words(tag: String) =
      Seq("the", "and") ++ (1 to 58).map(i => f"$tag%sw$i%02d")
    val base = words("b")
    val texts = Seq(
      0L -> words("d0").mkString(" "),            // bench doc
      1L -> base.mkString(" "),                   // survives (cluster rep)
      2L -> base.mkString(" "),                   // exact dup → dropped
      3L -> base.updated(31, "changedw").mkString(" "), // near dup → dropped
      4L -> "the and short",                      // composition fail
      5L -> (words("d5").take(30) ++ Seq("d0w10", "d0w11", "d0w12")
        ++ words("d5").drop(33)).mkString(" "),   // contaminated
      // passes every q291 composition rule (60 words, mean len ~6.9,
      // no symbols, all-alpha, 2 distinct stopwords) but is
      // wall-to-wall ONE repeated 2-gram: top-2-gram mass 29·14 = 406
      // of sum_len 412 → 985436 ppm >> the 200000 gate. q305 drops
      // it; the composition battery alone would keep it — exactly the
      // regime the new tier exists for.
      16L -> (Seq("the", "and") ++
        Seq.fill(29)(Seq("aaaaaaa", "bbbbbbb")).flatten).mkString(" ")
    ) ++ (6L to 15L).map(i => i -> words(s"d$i").mkString(" "))
    val docs = texts.toDF("doc_id", "text").withColumn("lang", lit("en"))
      .select("doc_id", "lang", "text")
    val got = CorpusPrep.curationPipelineScoredCore(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7))).toSeq
    def nibble(id: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:split".getBytes("UTF-8"))
      (d(0) & 0xf0) >>> 4
    }
    val survivors = (Seq(1L) ++ (6L to 15L)).sorted
    val expected = Seq("train", "eval").flatMap { sp =>
      var cum = 0L
      survivors.filter(id =>
          (if (nibble(id) < 14) "train" else "eval") == sp)
        .map { id =>
          cum += 60L
          val start = cum - 60L
          // all-en fixture → every DSIR bucket's ratio is
          // (src+1)·10⁶ div (src+1) = exactly 1000000, so each
          // survivor's lr_mean_ppm is 1000000 (the ratio ARITHMETIC
          // on mixed languages is q307's own spec/oracle's job; this
          // pins the carry-through)
          (id, sp, 60L, 1000000L, start, start / 128L, (cum - 1) / 128L,
            (cum - 1) / 128L > start / 128L)
        }
    }.sortBy(_._1)
    assert(got == expected, s"got $got")
  }

  test("q332 manifest sample: bit-exact vs a plain-Scala DLT replica " +
      "over the engine's own scored survivors, τ is real, and the " +
      "subset-sum estimates bracket the exact split masses") {
    val docs = Tables.spread(Tables.documents(spark, sf))
      .filter(col("text").isNotNull)
      .select("doc_id", "lang", "text").localCheckpoint(true)
    val surv = CorpusPrep.scoredSurvivors(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val k = CorpusPrep.manifestSampleK
    assert(surv.size > k + 1, s"fixture too small for τ (${surv.size})")
    // replica: md5-derived 32-bit uniform + 1, priority = w·2³² / u,
    // top-k by (priority desc, id), τ = (k+1)-th, ŵ = max(w, τ)
    def u32(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:cursamp".getBytes("UTF-8"))
      val hex = d.take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) + 1L
    }
    val pri = surv.map { case (id, sp, w) =>
      (id, sp, w, (w * 4294967296L) / u32(id)) }
    val ranked = pri.sortBy { case (id, _, _, p) => (-p, id) }
    val tau = ranked.lift(k).map(_._4).getOrElse(0L)
    val expected = ranked.take(k)
      .groupBy(_._2).map { case (sp, rows) =>
        (sp, rows.size.toLong, rows.map(r => math.max(r._3, tau)).sum, tau)
      }.toSeq.sortBy(_._1)
    val got = CorpusPrep.manifestSampleEstimatesCore(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected, s"got $got vs $expected")
    assert(tau > 0L, "τ degenerate — the sample-everything path, not DLT")
    assert(got.map(_._1).toSet == Set("train", "eval"),
      "a split fell out of the sample; shrink k or regrow the fixture")
    // DLT subset-sum sanity: the deterministic draw's estimates sit
    // within a small factor of the exact masses (unbiasedness proper is
    // an expectation over u; this pins THIS draw didn't degenerate)
    val exact = surv.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    got.foreach { case (sp, _, est, _) =>
      val ex = exact(sp)
      assert(est >= ex / 3 && est <= ex * 3,
        s"$sp estimate $est vs exact $ex — outside the 3x sanity band")
    }
  }

  test("q311 pipeline plan: one corpus materialization — no parquet " +
      "scan below the checkpoint") {
    val df = CorpusPrep.queries("q311_curation_scored")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Scan parquet"),
      "a tier re-read the corpus from parquet instead of the checkpoint")
    val rows = df.collect()
    assert(rows.nonEmpty)
  }

  test("q302 pipeline plan: one corpus materialization — no parquet " +
      "scan below the checkpoint") {
    val df = CorpusPrep.queries("q302_curation_pipeline")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Scan parquet"),
      "a tier re-read the corpus from parquet instead of the checkpoint")
    // rows flow and every column of the manifest is populated
    val rows = df.collect()
    assert(rows.nonEmpty)
  }
}
