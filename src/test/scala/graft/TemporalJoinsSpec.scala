package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{TemporalJoins, TextAnalysis}

/** Semantics pins for the temporal-join surface (q36/q37) and TF-IDF
  * (q69) on hand-computed fixtures, plus the tie/edge cases the sf0.01
  * oracle run may never exercise.
  */
class TemporalJoinsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ev(rows: (Long, Long, Long, String, Double)*) =
    rows.toDF("event_id", "user_id", "tsu", "event_type", "value")

  test("as-of join matches each error to the latest click at-or-before it") {
    val out = TemporalJoins.asofCore(ev(
      (1L, 7L, 100L, "click", 1.0),
      (2L, 7L, 200L, "click", 2.0),
      (3L, 7L, 250L, "error", 0.0),   // → click 2 (tsu 200), gap 50
      (4L, 7L, 400L, "click", 4.0),
      (5L, 7L, 400L, "error", 0.0),   // same-µs click matches (inclusive)
      (6L, 8L, 500L, "error", 0.0),   // user 8 has no click → dropped
      (7L, 9L, 50L, "error", 0.0),    // precedes every click → dropped
      (8L, 9L, 60L, "click", 8.0)
    )).select("error_id", "click_id", "gap_us").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(out.toSeq === Seq((3L, 2L, 50L), (5L, 4L, 0L)))
  }

  test("as-of intra-µs click ties resolve to the highest event_id") {
    val out = TemporalJoins.asofCore(ev(
      (1L, 7L, 100L, "click", 1.0),
      (2L, 7L, 100L, "click", 2.0),   // same µs, higher id → the match
      (3L, 7L, 150L, "error", 0.0)
    )).select("click_id", "click_value").as[(Long, Double)].collect()
    assert(out.toSeq === Seq((2L, 2.0)))
  }

  test("as-of match fields are atomic when the latest click has a null value") {
    // id/tsu/value must all come from the SAME click row: with three
    // independent last(_, ignoreNulls) calls the null value would be
    // skipped and filled from the EARLIER click (round-7 advice)
    val df = Seq(
      (1L, 7L, 100L, "click", Some(1.5)),
      (2L, 7L, 200L, "click", None), // latest click, value null
      (3L, 7L, 300L, "error", Some(0.0))
    ).toDF("event_id", "user_id", "tsu", "event_type", "value")
    val out = TemporalJoins.asofCore(df)
      .select("click_id", "click_tsu", "click_value")
      .as[(Long, Long, Option[Double])].collect()
    assert(out.toSeq === Seq((2L, 200L, None)))
  }

  test("q191 nearest as-of: both directions, backward tie win, same-µs " +
    "backward, one-sided users, clickless errors drop") {
    val out = TemporalJoins.nearestCore(ev(
      // user 7: error 3 sits 50 after click 2 and 150 before click 4
      //   → backward (delta −50); error 5 sits 150 after click 4 and
      //   50 before click 6 → forward (delta +50)
      (1L, 7L, 100L, "click", 1.0),
      (2L, 7L, 200L, "click", 2.0),
      (3L, 7L, 250L, "error", 0.0),
      (4L, 7L, 400L, "click", 4.0),
      (5L, 7L, 550L, "error", 0.0),
      (6L, 7L, 600L, "click", 6.0),
      // user 8: EXACT distance tie (100 both ways) → backward wins
      (10L, 8L, 0L, "click", 0.0),
      (11L, 8L, 100L, "error", 0.0),
      (12L, 8L, 200L, "click", 0.0),
      // user 9: same-µs click counts as backward, delta 0 — even
      // though a nearer-than-anything forward click exists
      (20L, 9L, 300L, "click", 0.0),
      (21L, 9L, 300L, "error", 0.0),
      (22L, 9L, 301L, "click", 0.0),
      // user 10: only a FORWARD click exists → matched forward
      (30L, 10L, 500L, "error", 0.0),
      (31L, 10L, 900L, "click", 0.0),
      // user 11: no clicks at all → dropped
      (40L, 11L, 700L, "error", 0.0)
    )).select("error_id", "click_id", "delta_us")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq === Seq(
      (3L, 2L, -50L), (5L, 6L, 50L), (11L, 10L, -100L),
      (21L, 20L, 0L), (30L, 31L, 400L)))
  }

  test("range join counts only same-user clicks in [t-10min, t)") {
    val t0 = 1000000000L // arbitrary µs origin, NOT band-aligned
    val w = TemporalJoins.lookbackSeconds * 1000000L
    val out = TemporalJoins.rangeCore(ev(
      (1L, 7L, t0 - w, "click", 1.0),     // exactly window start: in
      (2L, 7L, t0 - w - 1, "click", 1.0), // one µs too early: out
      (3L, 7L, t0 - 1, "click", 2.5),     // in
      (4L, 7L, t0, "click", 9.0),         // same µs as purchase: out
      (5L, 7L, t0, "purchase", 0.0),
      (6L, 8L, t0 - 1, "click", 7.0),     // other user: out
      (7L, 8L, t0, "purchase", 0.0),      // only sees click 6
      (8L, 9L, t0, "purchase", 0.0)       // no clicks at all → 0 row kept
    )).select("purchase_id", "n_clicks", "click_total")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(out.toSeq === Seq((5L, 2L, 3.5), (7L, 1L, 7.0), (8L, 0L, 0.0)))
  }

  test("range join band blocking spans a window crossing a band boundary") {
    // purchase just after a band boundary; click just before it — they
    // sit in adjacent bands and must still pair via the band-1 probe
    val w = TemporalJoins.lookbackSeconds * 1000000L
    val out = TemporalJoins.rangeCore(ev(
      (1L, 7L, 3 * w - 1, "click", 5.0),
      (2L, 7L, 3 * w + 1, "purchase", 0.0)
    )).select("n_clicks").as[Long].collect()
    assert(out.toSeq === Seq(1L))
  }

  test("tf-idf ranks rare terms above common ones, ties break on term") {
    val docs = Seq(
      (1L, "aa bb rare"),
      (2L, "aa bb"),
      (3L, "aa cc cc")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfCore(docs, k = 2)
      .select("doc_id", "term", "tf", "df", "rank")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    // doc 1: rare df=1 wins; bb df=2 beats aa df=3
    assert(out.filter(_._1 == 1L).map(r => (r._2, r._5)) ===
      Seq(("rare", 1L), ("bb", 2L)))
    // doc 3: cc tf=2 df=1 wins over aa tf=1 df=3
    assert(out.filter(_._1 == 3L).map(r => (r._2, r._5)) ===
      Seq(("cc", 1L), ("aa", 2L)))
    // doc 2: bb (df 2) over aa (df 3) — same tf, rarer wins
    assert(out.filter(_._1 == 2L).map(r => (r._2, r._5)) ===
      Seq(("bb", 1L), ("aa", 2L)))
  }

  test("token concentration: hand-computed HHI and Gini") {
    // "aa aa bb": counts {aa:2, bb:1} → n=3, Σc²=5, hhi=5/9, gini=4/9;
    // "cc": degenerate single token → hhi=1, gini=0
    val docs = Seq((1L, "aa aa bb"), (2L, "cc")).toDF("doc_id", "text")
    val got = TextAnalysis.tokenConcentrationCore(docs)
      .select("doc_id", "n_tokens", "n_distinct", "sum_c2", "hhi", "gini")
      .as[(Long, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 3L, 2L, 5L, 0.555556, 0.444444)))
    assert(got(2L) === ((2L, 1L, 1L, 1L, 1.0, 0.0)))
  }

  test("pmi collocations: hand-computed ratios") {
    // "a b a b": bigrams {a b:2, b a:1}; "a c": {a c:1}
    // unigrams a:3 b:2 c:1, N=6
    //   a b: 2·6/(3·2) = 2.0    a c: 1·6/(3·1) = 2.0
    //   b a: 1·6/(2·3) = 1.0
    // order: (pmi desc, bigram asc) → a b, a c, b a; k=2 truncates
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = TextAnalysis.collocationsCore(docs, minCount = 1L, k = 100)
      .select("bigram", "c_xy", "c_x", "c_y", "n_tokens", "pmi_ratio")
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      ("a b", 2L, 3L, 2L, 6L, 2.0),
      ("a c", 1L, 3L, 1L, 6L, 2.0),
      ("b a", 1L, 2L, 3L, 6L, 1.0)))
    assert(TextAnalysis.collocationsCore(docs, 1L, 2).count() === 2)
    // minCount prunes before the joins
    assert(TextAnalysis.collocationsCore(docs, 2L, 100)
      .select("bigram").as[String].collect().toSeq === Seq("a b"))
  }

  test("inverted index: distinct postings, shard split, sorted lists") {
    // doc 1 repeats 'a' (postings are doc-distinct); doc 300 crosses
    // the 256-wide shard boundary
    val docs = Seq((1L, "a b a"), (2L, "b"), (300L, "a"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.invertedIndexCore(docs, shardSize = 256L)
      .as[(String, Long, Long, String)].collect().toSeq
    assert(got === Seq(
      ("a", 0L, 1L, "1"), ("a", 1L, 1L, "300"), ("b", 0L, 2L, "1,2")))
  }

  test("tf-idf float epilogue computes tf·ln(N/df) over the exact columns") {
    val docs = Seq(
      (1L, "aa bb rare"),
      (2L, "aa bb"),
      (3L, "aa cc cc")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfWeighted(TextAnalysis.tfidfCore(docs), nDocs = 3L)
      .select("doc_id", "term", "tfidf")
      .as[(Long, String, Double)].collect()
      .map { case (d, t, w) => (d, t) -> w }.toMap
    // hand-computed tf · ln(3/df), to a 1-ulp tolerance — the engine's
    // codegen'd log differs from math.log in the last bit on some
    // inputs, which is exactly why the REGISTERED q69 stays integer
    def approx(got: Double, want: Double): Boolean = math.abs(got - want) < 1e-14
    assert(approx(out((1L, "rare")), 1.0 * math.log(3.0 / 1.0)))
    assert(approx(out((1L, "bb")), 1.0 * math.log(3.0 / 2.0)))
    assert(approx(out((3L, "cc")), 2.0 * math.log(3.0 / 1.0)))
    assert(out((3L, "aa")) === 0.0) // ln(3/3) is exactly 0 in both
  }

  test("rolling 1h RANGE frame: inclusive boundary, intra-µs peers, per-user") {
    val h = TemporalJoins.rollingWindowUs
    val out = TemporalJoins.rollingCore(ev(
      (1L, 7L, 1000L, "view", 1.0),
      (2L, 7L, 1000L + h, "view", 2.0),      // exactly 1h after 1 → includes it
      (3L, 7L, 1000L + h + h + 1, "view", 4.0), // >1h after 2 → alone
      (4L, 8L, 1000L + h, "view", 8.0),      // other user, same µs as 2
      (5L, 8L, 1000L + h, "view", 16.0)      // intra-µs peer of 4: both see both
    )).select("event_id", "n_trailing_1h", "sum_trailing_1h")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(out.toSeq === Seq(
      (1L, 1L, 1.0), (2L, 2L, 3.0), (3L, 1L, 4.0),
      (4L, 2L, 24.0), (5L, 2L, 24.0)))
  }

  test("hot-key-safe rolling window equals the RANGE frame on a hot key") {
    // one bot-like user: 5000 events packed inside a single window
    // width (the density regime where the RANGE frame is O(k·w)) plus a
    // sparse second user as control. The prefix-sum formulation must
    // reproduce the frame's output exactly, including intra-µs peers
    // (every 10th event shares a timestamp) and the inclusive left edge.
    val h = TemporalJoins.rollingWindowUs
    val hot = (0 until 5000).map { i =>
      (i.toLong, 7L, 1000L + (i / 10).toLong * (h / 600), "view", (i % 7) / 4.0)
    }
    val sparse = Seq(
      (9000L, 8L, 500L, "view", 1.5),
      (9001L, 8L, 500L + h, "view", 2.5),      // exactly 1h later: includes 9000
      (9002L, 8L, 500L + 2 * h + 1, "view", 4.0)) // alone
    val df = ev((hot ++ sparse): _*)
    val want = TemporalJoins.rollingCore(df)
      .select("event_id", "n_trailing_1h", "sum_trailing_1h")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    val got = TemporalJoins.rollingCoreScalable(df)
      .select("event_id", "n_trailing_1h", "sum_trailing_1h")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(got.length === 5003)
    assert(got.toSeq === want.toSeq)
  }

  test("property: hot-key-safe rolling window matches the RANGE frame (incl. null values)") {
    val h = TemporalJoins.rollingWindowUs
    // ticks quantized to h/4 so boundary hits (exactly h apart, h+1
    // apart, intra-µs ties) occur constantly; ~1 in 4 values is NULL so
    // all-null frames appear — the RANGE sum is NULL there, and the
    // prefix-sum formulation must reproduce that, not emit 0 (round-8
    // review: a bare cum-difference diverges the moment a user has any
    // earlier non-null value)
    val evGen = Gen.choose(1, 60).flatMap { n =>
      Gen.listOfN(n, for {
        u <- Gen.choose(1L, 3L)
        tick <- Gen.choose(0L, 16L)
        v <- Gen.choose(0, 40)
        isNull <- Gen.frequency(3 -> false, 1 -> true)
      } yield (u, tick * (h / 4), if (isNull) None else Some(v / 4.0)))
        .map(_.zipWithIndex.map { case ((u, t, v), i) => (i.toLong, u, t, v) })
    }
    val prop = Prop.forAll(evGen) { rows =>
      val df = rows.toDF("event_id", "user_id", "tsu", "value")
        .withColumn("event_type", lit("view"))
      val cols = Seq("event_id", "user_id", "tsu", "n_trailing_1h",
        "sum_trailing_1h")
      val want = TemporalJoins.rollingCore(df)
        .select(cols.head, cols.tail: _*)
        .as[(Long, Long, Long, Long, Option[Double])].collect().toSet
      val got = TemporalJoins.rollingCoreScalable(df)
        .select(cols.head, cols.tail: _*)
        .as[(Long, Long, Long, Long, Option[Double])].collect().toSet
      got == want
    }
    assert(SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop).passed)
  }

  test("pivot matrix round-trips through unpivot with explicit zero cells") {
    import graft.ops.Relational
    val wide = Relational.queries("q38_event_type_pivot")(spark, sf)
    val long = Relational.queries("q39_event_type_unpivot")(spark, sf)
    val users = wide.count()
    // every user × all 5 types present in the long form
    assert(long.count() === users * 5)
    // unpivot's nonzero cells == the direct groupBy counts
    val direct = Tables.events(spark, sf)
      .groupBy("user_id", "event_type").count()
      .as[(Long, String, Long)].collect().toSet
    val nonzero = long.filter(col("n") > 0)
      .as[(Long, String, Long)].collect().toSet
    assert(nonzero === direct)
    // pivot's n_total is the row-sum of the five cells
    val bad = wide.filter(
      col("n_total") =!= col("click") + col("error") + col("purchase")
        + col("signup") + col("view")).count()
    assert(bad === 0L)
  }

  test("property: as-of and range join match brute-force quadratic references") {
    val W = TemporalJoins.lookbackSeconds * 1000000L
    // timeline quantized to W/4 so window boundaries and band crossings
    // are hit constantly, and a tiny (user × tick) domain forces
    // intra-µs ties — the cases the engine's sort/band machinery must
    // get right and random microsecond data never produces
    val evGen = Gen.choose(1, 50).flatMap { n =>
      Gen.listOfN(n, for {
        u <- Gen.choose(1L, 3L)
        tick <- Gen.choose(0L, 40L)
        tpe <- Gen.oneOf("click", "error", "purchase", "view")
        v <- Gen.choose(0, 40)
      } yield (u, tick * (W / 4), tpe, v / 4.0))
        .map(_.zipWithIndex.map { case ((u, t, tp, v), i) =>
          (i.toLong, u, t, tp, v)
        })
    }
    val prop = Prop.forAll(evGen) { rows =>
      val df = ev(rows: _*)
      val clicks = rows.filter(_._4 == "click")

      val asofGot = TemporalJoins.asofCore(df)
        .select("error_id", "click_id", "gap_us")
        .as[(Long, Long, Long)].collect().toSet
      val asofWant = rows.filter(_._4 == "error").flatMap { e =>
        val pre = clicks.filter(c => c._2 == e._2 && c._3 <= e._3)
        if (pre.isEmpty) None
        else {
          val m = pre.maxBy(c => (c._3, c._1))
          Some((e._1, m._1, e._3 - m._3))
        }
      }.toSet

      val rangeGot = TemporalJoins.rangeCore(df)
        .select("purchase_id", "n_clicks", "click_total")
        .as[(Long, Long, Double)].collect().toSet
      val rangeWant = rows.filter(_._4 == "purchase").map { p =>
        val in = clicks.filter(c =>
          c._2 == p._2 && c._3 >= p._3 - W && c._3 < p._3)
        (p._1, in.size.toLong,
          in.map(c => BigDecimal(c._5)).sum.toDouble)
      }.toSet

      asofGot == asofWant && rangeGot == rangeWant
    }
    assert(SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop).passed)
  }

  test("locf gap-fill: carries latest prior observation, leading gaps stay unfilled") {
    val df = Seq(
      (1L, 7L, 100L, Some(1.5)),
      (2L, 7L, 200L, None),        // → 1.5 from event 1
      (3L, 7L, 300L, None),        // gap run: still 1.5 from event 1
      (4L, 7L, 400L, Some(4.0)),
      (5L, 7L, 500L, None),        // → 4.0 from event 4
      (6L, 8L, 50L, None),         // leading gap, no prior obs → unfilled
      (7L, 8L, 600L, Some(7.0)),
      (8L, 8L, 600L, None)         // same-µs tie: event_id order → 7.0
    ).toDF("event_id", "user_id", "tsu", "v_obs")
    val out = TemporalJoins.locfCore(df)
      .select("event_id", "is_gap", "has_fill", "v_filled", "fill_src")
      .as[(Long, Boolean, Boolean, Double, Long)].collect().toSeq
    assert(out === Seq(
      (1L, false, true, 1.5, 1L),
      (2L, true, true, 1.5, 1L),
      (3L, true, true, 1.5, 1L),
      (4L, false, true, 4.0, 4L),
      (5L, true, true, 4.0, 4L),
      (6L, true, false, 0.0, -1L),
      (7L, false, true, 7.0, 7L),
      (8L, true, true, 7.0, 7L)))
  }

  test("locf plan is one window over user_id: single exchange, no join") {
    val plan = TemporalJoins.locfGapFill(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "locf must not plan a join")
    assert(plan.contains("Window"))
    assert(plan.split("Exchange hashpartitioning").length <= 3,
      "at most the window exchange plus final sort: " + plan.take(400))
  }

  test("as-of plan is window-based: one exchange, no join node") {
    val plan = TemporalJoins.asofErrorClicks(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "as-of must not plan a join")
    assert(plan.contains("Window"))
  }

  test("q249 interval overlap equals an in-JVM brute force over the " +
      "same sessions and replayed maintenance windows") {
    val dayUs = 86400L * 1000000L
    val cellUs = 3600L * 1000000L
    val ev = graft.Tables.eventsMicros(spark, sf)
    val sess = graft.ops.Sessionization.sessionBounds(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def h22(day: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$day:mw".getBytes("UTF-8"))
      val hex = md.take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 22
    }
    val wins = ev.select(expr(s"tsu div $dayUs").as("day")).distinct()
      .collect().map(_.getLong(0))
      .map(d => (d, d * dayUs + h22(d) * cellUs,
        d * dayUs + h22(d) * cellUs + 2 * cellUs))
    val want = (for {
      (u, sid, s, e) <- sess; (d, ws, we) <- wins
      ov = math.min(e, we) - math.max(s, ws) if ov > 0
    } yield (u, sid, d, ov)).toSet
    val got = TemporalJoins.intervalOverlapJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
    assert(got.nonEmpty, "fixture must exercise overlaps")
  }
}
