package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Behavior

/** Semantics pins for funnel (q76) and cohort retention (q77): the
  * ordering rules (a click BEFORE signup does not advance the funnel)
  * and the first-active-day cohort arithmetic, on hand-computed
  * fixtures.
  */
class BehaviorSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ev(rows: (Long, Long, String)*) =
    rows.zipWithIndex
      .map { case ((u, t, tp), i) => (i.toLong, u, t, tp) }
      .toDF("event_id", "user_id", "tsu", "event_type")

  test("hourly anomaly: trailing-mean fence, RANGE gaps, cold start") {
    val hourUs = 3600000000L
    // hour 0: 10 events (cold start, no baseline → never a spike)
    // hours 1..24: 1 event each (quiet baseline)
    // hour 25: 10 events — baseline = hours 1..24 (hour 0 aged out):
    //   10·24 > 2·24 → spike
    // hour 30 after a 4-hour GAP: baseline must be the 20 present
    //   hours in (6..29), not a shifted ROWS frame
    val rows = (1 to 10).map(i => (1L, i * 1000L, "view")) ++
      (1 to 24).map(h => (1L, h * hourUs + 5, "view")) ++
      (1 to 10).map(i => (1L, 25 * hourUs + i * 1000L, "view")) ++
      (1 to 10).map(i => (1L, 30 * hourUs + i * 1000L, "view"))
    val out = graft.ops.Behavior.hourlyAnomalyCore(ev(rows: _*))
      .select("hour", "n", "prev_hours", "prev_sum", "is_spike")
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(0L) === ((0L, 10L, 0L, 0L, false)))      // no history
    assert(out(1L) === ((1L, 1L, 1L, 10L, false)))      // quiet after burst
    assert(out(25L) === ((25L, 10L, 24L, 24L, true)))   // clean spike
    // hour 30's lookback covers hours 6..29: hours 6..24 (19 quiet) +
    // hour 25 (10 events) = 20 present hours, 29 events: 10·20 > 2·29 → spike
    assert(out(30L) === ((30L, 10L, 20L, 29L, true)))
  }

  test("funnel: steps must be ordered; pre-signup activity never counts") {
    val out = Behavior.funnelCore(ev(
      // user 1: full ordered funnel
      (1L, 100L, "signup"), (1L, 200L, "click"), (1L, 300L, "purchase"),
      // user 2: click BEFORE signup, purchase after — stuck at stage 1
      // (no click at-or-after signup, so the later purchase can't count)
      (2L, 100L, "click"), (2L, 200L, "signup"), (2L, 300L, "purchase"),
      // user 3: purchase between signup and click — stage 2 only
      (3L, 100L, "signup"), (3L, 200L, "purchase"), (3L, 300L, "click"),
      // user 4: same-µs signup+click (inclusive >=), no purchase
      (4L, 100L, "signup"), (4L, 100L, "click"),
      // user 5: never signed up — not in the funnel at all
      (5L, 100L, "click"), (5L, 200L, "purchase")
    )).select("user_id", "stage").as[(Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq === Seq((1L, 3L), (2L, 1L), (3L, 2L), (4L, 2L)))
  }

  test("funnel: first qualifying timestamps are the minima") {
    val out = Behavior.funnelCore(ev(
      (1L, 100L, "signup"), (1L, 50L, "signup"),     // first signup = 50
      (1L, 60L, "click"), (1L, 80L, "click"),        // first click ≥ 50 = 60
      (1L, 70L, "purchase"), (1L, 90L, "purchase")   // first purchase ≥ 60 = 70
    )).select("signup_tsu", "click_tsu", "purchase_tsu")
      .as[(Long, Long, Long)].collect()
    assert(out.toSeq === Seq((50L, 60L, 70L)))
  }

  test("property: funnel matches a brute-force sequential-scan reference") {
    val evGen = Gen.choose(1, 40).flatMap { n =>
      Gen.listOfN(n, for {
        u <- Gen.choose(1L, 3L)
        t <- Gen.choose(0L, 12L) // tiny tick domain → constant ties
        tp <- Gen.oneOf("signup", "click", "purchase", "view")
      } yield (u, t, tp))
    }
    val prop = Prop.forAll(evGen) { rows =>
      val got = Behavior.funnelCore(ev(rows: _*))
        .select("user_id", "stage").as[(Long, Long)].collect().toMap
      val want = rows.groupBy(_._1).flatMap { case (u, es) =>
        val s1 = es.filter(_._3 == "signup").map(_._2).minOption
        s1.map { s =>
          val c = es.filter(e => e._3 == "click" && e._2 >= s).map(_._2).minOption
          val p = c.flatMap(ct =>
            es.filter(e => e._3 == "purchase" && e._2 >= ct).map(_._2).minOption)
          u -> (1L + c.size + p.size)
        }
      }
      got == want
    }
    assert(SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop).passed)
  }

  test("property: N-stage funnel matches brute force over random stage lists") {
    // random stage count (1-4) drawn from a pool of six types, random
    // event stream over the same pool — the generalized core must agree
    // with a sequential chained-minOption reference for EVERY stage list,
    // including single-stage and 4-deep funnels
    val types = Vector("a", "b", "c", "d", "e", "f")
    val caseGen = for {
      nStages <- Gen.choose(1, 4)
      picked <- Gen.pick(nStages, types)
      // Gen.pick preserves pool order; a seeded shuffle makes the stage
      // ORDER itself random (order is the semantics under test)
      seed <- Gen.choose(0, 1 << 20)
      stages = new scala.util.Random(seed).shuffle(picked.toList)
      n <- Gen.choose(1, 40)
      rows <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 3L)
        t <- Gen.choose(0L, 12L)
        tp <- Gen.oneOf(types)
      } yield (u, t, tp))
    } yield (stages, rows)
    val prop = Prop.forAll(caseGen) { case (stages, rows) =>
      val got = Behavior.funnelCore(ev(rows: _*), stages)
        .select("user_id", "stage").as[(Long, Long)].collect().toMap
      val want = rows.groupBy(_._1).flatMap { case (u, es) =>
        val hits = stages.scanLeft(Option(Long.MinValue)) { (prev, st) =>
          prev.flatMap(p =>
            es.filter(e => e._3 == st && e._2 >= p).map(_._2).minOption)
        }.tail
        hits.head.map(_ => u -> hits.takeWhile(_.isDefined).size.toLong)
      }
      got == want
    }
    assert(SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop).passed)
  }

  test("co-engagement: hand-computed Jaccard, zero-overlap pairs absent") {
    // A={1,2,3}, B={1,2,4}, C={4}: (a,b) → 2/4, (b,c) → 1/3, (a,c) → ∅
    val ut = Seq(
      (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a"), (4L, "b"), (4L, "c"),
      (1L, "a")) // duplicate engagement rows collapse
      .toDF("user_id", "event_type")
    val got = graft.ops.Behavior.coEngagementCore(ut)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      ("a", "b", 3L, 3L, 2L, 0.5),
      ("b", "c", 3L, 1L, 1L, 0.333333)))
  }

  test("activity heatmap: known timestamps land on the right (dow, hour) cell") {
    import spark.implicits._
    val day = 86400000000L
    // THROUGH the shipped query chain, not re-derived arithmetic:
    // 1970-01-01 (day 0, a Thursday) 00:30 → dow 3 hour 0;
    // 2024-01-01 (day 19723, a Monday) 12:05 → dow 0 hour 12;
    // 2024-01-06 (a Saturday) 23:59 → dow 5 hour 23
    val ev = Seq(
      (1L, 30L * 60000000L),
      (2L, 19723L * day + 12L * 3600000000L + 5L * 60000000L),
      (3L, 19728L * day + 23L * 3600000000L + 59L * 60000000L))
      .toDF("user_id", "tsu")
    val got = graft.ops.Behavior.heatmapCore(ev)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((0L, 12L, 1L, 1L), (3L, 0L, 1L, 1L), (5L, 23L, 1L, 1L)))

    val out = graft.ops.Behavior.queries("q120_activity_heatmap")(spark, sf)
      .collect()
    assert(out.nonEmpty && out.length <= 168)
    out.foreach { r =>
      val (dow, hour) = (r.getLong(0), r.getLong(1))
      assert(dow >= 0 && dow <= 6 && hour >= 0 && hour <= 23)
      assert(r.getLong(3) <= r.getLong(2)) // n_users ≤ n_events
    }
  }

  test("event transitions: per-user consecutive pairs, deterministic intra-µs order") {
    import spark.implicits._
    val df = Seq(
      // user 1 timeline: a → b → b; intra-µs tie at t=200 orders by
      // event_id (2 before 3), so the pair set is (a,b),(b,b)
      (1L, 1L, 100L, "a"), (2L, 1L, 200L, "b"), (3L, 1L, 200L, "b"),
      // user 2: b → a; no cross-user pair with user 1
      (4L, 2L, 100L, "b"), (5L, 2L, 150L, "a"),
      // user 3: single event → no pairs
      (6L, 3L, 100L, "a")
    ).toDF("event_id", "user_id", "tsu", "event_type")
      .select("user_id", "tsu", "event_id", "event_type")
    val out = Behavior.transitionsCore(df)
      .select("from_type", "to_type", "n_transitions", "p")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out === Seq(
      ("a", "b", 1L, 1.0),
      ("b", "a", 1L, 0.5),
      ("b", "b", 1L, 0.5)))
  }

  test("sliding active users: each event covers exactly width/slide windows") {
    import org.apache.spark.sql.functions._
    // batch-side brute force over the real sf data: for each emitted
    // window, the distinct users whose tsu lies in [ws, ws+1h) must
    // match — including windows that only overlap the data's edges
    val S = Behavior.slideUs
    val W = Behavior.slideWindowUs
    val got = Behavior.queries("q108_sliding_active_users")(spark, sf)
      .as[(Long, Long)].collect().toMap
    val ev = Tables.eventsMicros(spark, sf)
      .select("user_id", "tsu").as[(Long, Long)].collect()
    val want = ev.flatMap { case (u, t) =>
      val s0 = t / S
      (0 until (W / S).toInt).map(k => ((s0 - k) * S, u))
    }.distinct.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    assert(got == want)
    // geometry: every window start is slide-aligned and spans are dense
    assert(got.keys.forall(_ % S == 0))
  }

  test("cohort retention: offsets count distinct active users per cohort") {
    val d = 86400000000L
    val out = Behavior.cohortCore(ev(
      // cohort day 0: users 1,2. day 1: user 1 active twice (counts once)
      (1L, 10L, "view"), (2L, 20L, "view"),
      (1L, d + 1, "view"), (1L, d + 2, "click"),
      (2L, 2 * d, "view"),
      // cohort day 1: user 3
      (3L, d + 5, "view"), (3L, 2 * d, "view")
    )).select("cohort_day", "day_offset", "n_users")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (0L, 0L, 2L), (0L, 1L, 1L), (0L, 2L, 1L),
      (1L, 0L, 1L), (1L, 1L, 1L)))
  }

  test("q159 ab experiment: deterministic arms, funnel gate, exact ppm arithmetic") {
    val s = spark
    import s.implicits._
    // reference arm assignment, independently computed from the md5 hex
    def armOf(u: Long): String = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$u:arm".getBytes("UTF-8")).map("%02x".format(_)).mkString
      if (Integer.parseInt(hex.take(1), 16) < 8) "control" else "treatment"
    }
    // 40 signup users; even ones purchase AFTER signup (converted);
    // user 1 purchases only BEFORE signup (funnel gate must reject);
    // user 99 purchases but never signed up (not in the experiment)
    val rows = (1L to 40L).map(u => (u, "signup", 100L)) ++
      (2L to 40L by 2).map(u => (u, "purchase", 200L)) ++
      Seq((1L, "purchase", 50L), (99L, "purchase", 300L))
    val r = Behavior.abExperimentCore(
      rows.toDF("user_id", "event_type", "tsu")).collect().head
    val byArm = (1L to 40L).groupBy(armOf)
    val (nc, nt) = (byArm.getOrElse("control", Nil).size.toLong,
      byArm.getOrElse("treatment", Nil).size.toLong)
    val cc = byArm.getOrElse("control", Nil).count(_ % 2 == 0).toLong
    val ct = byArm.getOrElse("treatment", Nil).count(_ % 2 == 0).toLong
    assert(r.getAs[Long]("n_signup_control") == nc)
    assert(r.getAs[Long]("n_signup_treatment") == nt)
    assert(r.getAs[Long]("n_conv_control") == cc)
    assert(r.getAs[Long]("n_conv_treatment") == ct)
    // both arms populated on this fixture (determinism means this can't flake)
    assert(nc > 0 && nt > 0)
    val ccPpm = cc * 1000000L / nc
    val ctPpm = ct * 1000000L / nt
    assert(r.getAs[Long]("conv_control_ppm") == ccPpm)
    assert(r.getAs[Long]("conv_treatment_ppm") == ctPpm)
    // lift is computed from RAW counts (one exact division), not from
    // the two already-floored ppm ratios
    if (cc == 0) assert(r.isNullAt(r.fieldIndex("lift_ppm")))
    else assert(r.getAs[Long]("lift_ppm") ==
      (BigInt(ct) * nc * 1000000 / (BigInt(cc) * nt)).toLong)
  }

  test("q163 conversion latency: per-segment exact percentile picks on a hand fixture") {
    val s = spark
    import s.implicits._
    // u1→delay 10, u2→20 (first of two purchases), u3 only pre-signup
    // (never converts), u4→40 in its own segment
    val ev = Seq(
      (1L, "signup", 100L), (2L, "signup", 100L), (3L, "signup", 100L),
      (4L, "signup", 100L),
      (1L, "purchase", 110L),
      (2L, "purchase", 120L), (2L, "purchase", 130L),
      (3L, "purchase", 50L),
      (4L, "purchase", 140L)).toDF("user_id", "event_type", "tsu")
    val cust = Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "B"))
      .toDF("c_custkey", "c_mktsegment")
    val out = Behavior.conversionLatencyCore(ev, cust).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.size == 2)
    // A: delays {10, 20} → p50 = 10 (cume 0.5 exactly), p90 = p99 = 20
    val a = out("A")
    assert(a.getLong(4) == 2 && a.getLong(1) == 10L
      && a.getLong(2) == 20L && a.getLong(3) == 20L)
    // B: one delay, every percentile is it
    val b = out("B")
    assert(b.getLong(4) == 1 && b.getLong(1) == 40L && b.getLong(3) == 40L)
  }

  test("q185 ewma: hand-computed 8-term weighted sums, short-history " +
    "normalization, audit stride") {
    // user 1: values 1..14 → audit rows at rn 7 and 14.
    //   rn 7 has only 7 terms (weights 128..2, den 254):
    //     Σ w·v = (128·7+64·6+32·5+16·4+8·3+4·2+2·1)·1000 = 1538000
    //     → 1538000 div 254 = 6055 (truncated)
    //   rn 14 has the full 8 (den 255): Σ = 3323000 → 13031
    // user 2: constant 2.5 → ewma is exactly 2500 whatever the depth
    val rows =
      (1 to 14).map(i => (i.toLong, 1L, i * 10L, i.toDouble)) ++
        (1 to 7).map(i => (100L + i, 2L, i * 10L, 2.5))
    val out = Behavior.ewmaCore(
      rows.toDF("event_id", "user_id", "tsu", "value"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 7L, 7000L, 6055L),
      (1L, 14L, 14000L, 13031L),
      (2L, 107L, 2500L, 2500L)))
  }

  test("q190 twap: hold-duration weighting, zero-weight same-µs ties, " +
    "single-observation users drop") {
    // user 1: 1.0 held 10µs, 3.0 held 20µs, 5.0 terminal (no hold)
    //   → (1000·10 + 3000·20) div 30 = 2333
    // user 2: 2.0 and 4.0 at the SAME µs (ids 4 < 5 order them; the
    //   first hold is 0µs → zero weight), then 6.0 terminal
    //   → (2000·0 + 4000·10) div 10 = 4000
    // user 3: one observation → no hold interval, drops
    val rows = Seq(
      (1L, 1L, 0L, 1.0), (2L, 1L, 10L, 3.0), (3L, 1L, 30L, 5.0),
      (4L, 2L, 5L, 2.0), (5L, 2L, 5L, 4.0), (6L, 2L, 15L, 6.0),
      (7L, 3L, 100L, 9.0))
    val out = Behavior.twapCore(
      rows.toDF("event_id", "user_id", "tsu", "value"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 2L, 30L, 2333L), (2L, 2L, 10L, 4000L)))
  }

  test("q192 calendar spine: zero days materialize for every type over " +
    "the global bounds") {
    val D = Behavior.dayUs2
    // observed: a on days 0 and 2, b on day 1 only → spine covers days
    // 0..2 for BOTH types; four of the six cells are zero-filled
    val rows = Seq(
      (1L, 1L, 0L, "a"), (2L, 1L, 2 * D, "a"), (3L, 2L, D, "b"),
      (4L, 2L, D + 5L, "b"))
    val out = Behavior.spineCore(
      rows.toDF("event_id", "user_id", "tsu", "event_type"))
      .as[(String, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("a", 0L, 1L), ("a", 1L, 0L), ("a", 2L, 1L),
      ("b", 0L, 0L), ("b", 1L, 2L), ("b", 2L, 0L)))
  }

  test("q207 activity streaks: islands split on gaps, repeat events " +
    "collapse, longest-streak tie takes the earliest start") {
    val D = Behavior.dayUs2
    def day(u: Long, d: Long, n: Int = 1): Seq[(Long, Long, String)] =
      (1 to n).map(i => (u, d * D + i * 1000L, "view"))
    val rows =
      // user 1: days 1-3, 5, 10-11 → streaks (1..3),(5),(10..11);
      // day 2 has THREE events — must still count as one active day
      day(1, 1) ++ day(1, 2, 3) ++ day(1, 3) ++ day(1, 5) ++
        day(1, 10) ++ day(1, 11) ++
      // user 2: two equal-length streaks (1-2 and 5-6) → top start = 1
      day(2, 1) ++ day(2, 2) ++ day(2, 5) ++ day(2, 6) ++
      // user 3: a single day
      day(3, 7)
    val out = Behavior.streaksCore(
      rows.zipWithIndex.map { case ((u, t, tp), i) => (i.toLong, u, t, tp) }
        .toDF("event_id", "user_id", "tsu", "event_type"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 6L, 3L, 3L, 1L),
      (2L, 4L, 2L, 2L, 1L),
      (3L, 1L, 1L, 1L, 7L)))
  }

  test("q211 user growth: new = first-seen only, cumulative = running " +
    "sum of new, repeat visits count active but never new") {
    val D = Behavior.dayUs2
    // day 0: users 1,2 (both new) → active 2, new 2, cum 2
    // day 1: users 1 (repeat), 3 (new) → active 2, new 1, cum 3
    // day 3: users 2 (repeat, TWO events) → active 1, new 0, cum 3
    val rows = Seq(
      (1L, 1L, 0L * D + 1), (2L, 2L, 0L * D + 2),
      (3L, 1L, 1L * D + 1), (4L, 3L, 1L * D + 2),
      (5L, 2L, 3L * D + 1), (6L, 2L, 3L * D + 2))
    val out = Behavior.growthCore(
      rows.toDF("event_id", "user_id", "tsu"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (0L, 2L, 2L, 2L), (1L, 2L, 1L, 3L), (3L, 1L, 0L, 3L)))
  }

  test("q214 ohlc bars: open/close are order statistics with event_id " +
    "tie-break, high/low plain extrema, bars split on the hour") {
    val H = 3600000000L
    // hour 0, type a: ticks at t=30 (v=2.0), t=10 (v=1.0), t=10 with
    //   HIGHER id (v=9.0): open = 1.0 (t=10, lower id first), close =
    //   2.0 (t=30), high = 9.0, low = 1.0
    // hour 1, type a: single tick
    val rows = Seq(
      (5L, 30L, 2.0, "a"), (1L, 10L, 1.0, "a"), (2L, 10L, 9.0, "a"),
      (7L, H + 50L, 4.5, "a"))
    val out = Behavior.ohlcCore(
      rows.toDF("event_id", "tsu", "value", "event_type"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("a", 0L, 3L, 1000L, 9000L, 1000L, 2000L),
      ("a", 1L, 1L, 4500L, 4500L, 4500L, 4500L)))
  }

  test("q222 ab significance: z² identity on hand counts — clear " +
    "effect significant, small effect not, degenerate arms zero") {
    def run(n1: Long, c1: Long, n2: Long, c2: Long) =
      Behavior.abSignificanceCore(Seq((n1, c1, n2, c2))
          .toDF("n_signup_control", "n_conv_control",
            "n_signup_treatment", "n_conv_treatment"))
        .as[(Long, Long, Long, Long, Long, Long, Boolean)]
        .collect().head
    // 10% vs 20% on 1000/arm: z² = 39.215 — significant
    assert(run(1000, 100, 1000, 200) ===
      ((1000L, 100L, 1000L, 200L, -100000L, 39215L, true)))
    // 10% vs 11% on 1000/arm: z² = 0.532 — noise
    assert(run(1000, 100, 1000, 110) ===
      ((1000L, 100L, 1000L, 110L, -10000L, 532L, false)))
    // total conversion in both arms: no variance, exact zeros, false
    assert(run(5, 5, 4, 4) === ((5L, 5L, 4L, 4L, 0L, 0L, false)))
  }

  test("q224 lateness: high-water-mark definition, zero for the first " +
    "arrival and in-order events, exact cume picks and ppm") {
    // user 1, type a, arrival order: ts 100 → 300 → 200. The third
    // arrival is 100 µs behind the high-water mark; first two are 0.
    // p50 over {0,0,100} = 0 (cume 2/3 ≥ .5), p99 = 100, ppm = 333333
    val rows = Seq(
      (1L, 1L, 1L, 100L, "a"), (2L, 1L, 2L, 300L, "a"),
      (3L, 1L, 3L, 200L, "a"))
      .toDF("event_id", "user_id", "arrival", "tsu", "event_type")
    val out = Behavior.latenessCore(rows)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(("a", 0L, 100L, 3L, 1L, 100L, 333333L)))
  }

  test("q223 cuped: θ and adjusted means replicated independently in " +
    "BigInt with the engine's exact truncation order") {
    def isT(u: Long): Boolean = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$u:arm".getBytes("UTF-8")).map("%02x".format(_)).mkString
      Integer.parseInt(hex.take(1), 16) >= 8
    }
    // users 1..12: pre-spend x = u, post-spend y = 2u + (u mod 3) —
    // correlated, so θ must be materially non-zero
    val users = (1L to 12L)
    val rows = users.flatMap { u =>
      Seq((u, 0L, "purchase", u.toDouble),
        (u, 100L, "purchase", (2 * u + u % 3).toDouble))
    }
    val r = Behavior.cupedCore(
      rows.toDF("user_id", "tsu", "event_type", "value")).collect().head
    // independent replication (cut = (0+100) div 2 = 50)
    val x = users.map(u => u -> BigInt(u * 1000)).toMap
    val y = users.map(u => u -> BigInt((2 * u + u % 3) * 1000)).toMap
    val n = BigInt(users.size)
    val (sx, sy) = (users.map(x).sum, users.map(y).sum)
    val sxy = users.map(u => x(u) * y(u)).sum
    val sxx = users.map(u => x(u) * x(u)).sum
    val theta = (n * sxy - sx * sy) * 1000000 / (n * sxx - sx * sx)
    val (tU, cU) = users.partition(isT)
    assert(tU.nonEmpty && cU.nonEmpty)
    val mxa = sx / n
    def adj(us: Seq[Long]): BigInt = {
      val m = BigInt(us.size)
      us.map(y).sum / m - (theta * (us.map(x).sum / m - mxa)) / 1000000
    }
    assert(r.getAs[Long]("n_control") == cU.size.toLong)
    assert(r.getAs[Long]("n_treatment") == tU.size.toLong)
    assert(r.getAs[Long]("theta_ppm") == theta.toLong)
    assert(theta != 0, "fixture must exercise a non-trivial adjustment")
    assert(r.getAs[Long]("adj_y_control_milli") == adj(cU).toLong)
    assert(r.getAs[Long]("adj_y_treatment_milli") == adj(tU).toLong)
    assert(r.getAs[Long]("adj_diff_milli") ==
      (adj(tU) - adj(cU)).toLong)
  }

  test("q216 cusum: quiet prefix resets to zero, a sustained level " +
    "shift accumulates and crosses the 3T alarm line") {
    // one series: 8 days at 10 then 2 days at 110.
    // N=10, T=300, T div 10 = 30 → y = 10x − 330:
    //   x=10 → −230 (quiet: prefix-min tracks cum, S′ pinned at 0)
    //   x=110 → +770: day8 S′=770 (< 900 = 3T, no alarm),
    //                 day9 S′=1540 (> 900, ALARM)
    val panel = ((0 to 7).map(d => ("a", d.toLong, 10L)) ++
      Seq(("a", 8L, 110L), ("a", 9L, 110L)))
      .toDF("event_type", "day", "n_events")
    val out = Behavior.cusumCore(panel)
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    assert(out.take(8).forall { case (_, _, _, s, a) => s == 0L && !a })
    assert(out(8) === (("a", 8L, 110L, 770L, false)))
    assert(out(9) === (("a", 9L, 110L, 1540L, true)))
  }

  test("q208 gap-fill: interior gaps interpolate with truncating " +
    "integer division, edge rows carry 0, bounds are global") {
    val D = Behavior.dayUs2
    // type a: observed day 0 (v=1.0) and day 4 (v=3.0) → vm 1000/3000;
    //   interior days 1..3 interpolate 1500/2000/2500
    // type b: observed day 2 only → days 0,1,3,4 are edges (0,'edge')
    // type c: falling series 0.005 → -0.005 over days 0..3: the
    //   negative-delta interpolant must truncate toward zero
    //   (5 + (-10·d) div 3 → 2, -1), day 4 is a trailing edge
    val rows = Seq(
      (1L, 0L * D + 1, 1.0, "a"), (2L, 4L * D + 1, 3.0, "a"),
      (3L, 2L * D + 1, 7.0, "b"),
      (4L, 0L * D + 1, 0.005, "c"), (5L, 3L * D + 1, -0.005, "c"))
    val out = Behavior.gapFillCore(
      rows.toDF("event_id", "tsu", "value", "event_type"))
      .as[(String, Long, Long, String)].collect().toSeq
    assert(out === Seq(
      ("a", 0L, 1000L, "obs"), ("a", 1L, 1500L, "interp"),
      ("a", 2L, 2000L, "interp"), ("a", 3L, 2500L, "interp"),
      ("a", 4L, 3000L, "obs"),
      ("b", 0L, 0L, "edge"), ("b", 1L, 0L, "edge"),
      ("b", 2L, 7000L, "obs"),
      ("b", 3L, 0L, "edge"), ("b", 4L, 0L, "edge"),
      ("c", 0L, 5L, "obs"), ("c", 1L, 2L, "interp"),
      ("c", 2L, -1L, "interp"), ("c", 3L, -5L, "obs"),
      ("c", 4L, 0L, "edge")))
  }

  test("q278 windowed funnel: deadline drops the slow converter, " +
    "greedy anchor is the earliest qualifying event") {
    import spark.implicits._
    val H = 3600000000L
    val ev = Seq(
      // user 1: click 30 min after signup, purchase 30 min after click
      // → full depth
      (1L, "signup", 0L), (1L, "click", H / 2), (1L, "purchase", H),
      // user 2: click 2 h after signup → q76 would advance, q278 drops
      (2L, "signup", 0L), (2L, "click", 2 * H), (2L, "purchase", 3 * H),
      // user 3: two clicks — the EARLY one anchors; purchase within
      // the late click's window only → dropped under greedy anchoring
      (3L, "signup", 0L), (3L, "click", 1L), (3L, "click", H - 1),
      (3L, "purchase", 2 * H - 2))
      .toDF("user_id", "event_type", "tsu")
    val out = Behavior.windowedFunnelCore(ev).collect()
      .map(r => (r.getLong(0), r.getLong(4))).toMap
    assert(out === Map(1L -> 3L, 2L -> 1L, 3L -> 2L))
    // the unwindowed funnel advances users 2 and 3 all the way
    val plain = Behavior.funnelCore(ev).collect()
      .map(r => (r.getLong(0), r.getLong(4))).toMap
    assert(plain === Map(1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("q282 acf: alternating series gives signed ±1, silent days count " +
    "as zeros, zero variance emits 0") {
    import spark.implicits._
    val dayUs = 86400000000L
    // two events on each of days 0/2/4, days 1/3 silent → dense series
    // [2,0,2,0,2]; perfect anticorrelation at odd lags, +1 at lag 2
    val ev = Seq(0L, 2L, 4L).flatMap(d => Seq(d * dayUs, d * dayUs + 1))
      .toDF("tsu")
    val out = Behavior.acfCore(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // lag 7 exceeds the 5-day range → no pairs → no row
    assert(out === Seq((1L, 4L, -1.0), (2L, 3L, 1.0), (3L, 2L, -1.0)))
    // constant series → zero variance → 0.0 by convention, not NaN
    val const = Seq(0L, dayUs, 2 * dayUs).toDF("tsu")
    val c = Behavior.acfCore(const).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(c(1L) === 0.0 && c(2L) === 0.0)
  }

  test("q289 any-order funnel: reversed order completes inside the " +
    "window, late stage fails it, partial users counted") {
    import spark.implicits._
    val H = 3600000000L
    val ev = Seq(
      // user 1: canonical order, all within H of first touch
      (1L, "signup", 0L), (1L, "click", H / 2), (1L, "purchase", H),
      // user 2: REVERSED order — q76 scores stage 1, this completes...
      (2L, "purchase", 0L), (2L, "click", H / 4), (2L, "signup", H / 2),
      // user 3: all three but signup lands past the window
      (3L, "purchase", 0L), (3L, "click", 1L), (3L, "signup", 2 * H),
      // user 4: two stages only
      (4L, "click", 0L), (4L, "purchase", 5L))
      .toDF("user_id", "event_type", "tsu")
    val out = Behavior.anyOrderFunnelCore(ev).collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(out.toSeq === Seq(
      (1L, 3L, 0L, true), (2L, 3L, 0L, true),
      (3L, 3L, 0L, false), (4L, 2L, 0L, false)))
    // ...while the sequential funnel stops user 2 at stage 1
    val seq = Behavior.funnelCore(ev).collect()
      .map(r => (r.getLong(0), r.getLong(4))).toMap
    assert(seq(2L) === 1L)
  }

  test("q288 fano: bursty vs constant series, silent days as zeros, " +
    "exact integral variance-over-mean") {
    import spark.implicits._
    val dayUs = 86400000000L
    // x: [2,0,2] (day 1 silent) → var_num = 3·8−16 = 8, fano = 8e6/12
    // y: [1,1,1] → fano 0
    val ev = (Seq(0L, 1L, 2 * dayUs, 2 * dayUs + 1).map(("x", _)) ++
      Seq(0L, dayUs, 2 * dayUs).map(("y", _)))
      .toDF("event_type", "tsu")
    val out = Behavior.fanoCore(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(out === Seq(
      ("x", 3L, 4L, 2L, 1333333L, 666666L),
      ("y", 3L, 3L, 1L, 1000000L, 0L)))
  }

  test("q272 hour seasonality: zero-day means, min rule, and shares on " +
    "a hand fixture") {
    import spark.implicits._
    val dayUs = 86400000000L
    val hourUs = 3600000000L
    // day 0 hour 0 ×2, day 0 hour 1 ×1, day 2 hour 0 ×1 → day range
    // 0..2 (n_days = 3, day 1 silent)
    val ev = Seq(0L * hourUs, 0L * hourUs + 1, 1L * hourUs,
      2L * dayUs).toDF("tsu")
    val out = Behavior.hourSeasonalityCore(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8)))
    assert(out.toSeq === Seq(
      // hour 0: 3 events over 2 active days of 3 → mean 1e6, share 3/4,
      // min over the RANGE is 0 (day 1 had none), peak dev 2e6−1e6
      (0L, 3L, 2L, 3L, 1000000L, 750000L, 2L, 0L, 1000000L),
      // hour 1: 1 event on 1 of 3 days → mean 333333, share 1/4
      (1L, 1L, 1L, 3L, 333333L, 250000L, 1L, 0L, 666667L)))
  }

  test("q237: two-factor OLS recovers exact coefficients on a " +
    "perfect-fit fixture") {
    import spark.implicits._
    // y = 2 + 3*x1 + 5*x2 exactly; x1, x2 not collinear -> det != 0
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 3L), (4L, 1L))
      .map { case (x1, x2) => ("s", x1, x2, 2L + 3 * x1 + 5 * x2) }
      .toDF("segment", "x1", "x2", "y")
    val out = Behavior.olsTwoFactorCore(pts)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).head
    assert(out === (("s", 6L, 3.0, 5.0, 2.0)))
  }

  test("q298 Mann-Kendall: monotone series, tie correction, zero-day " +
    "fill and the |S|=1 continuity null on hand fixtures") {
    val dayUs = 86400000000L
    def series(counts: Seq[Int]): org.apache.spark.sql.DataFrame =
      counts.zipWithIndex.flatMap { case (c, d) =>
        Seq.fill(c)(d.toLong * dayUs + 1L)
      }.toDF("tsu")
    def run(counts: Seq[Int]) =
      Behavior.mannKendallCore(series(counts)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).head
    // strictly increasing 1,2,3,4: S = C(4,2) = 6, no ties,
    // 18·Var = 4·3·13 = 156, z = (6−1)/√(156/18)
    val zUp = BigDecimal(5.0 / math.sqrt(156.0 / 18.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(run(Seq(1, 2, 3, 4)) === ((4L, 6L, 156L, zUp)))
    // 3,1,2,2: S = −1 (continuity correction nulls it), one tied pair
    // of count 2 → tie term 2·1·9 = 18, 18·Var = 156 − 18 = 138
    assert(run(Seq(3, 1, 2, 2)) === ((4L, -1L, 138L, 0.0)))
    // a missing day is a GENUINE zero: days 0 and 2 have 5 events,
    // day 1 none → series (5, 0, 5): S = −1 + 0 + 1 = 0, count-5 tie
    // → 3·2·11 − 18 = 48
    val gap = Seq.fill(5)(0L * dayUs + 1L) ++ Seq.fill(5)(2L * dayUs + 1L)
    val g = Behavior.mannKendallCore(gap.toDF("tsu")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).head
    assert(g === ((3L, 0L, 48L, 0.0)))
  }

  test("q301 Theil-Sen: exact linear slope, lower-median pick, and " +
    "negative-slope truncation semantics on hand fixtures") {
    val dayUs = 86400000000L
    def series(counts: Seq[Int]) =
      counts.zipWithIndex.flatMap { case (c, d) =>
        Seq.fill(c)(d.toLong * dayUs + 1L)
      }.toDF("tsu")
    def run(counts: Seq[Int]) =
      Behavior.theilSenCore(series(counts)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head
    // perfectly linear +1/day: every pairwise slope is 1e6
    assert(run(Seq(1, 2, 3, 4)) === ((4L, 6L, 1000000L)))
    // 5,1,2: slopes −4e6, −1.5e6, 1e6 → lower median (rn 2) = −1.5e6
    assert(run(Seq(5, 1, 2)) === ((3L, 3L, -1500000L)))
    // 8 events day 0, one event day 3, days 1-2 zero-FILLED by the
    // spine → counts (8,0,0,1); slopes: (0,1) −8e6; (0,2) −4e6;
    // (0,3) −7e6 div 3 = −2333333 (non-exact negative — pins the
    // truncation-toward-zero semantics shared with DuckDB's //);
    // (1,2) 0; (1,3) 500000; (2,3) 1e6 → sorted lower median (rn 3)
    // IS the truncated value
    val gap = Seq.fill(8)(0L * dayUs + 1L) ++ Seq(3L * dayUs + 1L)
    val g = Behavior.theilSenCore(gap.toDF("tsu")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head
    assert(g === ((4L, 6L, -2333333L)))
  }

  test("q306 seasonal Mann-Kendall: strata never mix, per-stratum tie " +
    "correction, and the q298 z on hand fixtures") {
    val dayUs = 86400000000L
    def series(counts: Seq[Int]) =
      counts.zipWithIndex.flatMap { case (c, d) =>
        Seq.fill(c)(d.toLong * dayUs + 1L)
      }.toDF("tsu")
    def run(counts: Seq[Int]) =
      Behavior.seasonalMkCore(series(counts)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).head
    // 14 days = one pair per weekday stratum: signs +1,−1,0,+1,−1,0,0
    // sum to S'=0; tied strata (g2,g5,g6) contribute Var 0, the four
    // distinct-valued strata 18 each → var_num18 = 72
    assert(run(Seq(1, 2, 3, 4, 5, 6, 7, 2, 1, 3, 5, 4, 6, 7)) ===
      ((14L, 0L, 72L, 0.0)))
    // every stratum strictly increasing: S' = 7, no ties → 7·18 = 126,
    // z = (7−1)/√(126/18)
    val z = BigDecimal(6.0 / math.sqrt(126.0 / 18.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(run(Seq(1, 2, 3, 4, 5, 6, 7, 6, 7, 8, 9, 10, 11, 12)) ===
      ((14L, 7L, 126L, z)))
    // cross-stratum immunity: a sawtooth that plain MK reads as heavy
    // disagreement is all-zero signs within strata (period 7)
    val saw = Seq(9, 1, 9, 1, 9, 1, 9, 9, 1, 9, 1, 9, 1, 9)
    assert(run(saw)._2 === 0L)
  }

  test("q303 Sen's slope CI: clamped endpoints on hand fixtures, " +
    "interior ranks vs an in-test replica") {
    val dayUs = 86400000000L
    def series(counts: Seq[Int]) =
      counts.zipWithIndex.flatMap { case (c, d) =>
        Seq.fill(c)(d.toLong * dayUs + 1L)
      }.toDF("tsu")
    def run(counts: Seq[Int]) =
      Behavior.sensSlopeCiCore(series(counts)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getLong(7))).head
    // 1,2,3,4: 6 pairs all slope 1e6; no ties → var_num18 = 4·3·13 =
    // 156, Cα = 1.959964·√(156/18) ≈ 5.77 > spread → both endpoints
    // CLAMP (lo to 1, hi to n_pairs) — the small-n degenerate case
    assert(run(Seq(1, 2, 3, 4)) ===
      ((4L, 6L, 156L, 1L, 6L, 1000000L, 1000000L, 1000000L)))
    // 5,1,2: ordered slopes −4e6, −1.5e6, 1e6; var_num18 = 3·2·11 = 66,
    // Cα ≈ 3.75 → lo_rank round((3−3.75)/2) = 0 → clamp 1;
    // hi_rank round((3+3.75)/2)+1 = 4 → clamp 3: full-range interval
    assert(run(Seq(5, 1, 2)) ===
      ((3L, 3L, 66L, 1L, 3L, -4000000L, -1500000L, 1000000L)))
    // 10 distinct non-monotone counts → 45 pairs, interior ranks:
    // var_num18 = 10·9·25 = 2250, Cα = 1.959964·√125 ≈ 21.91 →
    // lo = round(11.54) = 12, hi = round(33.46)+1 = 34. Endpoint
    // slopes re-derived by an in-test replica of the pair relation
    // (same truncating ppm division, same (slope, day_a, day_b) order)
    val counts = Seq(3, 1, 4, 5, 9, 2, 6, 8, 7, 10)
    val slopes = (for {
      a <- counts.indices; b <- counts.indices if b > a
    } yield (((counts(b) - counts(a)).toLong * 1000000L) / (b - a),
        a.toLong, b.toLong)).sorted
    val expLo = slopes(12 - 1)._1
    val expMed = slopes(23 - 1)._1
    val expHi = slopes(34 - 1)._1
    assert(run(counts) ===
      ((10L, 45L, 2250L, 12L, 34L, expLo, expMed, expHi)))
  }
}
