package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Behavior, Quality, Scoring}

/** Property pins for the round-10 exact-integer kernels: each operator
  * is recomputed by an INDEPENDENT plain-JVM implementation of the same
  * contract (BigInt/Long arithmetic, same truncation-toward-zero
  * division) on random inputs — the strongest local check that the
  * DataFrame formulation implements the declared arithmetic, not an
  * engine-specific accident. The DuckDB oracles prove cross-engine
  * agreement on the corpus; these prove the CONTRACT on the whole input
  * space ScalaCheck reaches.
  */
class ExactKernelPropertySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(8)

  test("q216 cusum: prefix closed form equals the sequential recurrence") {
    val gen = Gen.nonEmptyListOf(Gen.choose(0L, 20L)).map(_.take(24))
    val prop = Prop.forAll(gen) { counts =>
      val panel = counts.zipWithIndex
        .map { case (n, d) => ("a", d.toLong, n) }
        .toDF("event_type", "day", "n_events")
      val got = Behavior.cusumCore(panel)
        .as[(String, Long, Long, Long, Boolean)].collect().toSeq
      // independent: Page's recurrence S_t = max(0, S_{t-1} + y_t)
      val bigN = BigInt(counts.size)
      val t = BigInt(counts.sum)
      val k = t / 10
      var s = BigInt(0)
      val want = counts.zipWithIndex.map { case (n, d) =>
        s = (s + (bigN * n - t - k)).max(0)
        ("a", d.toLong, n, s.toLong, s > 3 * t)
      }
      got == want
    }
    assert(SCTest.check(params, prop).passed)
  }

  test("q207 streaks: islands equal a direct scan of sorted day sets") {
    val gen = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 15L)))
    val prop = Prop.forAll(gen) { pairs =>
      val d = Behavior.dayUs2
      val ev = pairs.zipWithIndex
        .map { case ((u, day), i) => (i.toLong, u, day * d + 1) }
        .toDF("event_id", "user_id", "tsu")
      val got = Behavior.streaksCore(ev)
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      val want = pairs.groupBy(_._1).toSeq.sortBy(_._1).map {
        case (u, ps) =>
          val days = ps.map(_._2).distinct.sorted
          // islands: split where the gap exceeds one day
          val runs = days.foldLeft(List.empty[List[Long]]) {
            case (acc @ (run :: rest), day) if day == run.head + 1 =>
              (day :: run) :: rest
            case (acc, day) => List(day) :: acc
          }.map(r => (r.size.toLong, r.min)).reverse
          val top = runs.maxBy { case (len, st) => len * 10000000L - st }
          (u, days.size.toLong, runs.size.toLong, runs.map(_._1).max, top._2)
      }
      got == want
    }
    assert(SCTest.check(params, prop).passed)
  }

  test("q214 ohlc: order statistics equal a direct sort per bar") {
    val H = 3600000000L
    val gen = Gen.nonEmptyListOf(Gen.zip(
      Gen.choose(0L, 3L * H), Gen.choose(-50L, 50L)))
    val prop = Prop.forAll(gen) { ticks =>
      val rows = ticks.zipWithIndex.map { case ((tsu, vRaw), i) =>
        (i.toLong, tsu, vRaw / 10.0, "a")
      }
      val got = Behavior.ohlcCore(
        rows.toDF("event_id", "tsu", "value", "event_type"))
        .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
      val want = rows.groupBy(r => r._2 / H).toSeq.sortBy(_._1).map {
        case (hr, rs) =>
          val ordered = rs.sortBy(r => (r._2, r._1))
          def vm(r: (Long, Long, Double, String)) =
            math.floor(r._3 * 1000.0).toLong
          ("a", hr, rs.size.toLong, vm(ordered.head),
            rs.map(vm).max, rs.map(vm).min, vm(ordered.last))
      }
      got == want
    }
    assert(SCTest.check(params, prop).passed)
  }

  test("q210 source-mix TV: exact ppm equals the BigInt identity") {
    val gen = Gen.nonEmptyListOf(Gen.zip(
      Gen.oneOf("X", "Y", "Z"), Gen.oneOf("en", "fr", "de", "ja")))
    val prop = Prop.forAll(gen) { docs =>
      val got = Quality.mixTvCore(docs.toDF("source", "lang"))
        .as[(String, Long, Long)].collect().toSeq
      val n = BigInt(docs.size)
      val bySrc = docs.groupBy(_._1)
      val byLang = docs.groupBy(_._2).view.mapValues(v => BigInt(v.size))
      val langs = docs.map(_._2).distinct
      val want = bySrc.toSeq.sortBy(_._1).map { case (src, ds) =>
        val ns = BigInt(ds.size)
        val dev = langs.map { l =>
          val nsl = BigInt(ds.count(_._2 == l))
          (nsl * n - byLang(l) * ns).abs
        }.sum
        (src, ds.size.toLong, (dev * 1000000 / (2 * ns * n)).toLong)
      }
      got == want
    }
    assert(SCTest.check(params, prop).passed)
  }

  test("q218 ks: sup CDF gap equals the BigInt cross-multiplied scan") {
    val gen = Gen.zip(
      Gen.nonEmptyListOf(Gen.choose(-20, 20)),
      Gen.nonEmptyListOf(Gen.choose(-20, 20)))
    val prop = Prop.forAll(gen) { case (aRaw, bRaw) =>
      // sample 1 at early tsu, sample 2 at late tsu; the data-derived
      // midpoint lands strictly between the two blocks
      val ev = aRaw.zipWithIndex.map { case (v, i) =>
        (i.toLong, v / 4.0)
      } ++ bRaw.zipWithIndex.map { case (v, i) =>
        (1000L + i, v / 4.0)
      }
      val got = Scoring.ksCore(ev.toDF("tsu", "value"))
        .as[(Long, Long, Long)].collect().head
      val (n1, n2) = (BigInt(aRaw.size), BigInt(bRaw.size))
      val a = aRaw.map(_ / 4.0)
      val b = bRaw.map(_ / 4.0)
      val values = (a ++ b).distinct.sorted
      var (c1, c2) = (BigInt(0), BigInt(0))
      var sup = BigInt(0)
      values.foreach { v =>
        c1 += a.count(_ == v); c2 += b.count(_ == v)
        sup = sup.max((c1 * n2 - c2 * n1).abs)
      }
      got == ((n1.toLong, n2.toLong, (sup * 1000000 / (n1 * n2)).toLong))
    }
    assert(SCTest.check(params, prop).passed)
  }

  test("q208 gap-fill: interpolant equals a direct Long replication, " +
    "global bounds across series") {
    val D = Behavior.dayUs2
    val gen = Gen.nonEmptyListOf(Gen.zip(
      Gen.oneOf("a", "b"), Gen.choose(0L, 12L), Gen.choose(-20, 20)))
    val prop = Prop.forAll(gen) { obs =>
      val rows = obs.map { case (t, day, v) =>
        (day * D + 1, v.toDouble, t)
      }
      val got = Behavior.gapFillCore(rows.toDF("tsu", "value", "event_type"))
        .as[(String, Long, Long, String)].collect().toSeq
      val d0 = obs.map(_._2).min
      val d1 = obs.map(_._2).max
      val types = obs.map(_._1).distinct.sorted
      val want = types.flatMap { t =>
        val daily = obs.filter(_._1 == t).groupBy(_._2).view
          .mapValues(_.map(o => 1000L * o._3).sum).toMap
        (d0 to d1).map { day =>
          daily.get(day) match {
            case Some(m) => (t, day, m, "obs")
            case None =>
              val prev = (d0 until day).reverse.find(daily.contains)
              val next = (day + 1 to d1).find(daily.contains)
              (prev, next) match {
                case (Some(pd), Some(nd)) =>
                  val (pm, nm) = (daily(pd), daily(nd))
                  (t, day, pm + (nm - pm) * (day - pd) / (nd - pd),
                    "interp")
                case _ => (t, day, 0L, "edge")
              }
          }
        }
      }
      got == want
    }
    assert(SCTest.check(params, prop).passed)
  }

  test("q211 growth: DAU/new/cumulative equal a direct first-seen scan") {
    val D = Behavior.dayUs2
    val gen = Gen.nonEmptyListOf(Gen.zip(
      Gen.choose(1L, 5L), Gen.choose(0L, 10L)))
    val prop = Prop.forAll(gen) { pairs =>
      val ev = pairs.zipWithIndex
        .map { case ((u, day), i) => (i.toLong, u, day * D + 1) }
        .toDF("event_id", "user_id", "tsu")
      val got = Behavior.growthCore(ev)
        .as[(Long, Long, Long, Long)].collect().toSeq
      val first = pairs.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      val days = pairs.map(_._2).distinct.sorted
      var cum = 0L
      val want = days.map { d =>
        val active = pairs.filter(_._2 == d).map(_._1).distinct
        val fresh = active.count(u => first(u) == d).toLong
        cum += fresh
        (d, active.size.toLong, fresh, cum)
      }
      got == want
    }
    assert(SCTest.check(params, prop).passed)
  }

  test("q224 lateness: audit equals a direct high-water-mark scan with " +
    "the shared cume rule") {
    val gen = Gen.nonEmptyListOf(Gen.zip(
      Gen.choose(1L, 3L), Gen.choose(0L, 30L), Gen.choose(0L, 1000L)))
    val prop = Prop.forAll(gen) { rowsRaw =>
      val rows = rowsRaw.zipWithIndex.map { case ((u, arr, tsu), i) =>
        (i.toLong, u, arr, tsu, "a")
      }
      val got = Behavior.latenessCore(
        rows.toDF("event_id", "user_id", "arrival", "tsu", "event_type"))
        .as[(String, Long, Long, Long, Long, Long, Long)].collect().head
      // direct replication: per user in (arrival, event_id) order
      val lats = rows.groupBy(_._2).values.toSeq.flatMap { es =>
        val ordered = es.sortBy(e => (e._3, e._1))
        ordered.zipWithIndex.map { case (e, i) =>
          if (i == 0) 0L
          else math.max(0L, ordered.take(i).map(_._4).max - e._4)
        }
      }
      val n = lats.size.toLong
      def cut(p: Double): Long = {
        val sorted = lats.sorted
        sorted.zipWithIndex
          .find { case (_, i) => (i + 1).toDouble / n.toDouble >= p }
          .get._1
      }
      val nLate = lats.count(_ > 0).toLong
      got == (("a", cut(0.5), cut(0.99), n, nLate, lats.max,
        nLate * 1000000L / n))
    }
    assert(SCTest.check(params, prop).passed)
  }

  test("q213 z-score params: moments equal the BigInt identity, " +
    "singleton variance null") {
    val gen = Gen.nonEmptyListOf(Gen.choose(-300, 300))
    val prop = Prop.forAll(gen) { vsRaw =>
      val df = vsRaw.map(v => ("a", v / 10.0)).toDF("event_type", "value")
      val row = graft.ops.Skew.zscoreCore(df).collect().head
      val vms = vsRaw.map(v => BigInt(math.floor(v / 10.0 * 1000.0).toLong))
      val n = BigInt(vms.size)
      val (sv, svv) = (vms.sum, vms.map(v => v * v).sum)
      val meanOk = row.getLong(2) == (sv / n).toLong
      val varOk =
        if (vms.size == 1) row.isNullAt(3)
        else row.getLong(3) ==
          ((n * svv - sv * sv) / (n * (n - 1))).toLong
      row.getString(0) == "a" && row.getLong(1) == vms.size.toLong &&
        meanOk && varOk
    }
    assert(SCTest.check(params, prop).passed)
  }

  test("q219 gini: two-phase ranked identity equals the BigInt formula") {
    val gen = Gen.nonEmptyListOf(Gen.choose(0L, 500L))
      .suchThat(_.sum > 0)
    val prop = Prop.forAll(gen) { cents =>
      val rev = cents.zipWithIndex
        .map { case (c, i) => (i.toLong, c) }.toDF("ckey", "cents")
      val got = Scoring.giniCore(rev)
        .as[(Long, Long, Long)].collect().head
      val n = BigInt(cents.size)
      val sorted = cents.zipWithIndex
        .sortBy { case (c, k) => (c, k.toLong) }.map(_._1)
      val s = BigInt(cents.sum)
      val srx = sorted.zipWithIndex
        .map { case (x, i) => BigInt(i + 1) * x }.sum
      val gini = (2 * srx - (n + 1) * s) * 1000000 / (n * s)
      got == ((cents.size.toLong, cents.sum, gini.toLong))
    }
    assert(SCTest.check(params, prop).passed)
  }

  // ── round-11 ADVICE: overflow raises, degenerates stay honest ─────
  // Non-ANSI decimal overflow yields NULL; the kernels used to coalesce
  // that into 0/false — a plausible-looking answer the oracle's HUGEINT
  // would contradict. Past the documented bounds they must now FAIL
  // loudly (Exact.orOverflowError) while every provably-degenerate case
  // keeps its exact honest value.

  // under ANSI (the session default) Spark itself raises
  // SparkArithmeticException at the overflowing product/sum; under
  // non-ANSI the NULL flows to the kernel's Exact.orOverflowError
  // raise. Either way the failure must be LOUD and name the overflow.
  private def raisesOverflow(body: => Unit): Unit = {
    val e = intercept[Exception](body)
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.toLowerCase.contains("overflow")
        || m.contains("NUMERIC_VALUE_OUT_OF_RANGE")
        || m.contains("cannot be represented")),
      s"expected a loud overflow failure, got: $e")
  }

  test("q222 guards: arm counts past the DECIMAL(38,0) bound raise " +
    "instead of saturating to 0/false; empty arms still exact zeros") {
    def frame(n1: Long, c1: Long, n2: Long, c2: Long) =
      Seq((n1, c1, n2, c2)).toDF("n_signup_control", "n_conv_control",
        "n_signup_treatment", "n_conv_treatment")
    // den = n1·n2·C·(N−C) ≈ 10¹⁸·10¹⁸·2·10¹⁷·… ≫ 10³⁸ → overflow
    raisesOverflow(Behavior.abSignificanceCore(
      frame(1000000000000000000L, 100000000000000000L,
        1000000000000000000L, 200000000000000000L)).collect())
    // degenerate: one empty arm — all three outputs honest 0/false
    val deg = Behavior.abSignificanceCore(frame(1000L, 100L, 0L, 0L))
      .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect().head
    assert(deg === ((1000L, 100L, 0L, 0L, 0L, 0L, false)))
  }

  test("q213 guards: sv·sv past DECIMAL(38,0) raises; singleton group " +
    "keeps the honest NULL variance") {
    // two values of ~9.1e15 → vm ≈ 9.1e18, sv ≈ 1.8e19,
    // sv² ≈ 3.3e38 > 10³⁸ → overflow in the variance numerator
    val big = 9.1e15
    raisesOverflow(graft.ops.Skew.zscoreCore(
      Seq(("a", big), ("a", big)).toDF("event_type", "value")).collect())
    val single = graft.ops.Skew.zscoreCore(
      Seq(("c", 9.0)).toDF("event_type", "value")).collect().head
    assert(single.getLong(1) === 1L && single.isNullAt(3))
  }

  test("q223 guard: zero pre-period variance keeps the honest θ=0 " +
    "(its covariance is provably 0), adjusted means equal raw means") {
    // every user has identical pre-period spend → Var(X)=0 → θ=0 and
    // the adjustment is a no-op — the degenerate predicate, not the
    // overflow raise, must decide this case
    val ev = Seq(
      (1L, 0L, "purchase", 5.0), (1L, 100L, "purchase", 7.0),
      (2L, 0L, "purchase", 5.0), (2L, 100L, "purchase", 9.0))
      .toDF("user_id", "tsu", "event_type", "value")
    val r = Behavior.cupedCore(ev).collect().head
    assert(r.getLong(2) === 0L) // theta_ppm
  }
}
