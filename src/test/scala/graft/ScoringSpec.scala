package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Scoring

/** Semantics pins for RFM segmentation (q137) and decile lift (q141):
  * boundary-comparison bucketing on hand-computed quartiles, tie
  * cohesion (equal metric values always share a bucket — the property
  * ntile() lacks), and the exact integer rate arithmetic.
  */
class ScoringSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def day(d: Int) = new Timestamp(d * 86400000L)

  test("rfm: quartile scores and segment on a hand-computed fixture") {
    // 4 customers, one order each on distinct days with distinct prices:
    // every metric has 4 distinct values → quartile cuts at the 1st,
    // 2nd, 3rd order statistics; recency inverts (latest order = best)
    val orders = Seq(
      (1L, 10.0, day(1)), (2L, 20.0, day(2)),
      (3L, 30.0, day(3)), (4L, 40.0, day(4))
    ).toDF("o_custkey", "o_totalprice", "o_orderdate")
    val out = Scoring.rfmCore(orders)
      .select("c_custkey", "r_score", "f_score", "m_score", "segment")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1)
    // recency_days: c4=0 c3=1 c2=2 c1=3 → r: c4=4, c3=3, c2=2, c1=1
    // frequency all 1 → everyone is <= every cut → f=1 for all
    // monetary 10<20<30<40 → m: 1,2,3,4
    assert(out.toSeq === Seq(
      (1L, 1L, 1L, 1L, "111"), (2L, 2L, 1L, 2L, "212"),
      (3L, 3L, 1L, 3L, "313"), (4L, 4L, 1L, 4L, "414")))
  }

  test("rfm: equal metric values always share a bucket") {
    val orders = (1L to 8L).map(k => (k, 50.0, day(5))).toDF(
      "o_custkey", "o_totalprice", "o_orderdate")
    val out = Scoring.rfmCore(orders)
      .select("r_score", "f_score", "m_score").distinct().collect()
    assert(out.length === 1) // all customers identical → one (r,f,m) cell
  }

  test("decile lift: boundaries, tie cohesion, exact integer rate") {
    // 20 rows, values 1..10 twice; purchases exactly on value >= 9
    val ev = (1 to 10).flatMap(v => Seq(
      (v.toLong * 2, v.toDouble, if (v >= 9) "purchase" else "view"),
      (v.toLong * 2 + 1, v.toDouble, if (v >= 9) "purchase" else "click")
    )).map { case (id, v, tp) => (id, 1L, id * 1000L, tp, v) }
      .toDF("event_id", "user_id", "tsu", "event_type", "value")
    val out = Scoring.decileLiftCore(ev)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // each distinct value is its own decile (cume share hits k/10
    // exactly at the k-th value); both copies land together
    assert(out.length === 10)
    assert(out.forall(_._2 == 2L))
    assert(out.map(_._3).sum === 4L) // 4 purchases
    assert(out.filter(_._1 >= 9).forall(r => r._3 == 2L && r._4 == 1000000L))
    assert(out.filter(_._1 < 9).forall(r => r._3 == 0L && r._4 == 0L))
  }

  test("distribution drift: baseline-fit boundaries, exact share deltas") {
    // tsu range 0..1000 → cutoff 500. Baseline: values 1..10 (one
    // each). Current: 5 twice, 20 once (out-of-range high).
    val rows = (1 to 10).map(v => (v.toLong, 1L, (v - 1) * 50L, "view", v.toDouble)) ++
      Seq((20L, 1L, 600L, "view", 5.0), (21L, 1L, 700L, "view", 5.0),
        (22L, 1L, 1000L, "view", 20.0))
    val ev = rows.toDF("event_id", "user_id", "tsu", "event_type", "value")
    val out = Scoring.driftCore(ev)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out.length === 10)
    // every baseline decile holds exactly one row (boundaries are the
    // values themselves), shares 10% each
    assert(out.forall(r => r._2 == 1L && r._4 == 100000L))
    val cur = out.map(r => r._1 -> (r._3, r._5, r._6)).toMap
    assert(cur(5L) === ((2L, 666666L, 566666L)))   // mass moved into d5
    assert(cur(10L) === ((1L, 333333L, 233333L)))  // out-of-range → top
    assert((1L to 9L).filter(_ != 5L).forall(b => cur(b) === ((0L, 0L, -100000L))))
  }

  test("revenue concentration: whole-group cuts, exact 80% compare") {
    def orders(revs: (Long, Double)*) =
      revs.zipWithIndex.map { case ((k, r), i) => (k, r, day(i + 1)) }
        .toDF("o_custkey", "o_totalprice", "o_orderdate")
    val a = Scoring.concentrationCore(orders(
      (1L, 40.0), (2L, 30.0), (3L, 20.0), (4L, 10.0)))
      .as[(Long, Double, Long, Double)].collect().head
    assert(a === ((4L, 100.0, 3L, 0.4))) // 40+30+20=90 ≥ 80; top-1 = 40%
    // equal revenues never split: five 10s enter together
    val b = Scoring.concentrationCore(
      orders((1L, 50.0), (2L, 10.0), (3L, 10.0), (4L, 10.0), (5L, 10.0),
        (6L, 10.0)))
      .as[(Long, Double, Long, Double)].collect().head
    assert(b === ((6L, 100.0, 6L, 0.5))) // 50 < 80 → need the whole 10-group
  }

  test("q218 ks: hand-computed sup CDF gap, exact cross-multiplied ppm") {
    // baseline values {1,2,3,4} (early tsu), current {3,4,5,6} (late);
    // midpoint (0+103) div 2 = 51 splits them 4/4. Sup gap at v=2..4:
    // |F1−F2| = 0.5 → 500000 ppm (cross-mult: cum1·n2−cum2·n1 = 8,
    // 8·10⁶ div 16)
    val ev = Seq((0L, 1.0), (1L, 2.0), (2L, 3.0), (3L, 4.0),
      (100L, 3.0), (101L, 4.0), (102L, 5.0), (103L, 6.0))
      .toDF("tsu", "value")
    val out = Scoring.ksCore(ev).as[(Long, Long, Long)].collect().head
    assert(out === ((4L, 4L, 500000L)))
  }

  test("q219 gini: order-statistic identity — uniform → 0, " +
    "concentrated → 2/3, mixed hand value") {
    def gini(cents: Seq[Long]): Long =
      Scoring.giniCore(cents.zipWithIndex
          .map { case (c, i) => (i.toLong, c) }.toDF("ckey", "cents"))
        .as[(Long, Long, Long)].collect().head._3
    assert(gini(Seq(5L, 5L, 5L)) == 0L)          // perfect equality
    assert(gini(Seq(0L, 0L, 12L)) == 666666L)    // one owner (n−1)/n = 2/3
    assert(gini(Seq(1L, 2L, 3L)) == 222222L)     // Σ(2i−n−1)x / nΣx = 4/18
  }

  test("q229 binned gini: exact on degenerate shapes, tracks the exact " +
    "q219 coefficient within the bin-resolution bound on real data") {
    def binned(cents: Seq[Long]): Long =
      Scoring.giniBinnedCore(cents.zipWithIndex
          .map { case (c, i) => (i.toLong, c) }.toDF("ckey", "cents"))
        .as[(Long, Long, Long)].collect().head._3
    // degenerate shapes where binning loses nothing:
    assert(binned(Seq(5L, 5L, 5L)) == 0L)        // one bin → exact 0
    assert(binned(Seq(0L, 0L, 12L)) == 666666L)  // holders split cleanly
    // real data: sketch vs exact within the grouped-Lorenz resolution.
    // The bin quantization moves mass by at most one bin's value width,
    // so the ppm gap is O(10⁶/B) times a distribution-shape constant;
    // 4/B ppm-scaled is a conservative pin for the testdata shape.
    val rev = Tables.orders(spark, sf)
      .groupBy(org.apache.spark.sql.functions.col("o_custkey").as("ckey"))
      .agg(org.apache.spark.sql.functions
        .expr("cast(sum(floor(o_totalprice * 100.0D)) as bigint)")
        .as("cents"))
    val exact = Scoring.giniCore(rev).as[(Long, Long, Long)].collect().head
    val approx = Scoring.giniBinnedCore(rev)
      .as[(Long, Long, Long)].collect().head
    assert(approx._1 == exact._1 && approx._2 == exact._2,
      "count/total must be exact regardless of binning")
    val tol = 4L * 1000000L / Scoring.giniBins
    assert(math.abs(approx._3 - exact._3) <= tol,
      s"binned ${approx._3} vs exact ${exact._3} exceeds ±$tol ppm")
  }

  test("q238: Mann-Whitney U on a hand fixture with ties (doubled " +
    "midranks, exact effect size)") {
    import spark.implicits._
    // A = {3, 5, 5}, B = {1, 5}: wins(a>b) = 3 (3>1, 5>1, 5>1), ties
    // = 2 (5=5 twice) -> U_A = 3 + 2/2 = 4, doubled = 8
    val ev = Seq((3.0, true), (5.0, true), (5.0, true),
      (1.0, false), (5.0, false)).toDF("value", "is_a")
    val out = graft.ops.Scoring.mwuCore(ev)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).head
    // rank2: v=1 -> 2, v=3 -> 4, v=5 (3-way tie) -> 8 each
    // 2R_A = 4 + 8 + 8 = 20; 2U_A = 20 - 3*4 = 8  (wins 3 + 2 ties/2 = 4)
    // cles = 8e6 // (2*3*2) = 666666
    assert(out === ((3L, 2L, 8L, 666666L)))
  }

  test("q239: Spearman rho on hand fixtures (perfect monotone, ties, " +
    "anti-monotone)") {
    import spark.implicits._
    def rho(pts: Seq[(Long, Long)]): Double =
      graft.ops.Scoring.spearmanCore(pts.toDF("x", "y"))
        .collect().head.getDouble(1)
    // strictly increasing -> rho = 1
    assert(rho(Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L))) === 1.0)
    // strictly decreasing -> rho = -1
    assert(rho(Seq((1L, 40L), (2L, 30L), (3L, 20L), (4L, 10L))) === -1.0)
    // tie fixture, hand-computed with midranks:
    // x = (1,1,2), y = (5,7,7); midranks rx = (1.5,1.5,3), ry = (1,2.5,2.5)
    // cov terms: n=3, sxy=3*(1.5*1+1.5*2.5+3*2.5)=3*12.75=38.25; sx*sy=6*6=36
    // num=2.25; var_x: 3*(1.5^2+1.5^2+9)-36=40.5-36=4.5; var_y same=4.5
    // rho = 2.25/4.5 = 0.5  (doubled ranks cancel)
    assert(rho(Seq((1L, 5L), (1L, 7L), (2L, 7L))) === 0.5)
  }

  test("q293 quantile normalization: rank ties, single-doc source, and " +
    "the nearest-rank-below global map on a hand fixture") {
    // sources: A 10/20/30/40, B 15/35, C 20/20 (tie), D 99 (singleton);
    // global (n_chars, doc_id) order: 10,15,20(d2),20(d7),20(d8),30,35,
    // 40,99 → N=9, N−1=8
    val docs = Seq(
      (1L, "A", 10L), (2L, "A", 20L), (3L, "A", 30L), (4L, "A", 40L),
      (5L, "B", 15L), (6L, "B", 35L),
      (7L, "C", 20L), (8L, "C", 20L),
      (9L, "D", 99L),
      // NULL source: excluded symmetrically with the oracle, and must
      // not shift anyone's global rank
      (10L, null, 1L)).toDF("doc_id", "source", "n_chars")
    val out = Scoring.quantileNormCore(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toList
    assert(out === List(
      // A: pr 0 / 333333 / 666666 / 1e6 → targets 1, 1+⌊2.67⌋=3,
      // 1+⌊5.33⌋=6, 9 → norms 10, 20, 30, 99
      (1L, "A", 10L, 1L, 4L, 0L, 10L),
      (2L, "A", 20L, 2L, 4L, 333333L, 20L),
      (3L, "A", 30L, 3L, 4L, 666666L, 30L),
      (4L, "A", 40L, 4L, 4L, 1000000L, 99L),
      // B: bottom → global bottom; top → global top
      (5L, "B", 15L, 1L, 2L, 0L, 10L),
      (6L, "B", 35L, 2L, 2L, 1000000L, 99L),
      // C: ANSI rank() tie — both rank 1, both map to the global min
      (7L, "C", 20L, 1L, 2L, 0L, 10L),
      (8L, "C", 20L, 1L, 2L, 0L, 10L),
      // D: single-doc source → pr 0 by convention, never a zero-div
      (9L, "D", 99L, 1L, 1L, 0L, 10L)))
  }
}
