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
}
