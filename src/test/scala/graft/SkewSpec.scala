package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Skew

/** q149's accuracy contract: the sketched percentiles must be actual
  * data values whose true rank sits within the sketch's rank-error
  * bound of the target rank — the guarantee that makes the mergeable
  * one-pass sketch a legitimate stand-in for q102's exact ordered pass
  * at scales where the ordered pass is unaffordable.
  */
class SkewSpec extends AnyFunSuite with SparkTestBase {

  test("approx quantiles: picks are data values within the rank-error bound") {
    val ev = Tables.eventsMicros(spark, sf).filter(col("value").isNotNull)
      .select("event_type", "value")
    val approx = Skew.approxQuantilesCore(ev).collect()
    assert(approx.length ===
      ev.select("event_type").distinct().count().toInt)
    val values = ev.collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (t, vs) => t -> vs.map(_._2).sorted }
    approx.foreach { row =>
      val t = row.getString(0)
      val n = row.getLong(1)
      val vs = values(t)
      assert(n === vs.length.toLong)
      Skew.quantilePs.zipWithIndex.foreach { case (p, i) =>
        val v = row.getDouble(2 + i)
        // the sketch returns an actual data value
        assert(vs.contains(v), s"$t p$p pick $v not a data value")
        val rLo = vs.count(_ < v) // ranks covered by v: (rLo, rHi]
        val rHi = vs.count(_ <= v)
        val target = p * n
        val tol = n.toDouble / Skew.approxAccuracy + 1
        assert(rHi >= target - tol && rLo <= target + tol,
          s"$t p$p: pick $v covers ranks (${rLo}, ${rHi}], " +
            s"target $target ± $tol")
      }
    }
  }
}
