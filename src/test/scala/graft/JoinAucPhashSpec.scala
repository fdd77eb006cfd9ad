package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Multimodal, Quality, Skew}

/** Pins for the round-10 batch-3 operators: the null-bypass outer join
  * (q204), exact rank-statistic AUC (q205), and perceptual-hash image
  * dedup (q206).
  */
class JoinAucPhashSpec extends AnyFunSuite with SparkTestBase {

  test("q204: bypass plan filters nulls out of the join but keeps them in the result") {
    val out = Skew.nullBypassJoin(spark, sf)
    // the join subtree must see only non-null keys: every scan feeding
    // the join branch carries an isnotnull(user_key)-implying filter,
    // and the plan unions a join branch with a join-free branch
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Union"))
    // anonymous rows survive: is_anon=true bucket present with
    // days_active 0 and exactly the event_id % 5 == 0 count
    val anonN = out.filter(col("is_anon")).agg(sum("n_events"))
      .collect().head.getLong(0)
    val expected = Tables.events(spark, sf)
      .filter(col("event_id") % 5 === 0).count()
    assert(anonN === expected)
    // keyed rows all carry a computed profile (days_active >= 1)
    assert(out.filter(!col("is_anon") && col("days_active") < 1)
      .count() === 0)
  }

  test("q205: matches a driver-side sklearn-style AUC recomputation") {
    val rows = Quality.aucRank(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    val docs = Tables.documents(spark, sf)
      .select("source", "n_chars", "lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2) == "en"))
    docs.groupBy(_._1).foreach { case (src, ds) =>
      val pos = ds.filter(_._3).map(_._2).sorted
      val neg = ds.filter(!_._3).map(_._2).sorted
      val (nPos, nNeg, aucPpm) = rows(src)
      assert(nPos === pos.length && nNeg === neg.length)
      if (pos.nonEmpty && neg.nonEmpty) {
        // brute-force pair counting: wins + half-credit ties, in ppm
        var num = BigInt(0)
        for (p <- pos; n <- neg)
          num += (if (p > n) 2 else if (p == n) 1 else 0)
        val expected = (num * 1000000 / (BigInt(2) * pos.length * neg.length))
          .toLong
        assert(aucPpm === Some(expected), s"source $src")
      } else assert(aucPpm.isEmpty)
    }
  }

  test("q206: the three sizes of each content group hash identically") {
    val out = Multimodal.imagePhashDups(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(out.length > 10, "enough distinct duplicate groups")
    val hashOf = out.flatMap { case (ph, _, members) =>
      members.split(",").map(_.toLong -> ph)
    }.toMap
    val nDocs = Tables.documents(spark, sf).count()
    // every complete trio {3g, 3g+1, 3g+2} must collapse to one hash
    (0L until nDocs / 3).foreach { g =>
      val trio = Seq(3 * g, 3 * g + 1, 3 * g + 2).flatMap(hashOf.get)
      assert(trio.length === 3, s"group $g fully present")
      assert(trio.distinct.length === 1, s"group $g split across hashes")
    }
    // hashes genuinely differentiate content (bits are not degenerate)
    assert(out.map(_._1).distinct.length === out.length)
  }
}
