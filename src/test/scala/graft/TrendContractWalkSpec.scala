package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Behavior, CooccurrenceGraph, GraphOps, Quality}

/** Pins for the round-10 batch-2 operators: one-pass OLS trend slopes
  * (q201), the data-contract gate (q202), and deterministic random
  * walks (q203).
  */
class TrendContractWalkSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("q201: exact slope on a hand-built line, truncation on a near-line") {
    val pts = Seq(
      // segment A: exact line y = 1000x + 5 → slope 1000 cents/day
      ("A", 0L, 5L), ("A", 1L, 1005L), ("A", 2L, 2005L),
      // segment B: y decreasing → negative slope -500
      ("B", 10L, 1000L), ("B", 12L, 0L),
      // segment C: single day → zero denominator → null slope
      ("C", 3L, 100L), ("C", 3L, 200L))
      .toDF("segment", "x", "y")
    val out = Behavior.trendCore(pts).collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    assert(out === Seq(
      ("A", 3L, Some(1000000L)),
      ("B", 2L, Some(-500000L)),
      ("C", 2L, None)))
  }

  test("q202: the stale-domain rule fails, uniqueness and bounds pass") {
    val rows = Quality.dataContract(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toMap
    assert(rows.size === 4)
    // event_id is unique in the testdata → ppm = 1e6, pass
    assert(rows("event_id_unique_ppm") === ((1000000L, 1000000L, true)))
    // the deliberately stale domain misses 'error' rows → fail
    val (domObs, domThr, domPass) = rows("type_in_domain_ppm")
    assert(domObs < domThr && !domPass)
    // user ids are non-negative
    assert(rows("user_id_min")._3)
  }

  test("q203: walks follow edges and replay the md5 choice rule") {
    val edges = CooccurrenceGraph.edgeCounts(spark, sf)
    val walks = GraphOps.randomWalks(edges).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    val nodes = edges.select("src").union(edges.select("dst"))
      .distinct().collect().map(_.getString(0)).toSet
    // one walk per node, each with walkLen+1 steps
    val byWalk = walks.groupBy(_._1)
    assert(byWalk.keySet === nodes)
    byWalk.foreach { case (id, steps) =>
      assert(steps.length === GraphOps.walkLen + 1, s"walk $id length")
      assert(steps.minBy(_._2)._3 === id, s"walk $id starts at itself")
    }
    // every consecutive hop is a real (symmetric) edge
    val edgeSet = edges.collect().flatMap { r =>
      val (s, d) = (r.getString(0), r.getString(1))
      Seq(s -> d, d -> s)
    }.toSet
    byWalk.values.foreach { steps =>
      steps.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, a), (_, _, b)) =>
          assert(edgeSet.contains(a -> b), s"hop $a->$b not an edge")
        case _ =>
      }
    }
    // replay one walk's first hop choice in plain JVM code
    val adj = edges.collect().flatMap { r =>
      val (s, d, w) = (r.getString(0), r.getString(1), r.getLong(2))
      Seq((s, d, w), (d, s, w))
    }
    val someNode = nodes.min
    val neigh = adj.filter(_._1 == someNode)
      .sortBy { case (_, d, w) => (-w, d) }.map(_._2)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$someNode:1:$someNode".getBytes("UTF-8"))
    val h = java.lang.Long.parseLong(
      md.take(4).map(b => f"$b%02x").mkString, 16)
    val expected = neigh(((h % neigh.length) + neigh.length).toInt % neigh.length)
    val actual = walks.filter(w => w._1 == someNode && w._2 == 1).head._3
    assert(actual === expected)
  }
}
