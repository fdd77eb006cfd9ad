package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.CooccurrenceGraph

/** Co-occurrence graph invariants (danmaku_analysis_cluster.py:131-152
  * semantics): canonical undirected edges, no self-pairs, and the
  * pair-count identity Σ weight = Σ C(|entities|, 2).
  */
class CooccurrenceSpec extends AnyFunSuite with SparkTestBase {

  test("edges are canonical: src < dst always (undirected, no self-pairs)") {
    val e = CooccurrenceGraph.edges(spark, sf)
    assert(e.filter(col("src") >= col("dst")).count() == 0)
  }

  test("Σ edge weights = Σ C(n_entities, 2) over rows") {
    // n*(n-1) summed as long, halved in Scala (Column `/` is double division)
    val nTimesNMinus1 = CooccurrenceGraph.entityRows(spark, sf)
      .select((size(col("entities")) * (size(col("entities")) - 1)).cast("long").as("p2"))
      .agg(sum("p2")).collect()(0).getLong(0)
    val actual = CooccurrenceGraph.edges(spark, sf)
      .agg(sum("weight")).collect()(0).getLong(0)
    assert(actual == nTimesNMinus1 / 2)
  }

  test("node heat counts one mention per document (set semantics)") {
    // Σ heat = Σ |entities| because entityRows already dedupes per row
    val expected = CooccurrenceGraph.entityRows(spark, sf)
      .agg(sum(size(col("entities")))).collect()(0).getLong(0)
    val actual = CooccurrenceGraph.nodes(spark, sf)
      .agg(sum("heat")).collect()(0).getLong(0)
    assert(actual == expected)
  }

  test("degrees: Σ degree = 2 Σ weight (each edge counted at both ends)") {
    val w = CooccurrenceGraph.edges(spark, sf).agg(sum("weight")).collect()(0).getLong(0)
    val deg = CooccurrenceGraph.degrees(spark, sf).agg(sum("degree")).collect()(0).getLong(0)
    assert(deg == 2 * w)
  }
}
