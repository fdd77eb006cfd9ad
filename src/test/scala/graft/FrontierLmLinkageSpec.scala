package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.Tables
import graft.ops.{Linkage, Relational, TextAnalysis}

/** Pins for the round-8 batch-2 operators: Pareto frontier dominance
  * rules (q138), bigram next-word conditional counts (q139), and
  * blocked edit-distance linkage (q140) — each on a hand-computed
  * fixture, plus a brute-force cross-check where cheap.
  */
class FrontierLmLinkageSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("pareto frontier: dominance, ties, duplicate collapse") {
    val pts = Seq(
      // segment A: (day, price). Frontier: (5,10), (3,20), (1,30)
      ("A", 10.0, 5L), ("A", 20.0, 3L), ("A", 30.0, 1L),
      ("A", 15.0, 2L),          // dominated by (3,20)
      ("A", 10.0, 4L),          // dominated by (5,10) — same price, later day
      ("A", 5.0, 5L),           // dominated by (5,10) — same day, higher price
      ("A", 30.0, 1L),          // duplicate point → collapses, n_orders=2
      // segment B independent: single point
      ("B", 1.0, 9L)
    ).toDF("c_mktsegment", "price", "day")
    val out = Relational.paretoCore(pts)
      .as[(String, Long, Double, Long)].collect().toSeq
    assert(out === Seq(
      ("A", 1L, 30.0, 2L), ("A", 3L, 20.0, 1L), ("A", 5L, 10.0, 1L),
      ("B", 9L, 1.0, 1L)))
  }

  test("pareto frontier matches brute-force NOT-EXISTS on real data") {
    import org.apache.spark.sql.functions._
    val got = Relational.queries("q138_pareto_frontier")(spark, sf)
      .select("c_mktsegment", "day", "price")
      .as[(String, Long, Double)].collect().toSet
    val all = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_totalprice"),
        expr("cast(o_orderdate as long) div 86400"))
      .as[(String, Double, Long)].collect()
    val want = all.groupBy(_._1).toSeq.flatMap { case (seg, rows) =>
      val pset = rows.map(r => (r._2, r._3)).distinct.toSeq
      pset.filterNot { case (p, d) =>
        pset.exists { case (p2, d2) =>
          p2 >= p && d2 >= d && (p2 > p || d2 > d) }
      }.map { case (p, d) => (seg, d, p) }
    }.toSet
    assert(got === want)
  }

  test("bigram next words: conditional counts, rank cut, p_e8") {
    val docs = Seq(
      (1L, "a b a b a c"),   // bigrams: ab, ba, ab, ba, ac
      (2L, "a b b b"),       // ab, bb, bb
      (3L, "x"),             // too short → no bigrams
      (4L, null)
    ).toDF("doc_id", "text")
    // heads: a→{b:3, c:1} c1=4 ; b→{a:2, b:2} c1=4 ; minHead=4 keeps both
    val out = TextAnalysis.bigramNextWordsCore(docs, minHead = 4L, k = 1)
      .as[(String, Long, String, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("a", 1L, "b", 3L, 4L, 75000000L),
      ("b", 1L, "a", 2L, 4L, 50000000L))) // ties (a:2, b:2) → w2 asc wins
  }

  test("phrase search: top bigram picked, positional adjacency counted") {
    val docs = Seq(
      (1L, "x y x y"),   // "x y" at pos 0 and 2
      (2L, "x y z"),     // "x y" once; "y z" once
      (3L, "a b"),       // unrelated bigram
      (4L, "y x"),       // reverse order — must NOT count
      (5L, null)
    ).toDF("doc_id", "text")
    // bigram counts: "x y"=3, "y x"=2 ("x y x y" has y@1→x@2, plus doc 4),
    // "y z"=1, "a b"=1 → top is "x y"
    val out = TextAnalysis.phraseSearchCore(docs, k = 10)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(out === Seq((1L, "x", "y", 2L), (2L, "x", "y", 1L)))
  }

  test("linkage: blocking bounds pairs; threshold counts only close names") {
    val cust = Seq(
      (1L, "Customer#000000001"), (2L, "Customer#000000002"), // same block, d=1
      (3L, "Customer#000000011"),                             // same block, d=1 to both
      (4L, "Customer#000000101"),                             // different block
      (5L, "Customer#000000102")                              // pairs with 4
    ).toDF("c_custkey", "c_name")
    val out = Linkage.linkageCore(cust)
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    // block "Customer#0000000": members 1,2,3 → 3 cand pairs; all within d≤1?
    // 001↔002 d=1, 001↔011 d=1, 002↔011 d=2 → 2 dup pairs
    // block "Customer#0000001": members 4,5 → 1 cand, 101↔102 d=1 → 1 dup
    assert(out === Seq(
      ("Customer#0000000", 3L, 3L, 2L, false),
      ("Customer#0000001", 2L, 1L, 1L, false)))
  }

  test("linkage: a degenerate block is capped out of the pairwise compare, not detonated") {
    // the quadratic hazard the cap exists for: short names whose
    // blocking key collapses to the SAME degenerate prefix — here 100
    // two-char names block to the empty string (one 100-member block,
    // 4950 pairs if compared); plus one healthy pair that must still
    // be compared normally
    val degenerate = (1L to 100L).map(k => (k, "ZZ"))
    val healthy = Seq((201L, "Customer#000000001"),
      (202L, "Customer#000000002"))
    val out = Linkage.linkageCore(
      (degenerate ++ healthy).toDF("c_custkey", "c_name"))
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    assert(out === Seq(
      // capped: observable (n_members real), zero pairs compared
      ("", 100L, 0L, 0L, true),
      ("Customer#0000000", 2L, 1L, 1L, false)))
    // and the golden-record path holds the same line: every capped
    // member passes through as its own singleton cluster
    val golden = Linkage.goldenCore(spark,
      (degenerate ++ healthy).map { case (k, n) => (k, n, 1.0, "SEG") }
        .toDF("c_custkey", "c_name", "c_acctbal", "c_mktsegment"))
    assert(golden.count() == 101) // 100 singletons + 1 merged pair
  }

  test("q162 golden records: transitive clusters, survivorship rules, singleton pass-through") {
    // cluster {1,2,3}: 2↔3 are d=2 apart but both link to 1 (transitivity);
    // cluster {4,5}; record 9 links to nothing and must pass through
    val cust = Seq(
      (1L, "Customer#000000001", 10.0, "AUTOMOBILE"),
      (2L, "Customer#000000002", 99.5, "BUILDING"),
      (3L, "Customer#000000011", 55.0, "BUILDING"),
      (4L, "Customer#000000101", 7.0, "MACHINERY"),
      (5L, "Customer#000000102", 3.0, "FURNITURE"),
      (9L, "Zzz#unique", 1.0, "HOUSEHOLD")
    ).toDF("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    val out = Linkage.goldenCore(spark, cust)
      .as[(Long, String, String, Double, String, Long)].collect().toSeq
    assert(out === Seq(
      // min-key name survives; BUILDING wins the mode 2:1; max balance
      (1L, "Customer#000000001", "BUILDING", 99.5, "1,2,3", 3L),
      // 1:1 segment tie → lexicographic: FURNITURE < MACHINERY
      (4L, "Customer#000000101", "FURNITURE", 7.0, "4,5", 2L),
      (9L, "Zzz#unique", "HOUSEHOLD", 1.0, "9", 1L)))
  }

  test("jaro-winkler: textbook reference values and edge conventions") {
    import graft.expr.JaroWinkler
    // classic literature pairs (also DuckDB's observed values)
    assert(math.abs(JaroWinkler.sim("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(JaroWinkler.sim("dwayne", "duane") - 0.84) < 1e-12)
    assert(math.abs(JaroWinkler.sim("large ring", "large rod") - 0.8955555555555555) < 1e-12)
    // boost only above 0.7: a low-jaro pair gets NO prefix boost
    assert(JaroWinkler.sim("abcdefgh", "axyzwvut") <= 0.7)
    // DuckDB conventions pinned: either side empty → 0.0 (even both)
    assert(JaroWinkler.sim("", "") === 0.0)
    assert(JaroWinkler.sim("a", "") === 0.0)
    assert(JaroWinkler.sim("abc", "abc") === 1.0)
    // symmetric
    assert(JaroWinkler.sim("blue anvil", "blue bell")
      === JaroWinkler.sim("blue bell", "blue anvil"))
  }

  test("q258 sorted neighborhood: window pairs only, distinct names, jw floor, " +
    "and the rank-block join loses no in-window pair") {
    val out = Linkage.sortedNeighborhood(spark, sf).collect()
    out.foreach { r =>
      assert(r.getString(2) != r.getString(3))
      assert(r.getDouble(4) >= Linkage.snJwMin)
    }
    // independent replication: single-partition window rank + full
    // rank-distance self-join (the formulation the engine avoids)
    val parts = Tables.part(spark, sf).select("p_partkey", "p_name")
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy { case (k, n) => (n, k) }.zipWithIndex
    val expected = (for {
      ((ka, na), ra) <- parts; ((kb, nb), rb) <- parts
      if rb > ra && rb <= ra + Linkage.snWindow && na != nb
      jw = BigDecimal(graft.expr.JaroWinkler.sim(na, nb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if jw >= Linkage.snJwMin
    } yield (ka, kb, jw)).toSet
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getDouble(4))).toSet
      === expected)
  }
}
