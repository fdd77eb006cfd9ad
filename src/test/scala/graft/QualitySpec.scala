package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Quality

/** Data-quality gate contracts: the FK audit must count both directions
  * correctly on a hand-built fixture, and the incremental rollup's
  * merged partials must equal a direct one-pass aggregate exactly.
  */
class QualitySpec extends AnyFunSuite with SparkTestBase {

  test("q129 audit on the real star: clean FKs are clean, the slice extract dangles") {
    val rows = Quality.fkIntegrity(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.size == 4)
    // the unfiltered star is referentially clean
    val clean = rows("orders.o_custkey->customer")
    assert(clean.getLong(2) == 0 && clean.getLong(3) == 0,
      "orders->customer must have zero orphans")
    // the AUTOMOBILE slice extract must dangle: fewer parents, real orphans
    val slice = rows("events.user_id->customer[AUTOMOBILE]")
    val full = rows("events.user_id->customer")
    assert(slice.getLong(4) < full.getLong(4), "slice parent set is smaller")
    assert(slice.getLong(2) > 0, "slice extract must produce orphan events")
    assert(full.getLong(2) == 0, "full dim has no orphan events")
    // n_child is the same child table in both audits
    assert(slice.getLong(1) == full.getLong(1))
  }

  test("q129 audit arithmetic on a hand fixture with orphans and childless parents") {
    import spark.implicits._
    val child = Seq((1L, "a"), (1L, "b"), (2L, "c"), (9L, "d"), (9L, "e"))
      .toDF("fk", "payload")
    val parent = Seq((1L, "p1"), (2L, "p2"), (3L, "p3")).toDF("pk", "name")
    // package through the public surface: a private one-relation audit
    // isn't exposed, so re-derive via fkIntegrity's building blocks —
    // the key-grain full-outer accounting
    val childKeys = child.groupBy(col("fk").as("k")).agg(count(lit(1)).as("cnt"))
    val parentKeys = parent.select(col("pk").as("k"), lit(1).as("hit"))
    val r = childKeys.join(parentKeys, Seq("k"), "full_outer")
      .agg(
        coalesce(sum("cnt"), lit(0L)).as("n_child"),
        coalesce(sum(when(col("hit").isNull, col("cnt"))), lit(0L)).as("n_orphan"),
        count(when(col("hit").isNull, col("k"))).as("n_orphan_keys"),
        count(col("hit")).as("n_parent"),
        count(when(col("cnt").isNull, col("k"))).as("n_childless"))
      .collect().head
    assert(r == Row(5L, 2L, 1L, 3L, 1L),
      s"expected (n_child=5, n_orphan=2 rows d+e, n_orphan_keys=1 key 9, " +
        s"n_parent=3, n_childless=1 key 3); got $r")
  }

  test("q130 split is non-degenerate and merged partials equal the direct aggregate") {
    val parts = Tables.eventsMicros(spark, sf)
      .withColumn("part", Quality.incrSplit)
      .groupBy("part").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(parts.keySet == Set("base", "delta"), s"split degenerate: $parts")

    val merged = Quality.incrementalRollup(spark, sf).collect()
    val direct = Tables.eventsMicros(spark, sf)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,6)")).cast("double"), 2)
          .as("value_sum"),
        min("tsu").as("tsu_min"),
        max("tsu").as("tsu_max"))
      .orderBy("event_type")
      .collect()
    assert(merged.toSeq == direct.toSeq,
      "merge(partial(base), partial(delta)) must equal the one-pass aggregate exactly")
  }

  test("q133 purge: absence proven, rows conserved, list applied as a broadcast anti-join") {
    val ev = Tables.events(spark, sf)
    val survivors = Quality.purgedEvents(spark, sf)
    // ABSENCE: no surviving row belongs to a tombstoned user
    assert(survivors.filter(Quality.purgeNibble === 0).count() == 0)
    // the purge is non-degenerate and conserves rows exactly
    val audit = Quality.compliancePurge(spark, sf).collect()
    val kept = audit.map(_.getLong(1)).sum
    val purged = audit.map(_.getLong(2)).sum
    assert(purged > 0, "tombstone set must bite")
    assert(kept == survivors.count())
    assert(kept + purged == ev.count())
    // the list lands on the fact side as a broadcast anti-join — the
    // one-pass, shuffle-free 100 TB shape
    val plan = survivors.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      plan.take(600))
  }

  test("q153 benford: shared ppm constants are a partition of 1e6; audit covers every order once") {
    // the nine engine/oracle-shared literals must sum to exactly one
    // million — the property that makes the comparison float-free
    assert(Quality.benfordPpm.values.sum == 1000000L)
    assert(Quality.benfordPpm.keySet == (1 to 9).toSet)
    val out = Quality.benfordDigits(spark, sf).collect()
    assert(out.map(_.getInt(0)).toSeq == (1 to 9), "all nine digits present, ordered")
    val inScope = Tables.orders(spark, sf)
      .filter(col("o_totalprice") >= 1).count()
    assert(out.map(_.getLong(1)).sum == inScope, "every order counted exactly once")
    // integer-division shares: each ≤ 1e6, total within 9 ulps of 1e6
    val obsSum = out.map(_.getLong(2)).sum
    assert(obsSum <= 1000000L && obsSum > 1000000L - 9)
    // deviation column is consistent with its two inputs
    out.foreach(r => assert(r.getLong(4) == math.abs(r.getLong(2) - r.getLong(3))))
  }

  test("q157 fd audit arithmetic on a hand fixture: held and violated dependencies") {
    import spark.implicits._
    val df = Seq((1L, "a", 10L), (2L, "a", 10L), (3L, "b", 20L),
      (4L, "b", 21L), (5L, "b", 21L)).toDF("id", "grp", "v")
    // id -> v holds: every LHS group has exactly one RHS value
    val holds = Quality.fdAuditOne(df, "t: id -> v", Seq("id"), "v")
      .collect().head
    assert(holds.getLong(1) == 5 && holds.getLong(2) == 0
      && holds.getLong(3) == 1 && holds.getLong(4) == 0)
    // grp -> v violated by grp=b only (v ∈ {20, 21} over 3 rows)
    val viol = Quality.fdAuditOne(df, "t: grp -> v", Seq("grp"), "v")
      .collect().head
    assert(viol.getLong(1) == 2 && viol.getLong(2) == 1
      && viol.getLong(3) == 2 && viol.getLong(4) == 3)
  }

  test("q157 on the real star: candidate keys hold, known non-keys violate") {
    val rows = Quality.fdAudit(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.size == 6)
    assert(rows("events: event_id -> user_id").getLong(2) == 0,
      "event_id must be a candidate key")
    assert(rows("nation: n_nationkey -> n_regionkey").getLong(2) == 0)
    assert(rows("events: user_id -> event_type").getLong(2) > 0,
      "a user emits more than one event type")
  }

  test("q158 independence lift arithmetic on a hand 2x2 fixture") {
    import spark.implicits._
    val ev = Seq(("A", 0L), ("A", 0L), ("B", 0L), ("B", 1L))
      .toDF("event_type", "dow")
    val out = Quality.independenceLiftCore(ev).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    assert(out.size == 3) // (A,1) never observed → no cell
    // (A,0): ⌊2·4·10⁶ / (2·3)⌋;  (B,0): ⌊1·4·10⁶ / (2·3)⌋;  (B,1): ⌊4·10⁶ / 2⌋
    assert(out(("A", 0L)).getAs[Long]("lift_ppm") == 1333333L)
    assert(out(("B", 0L)).getAs[Long]("lift_ppm") == 666666L)
    assert(out(("B", 1L)).getAs[Long]("lift_ppm") == 2000000L)
    // margins carried through intact
    assert(out(("A", 0L)).getAs[Long]("n_dow") == 3L
      && out(("A", 0L)).getAs[Long]("n_total") == 4L)
  }

  test("q131 mergeSchema read: pre-schema rows surface and nothing is lost") {
    val out = graft.sources.ParquetLayout.schemaEvolutionRollup(spark, sf)
    val byType = out.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType.contains("__pre_schema__"), "v1 shard rows must surface")
    assert(byType.keySet.size > 1, "v2 shard types must surface")
    val total = Tables.eventsMicros(spark, sf).count()
    assert(byType.values.sum == total,
      "two-epoch read must cover every row exactly once")
  }

  test("q187 masked export: join-stable tokens, exact banding, and the " +
    "k-anonymity suppression rule applied row-for-row") {
    val out = Quality.maskedExport(spark, sf)
    val rows = out.collect()
    assert(rows.length == Tables.customer(spark, sf).count(),
      "an export governs rows, it must not drop any")
    // tokens: 16 lowercase hex chars, deterministic across evaluations
    assert(rows.forall(_.getString(2).matches("[0-9a-f]{16}")))
    assert(rows.map(_.getString(2)).toSeq ==
      Quality.maskedExport(spark, sf).collect().map(_.getString(2)).toSeq)
    // suppression: band present iff the cell meets k; present bands
    // are $1000 multiples consistent with the source balance
    val src = Tables.customer(spark, sf)
      .select("c_custkey", "c_acctbal").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val n = r.getLong(4)
      if (n >= 5) {
        assert(!r.isNullAt(3), s"cell of $n must not be suppressed")
        val band = r.getLong(3)
        assert(band % 1000 == 0)
        assert(band == math.floor(src(r.getLong(0)) / 1000.0).toLong * 1000)
      } else assert(r.isNullAt(3), s"cell of $n must be suppressed")
    }
    // tokenization is not the identity and collides only on equal names
    assert(rows.map(_.getString(2)).distinct.length > 1)
  }

  test("q210 source-mix TV arithmetic on a hand fixture, including a " +
    "lang the source has zero docs of") {
    import spark.implicits._
    // X: en×3 fr×1; Y: en×1 fr×3; Z: de×2
    // totals: en 4, fr 4, de 2, N 10
    // X: |3·10−4·4| + |1·10−4·4| + |0·10−2·4| = 14+6+8 = 28
    //    → 28·10⁶ / (2·4·10) = 350000 ppm
    // Y symmetric to X → 350000; Z: (|2·10−2·2|=16) + 8 + 8 = 32
    //    → 32·10⁶ / (2·2·10) = 800000 ppm
    val docs = (Seq.fill(3)(("X", "en")) ++ Seq(("X", "fr")) ++
      Seq(("Y", "en")) ++ Seq.fill(3)(("Y", "fr")) ++
      Seq.fill(2)(("Z", "de"))).toDF("source", "lang")
    val out = graft.ops.Quality.mixTvCore(docs)
      .as[(String, Long, Long)].collect().toSeq
    assert(out === Seq(("X", 4L, 350000L), ("Y", 4L, 350000L),
      ("Z", 2L, 800000L)))
  }

  test("q228 calibration: hand fixture — value-group deciles, ties never " +
    "split, exact ppm rates") {
    import spark.implicits._
    // scores 1..20 once each, 'en' on evens → each decile holds exactly
    // two adjacent scores (one even), positive rate 1/2 everywhere
    val docs = (1L to 20L).map(v =>
      (v, if (v % 2 == 0) "en" else "de")).toDF("n_chars", "lang")
    val out = Quality.calibrationCore(docs)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val expect = (0L until 10L).map(b =>
      (b, 2L, 1L, 2 * b + 1, 2 * b + 2, 500000L))
    assert(out === expect)
    // tie cohesion: one value carrying most of the mass stays in ONE
    // bucket (the q143 whole-value-group convention)
    val tied = (Seq.fill(15)((7L, "en")) ++ Seq((1L, "de"), (9L, "de")))
      .toDF("n_chars", "lang")
    val buckets = Quality.calibrationCore(tied)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // value 7 lands wholly in the bucket of its cum-before (1·10 div 17)
    assert(buckets.count { case (_, _, _, lo, hi, _) => lo <= 7 && 7 <= hi }
      == 1)
    assert(buckets.map(_._2).sum == 17L)
  }

  test("q240: joinability probe — distinct collapse, directional " +
    "containment, truncating ppm") {
    // A rows {1,2,2,3,4,null}; B rows {3,4,4,5}: distinct A={1,2,3,4},
    // B={3,4,5}, overlap {3,4} -> a_in_b = 2/4, b_in_a = 2/3,
    // jaccard = 2/5 (all truncating ppm)
    val s = spark
    import s.implicits._
    val a = Seq(Some(1L), Some(2L), Some(2L), Some(3L), Some(4L), None)
      .toDF("ka")
    val b = Seq(3L, 4L, 4L, 5L).toDF("kb")
    val out = Quality.joinabilityOne("a~b", a, "ka", b, "kb")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().head
    assert(out === (("a~b", 4L, 3L, 2L, 500000L, 666666L, 400000L)))
  }

  test("q253 chi-square: independent table ~0, deterministic table maxes " +
      "at n·(k-1), zero cells contribute") {
    import spark.implicits._
    // perfectly independent 2x2 (counts proportional to margins)
    val ind = (Seq.fill(40)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(80)(("b", "x")) ++ Seq.fill(20)(("b", "y")))
      .toDF("seg", "prio")
    val r0 = Quality.chiSquareCore(ind).collect().head
    assert(r0.getLong(3) == 0L, s"independent table must give 0, got $r0")
    assert(r0.getLong(0) == 4L && r0.getLong(2) == 1L)
    // perfectly dependent (diagonal): chi2 = n·(k-1); its off-diagonal
    // cells are ZERO-observed and still contribute — dropping them
    // would halve the statistic
    val dep = (Seq.fill(30)(("a", "x")) ++ Seq.fill(30)(("b", "y")))
      .toDF("seg", "prio")
    val r1 = Quality.chiSquareCore(dep).collect().head
    assert(r1.getLong(0) == 4L)
    assert(r1.getLong(3) == 60L * 1L * 1000000L,
      s"diagonal 2x2 must give n*(k-1)=60e6, got ${r1.getLong(3)}")
  }

  test("q269 brier decomposition: hand fixture where the Murphy " +
    "identity is exact") {
    val s = spark
    import s.implicits._
    // cells: f=100000 (n=4, pos=2, o=500000), f=500000 (n=1, pos=1,
    // o=1000000); N=5, POS=3, obar=600000.
    // brier=378e9, rel=178e9, res=40e9, unc=240e9 — and
    // 378 = 178 - 40 + 240 (no truncation anywhere in this fixture).
    val docs = Seq(
      (100L, "en"), (100L, "en"), (100L, "de"), (100L, "de"),
      (500L, "en")).toDF("n_chars", "lang")
    val r = Quality.brierCore(docs).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) ===
      ((5L, 378000000000L, 178000000000L, 40000000000L, 240000000000L)))
    assert(r.getLong(1) === r.getLong(2) - r.getLong(3) + r.getLong(4))
  }

  test("q277 ECE: weighted absolute gaps on the q269 fixture") {
    val s = spark
    import s.implicits._
    // same cells as the q269 fixture: f=100000 (n=4, o=500000) gap
    // 400000; f=500000 (n=1, o=1000000) gap 500000 →
    // ECE = (4·400000 + 500000)/5 = 420000, MCE = 500000
    val docs = Seq(
      (100L, "en"), (100L, "en"), (100L, "de"), (100L, "de"),
      (500L, "en")).toDF("n_chars", "lang")
    val r = Quality.calibrationErrorCore(docs).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ===
      ((5L, 420000L, 500000L)))
  }

  test("q270 pass@k: hand-computed estimator, short problems filtered, " +
    "zero-correct is exactly zero") {
    val s = spark
    import s.implicits._
    val samples =
      (1 to 10).map(i => (1L, i <= 2)) ++   // n=10, c=2
      (1 to 12).map(_ => (2L, false)) ++    // n=12, c=0
      (1 to 9).map(_ => (3L, true))         // n=9 → below the floor
    val out = samples.toDF("problem_id", "ok")
    val rows = Quality.passAtKCore(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    // p1 pass@5 = 1 − C(8,5)/C(10,5) = 1 − 56/252 → 0.777778;
    // p1 pass@10: n−c=8 < 10 → certain success = 1.0
    assert(rows.toSeq === Seq(
      (1L, 10L, 2L, 0.2, 0.777778, 1.0),
      (2L, 12L, 0L, 0.0, 0.0, 0.0)))
  }

  test("q273 contribution caps: power-of-two buckets, clip algebra, and " +
    "mass conservation on a hand fixture") {
    import spark.implicits._
    // user a: 1 row (bucket 1), b: 3 rows (bucket 2), c: 40 rows
    // (bucket 32, clipped 40→32)
    val rows = (Seq.fill(1)("a") ++ Seq.fill(3)("b") ++ Seq.fill(40)("c"))
      .toDF("user_id")
    val out = Quality.contributionCapsCore(rows).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq === Seq(
      (1L, 1L, 1L, 1L, 0L, 1L, 1000000L),
      (2L, 1L, 3L, 3L, 0L, 3L, 1000000L),
      (32L, 1L, 40L, 32L, 8L, 40L, 800000L)))
    // kept + clipped = rows, always
    out.foreach { case (_, _, n, kept, clipped, _, _) =>
      assert(kept + clipped === n)
    }
  }

  test("q279 average precision: block-end precision convention and the " +
    "truncating integer chain on a hand fixture") {
    import spark.implicits._
    // blocks desc by score: [10: 2 docs 1 en] [5: 1 doc en] [1: 1 doc de]
    val docs = Seq(
      ("s", 10L, "en"), ("s", 10L, "de"),
      ("s", 5L, "en"), ("s", 1L, "de"),
      // a second source with zero positives → null ap (no division)
      ("t", 7L, "fr"))
      .toDF("source", "n_chars", "lang")
    val out = Quality.apCore(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    // block A end: prec = 1e6*1 div 2 = 500000 (1 pos); block B end:
    // prec = 1e6*2 div 3 = 666666 (1 pos) → ap = 1166666 div 2
    assert(out === Seq(("s", 2L, 2L, 583333L), ("t", 0L, 1L, -1L)))
  }

  test("q280 ndcg: rank-literal discounts, idcg truncation at n_pos, " +
    "and a tie block crossing the k boundary") {
    import spark.implicits._
    val k = Quality.ndcgK
    val d = Quality.ndcgDiscounts.toMap
    val idcg = Quality.ndcgIdcgPrefix.toMap
    // source "s": 12 docs ALL sharing score 100 (tie block wider than
    // k) — ranking falls back to doc_id; positives at doc_id 1, 4, 11
    // (11 lands rank 11 > k → excluded); plus 1 lower-score positive
    val docs = (1L to 12L).map(i =>
      ("s", 100L, i, if (Seq(1L, 4L, 11L).contains(i)) "en" else "de")) :+
      (("s", 50L, 13L, "en"))
    val df = docs.toDF("source", "n_chars", "doc_id", "lang")
    val out = Quality.ndcgCore(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expDcg = d(1L) + d(4L)
    val expN = BigInt(expDcg) * 1000000 / BigInt(idcg(4L))
    assert(out.toSeq === Seq(("s", 4L, expDcg, expN.toLong)))
    // discounts are monotone decreasing and idcg prefixes cumulative
    assert(Quality.ndcgDiscounts.map(_._2) ===
      Quality.ndcgDiscounts.map(_._2).sorted.reverse)
    assert(idcg(k.toLong) === Quality.ndcgDiscounts.map(_._2).sum)
  }

  test("q261 k-anonymity audit: cell mass equals the join, flags match " +
    "their own thresholds, l never exceeds k") {
    val cells = Quality.kAnonymityAudit(spark, sf).collect()
      .map(r => (r.getLong(3), r.getLong(4), r.getBoolean(5), r.getBoolean(6)))
    assert(cells.nonEmpty)
    val joinRows = graft.Tables.customer(spark, sf)
      .join(graft.Tables.orders(spark, sf),
        col("c_custkey") === col("o_custkey")).count()
    assert(cells.map(_._1).sum === joinRows,
      "every joined row must land in exactly one QI cell")
    cells.foreach { case (k, l, kRisk, lRisk) =>
      assert(l >= 1L && l <= k, "l-diversity is bounded by cell size")
      assert(kRisk === (k < 5L))
      assert(lRisk === (l < 2L))
    }
  }

  test("q296 Pareto front: strict dominance, exact-tie retention, and " +
    "per-source independence on a hand fixture") {
    import spark.implicits._
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    val docs = Seq(
      // source S: front = {d3 (3w,10c), d5 (6w,20c)};
      // d1 (5w,20c) is dominated by d5 (more words, same chars),
      // d2 (5w,25c) by d1/d5, d4 (3w,30c) by every other doc
      (1L, "S", words(5), 20L), (2L, "S", words(5), 25L),
      (3L, "S", words(3), 10L), (4L, "S", words(3), 30L),
      (5L, "S", words(6), 20L),
      // source T: exact ties t1/t2 are mutually non-dominating (both
      // kept); t3 (2w,12c) is dominated by them (fewer words, same chars)
      (6L, "T", words(4), 12L), (7L, "T", words(4), 12L),
      (8L, "T", words(2), 12L))
      .toDF("doc_id", "source", "text", "n_chars")
    val out = graft.ops.Quality.paretoFrontCore(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toList
    assert(out === List(
      (3L, "S", 3L, 10L), (5L, "S", 6L, 20L),
      (6L, "T", 4L, 12L), (7L, "T", 4L, 12L)))
  }

  test("q307 DSIR importance equals an independent plain-Scala replica " +
      "(buckets, add-1 ratios, exact mass) on a fixture") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "aa bb"),
      (2L, "fr", "aa aa cc"),
      (3L, "en", "bb cc dd dd"),
      (4L, "de", null.asInstanceOf[String]))
      .toDF("doc_id", "lang", "text")
    val got = Quality.dsirImportanceCore(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    // replica from first principles: md5-first-two-hex bucket, add-1
    // truncating ppm ratio, integer mass — shares no engine code
    def bucket(w: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8"))
      ((d(0) & 0xff).toLong)
    }
    val rows = Seq(
      (1L, "en", Seq("aa", "bb")),
      (2L, "fr", Seq("aa", "aa", "cc")),
      (3L, "en", Seq("bb", "cc", "dd", "dd")))
    val all = rows.flatMap { case (_, lang, ws) => ws.map(w => (lang, bucket(w))) }
    val src = all.groupBy(_._2).map { case (b, xs) => b -> xs.size.toLong }
    val tgt = all.filter(_._1 == "en").groupBy(_._2)
      .map { case (b, xs) => b -> xs.size.toLong }
    def ratio(b: Long): Long =
      (tgt.getOrElse(b, 0L) + 1) * 1000000L / (src(b) + 1)
    val expected = rows.map { case (id, _, ws) =>
      val tf = ws.map(bucket).groupBy(identity)
        .map { case (b, xs) => b -> xs.size.toLong }
      val mass = tf.map { case (b, c) => c * ratio(b) }.sum
      (id, ws.size.toLong, mass, mass / ws.size)
    }.sortBy(_._1)
    assert(got == expected, s"got $got vs $expected")
  }
}
