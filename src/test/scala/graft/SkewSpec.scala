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

  test("winsorized stats: fences clip, interior survives, sum rewrites tails") {
    val s = spark
    import s.implicits._
    // 100 rows of value 1..100 for one type: p01 fence = 1, p99 = 99
    // (cume share of 99 hits 0.99 exactly) → only 100 clips (high).
    val ev = (1 to 100).map(v => ("view", v.toDouble))
      .toDF("event_type", "value")
    val out = Skew.winsorizedCore(ev)
      .as[(String, Long, Long, Long, Double, Double, Double)]
      .collect().head
    // clipped sum = (1..99 sum) + 99 (the 100 row rewritten) = 4950+99-100+100...
    // sum(1..100) = 5050; row 100 rewrites to 99 → 5049
    assert(out === (("view", 100L, 0L, 1L, 1.0, 99.0, 5049.0)))
  }

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
  test("q160 hll mergeability: union of per-type sketches equals a direct global sketch") {
    val out = Skew.hllMergeability(spark, sf).collect()
    val all = out.find(_.getString(0) == "__all__").get
    assert(all.getLong(2) > 0, "global exact count must be carried")
    // observed error within the lgK=12 design envelope, every row
    assert(out.forall(_.getLong(3) < 20000),
      out.map(r => s"${r.getString(0)}:${r.getLong(3)}ppm").mkString(","))
    assert(out.length >= 3, "per-type rows plus the union row")
    // the union row must be BIT-IDENTICAL to sketching the whole table
    // in one pass: HLL merge is register-wise max, lossless at equal lgK
    val direct = Tables.events(spark, sf)
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))))
      .collect().head.getLong(0)
    assert(all.getLong(1) == direct, "sketch union must equal rescan")
  }
  test("q339 md5-HLL twin: every register statistic bit-exact vs a " +
      "plain-Scala replica, and the __all__ row equals both the " +
      "max-merge of per-type registers AND a direct global rescan") {
    val ev = Tables.events(spark, sf)
      .filter(col("user_id").isNotNull && col("event_type").isNotNull)
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def regs(rows: Seq[(String, Long)]): Map[Int, Long] =
      rows.groupBy { case (_, u) =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(u.toString.getBytes("UTF-8")).take(5)
          .map(b => f"$b%02x").mkString
        Integer.parseInt(hex.substring(0, 2), 16)
      }.view.mapValues(_.map { case (_, u) =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(u.toString.getBytes("UTF-8")).take(5)
          .map(b => f"$b%02x").mkString
        val v = java.lang.Long.parseLong(hex.substring(2, 10), 16)
        if (v == 0L) 33L else 33L - java.lang.Long.toBinaryString(v).length
      }.max).toMap
    def stats(r: Map[Int, Long]): (Long, Long, Long) =
      (r.size.toLong, r.values.sum,
        (Skew.hllMd5M - r.size) * 1000000000L
          + r.values.map(m => 1000000000L / (1L << m)).sum)
    val byType = ev.groupBy(_._1).view.mapValues(g => regs(g.toSeq)).toMap
    val got = Skew.hllMd5(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == byType.keySet + "__all__")
    byType.foreach { case (t, r) =>
      val (nz, sr, dn) = stats(r)
      val exact = ev.filter(_._1 == t).map(_._2).distinct.length.toLong
      assert(got(t) == ((nz, sr, dn, exact)), s"$t: ${got(t)}")
    }
    // the law, replica-side: max-merge of per-type register tables ==
    // registers of the whole stream (the oracle proves the same
    // relation cross-engine; this pins it in-process too)
    val mergedRegs = byType.values.flatten
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    assert(mergedRegs == regs(ev.toSeq))
    val (gnz, gsr, gdn) = stats(mergedRegs)
    assert(got("__all__") ==
      ((gnz, gsr, gdn, ev.map(_._2).distinct.length.toLong)))
    assert(byType.size >= 2 && gnz > 0L, "merge law vacuous at this sf")
  }

  test("q161 table stats: null/row accounting consistent, order statistics bounded") {
    val out = Skew.tableStats(spark, sf).collect()
    assert(out.length == 4)
    out.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3),
        s"${r.getString(0)}: n_rows = n_values + n_null")
      assert(r.getLong(4) <= r.getLong(2), "ndv bounded by value count")
      assert(r.getLong(4) > 0)
      val (mn, mx) = (r.getDouble(5), r.getDouble(6))
      val (p25, p50, p75) = (r.getDouble(7), r.getDouble(8), r.getDouble(9))
      assert(mn <= p25 && p25 <= p50 && p50 <= p75 && p75 <= mx,
        s"${r.getString(0)}: quartiles must be ordered within [min, max]")
    }
  }
  test("q164 skew audit arithmetic: known group-size distribution") {
    val s = spark
    import s.implicits._
    // key sizes: 4, 2, 1, 1 → histogram {1:2, 2:1, 4:1}
    val df = Seq(1L, 1L, 1L, 1L, 2L, 2L, 3L, 4L).toDF("k0")
    val r = Skew.skewAuditOne(df, "t.k0", "k0").collect().head
    assert(r.getString(0) == "t.k0")
    assert(r.getLong(1) == 8L && r.getLong(2) == 4L)   // n_rows, n_keys
    // cume shares over sizes 1,2,4: 0.5, 0.75, 1.0
    assert(r.getLong(3) == 1L && r.getLong(4) == 4L)   // p50, p99
    assert(r.getLong(5) == 4L)                         // max_group
    assert(r.getLong(6) == 500000L)                    // 4/8 in ppm
  }

  test("q168 salted join: hot key spreads across salts, result matches the plain join") {
    import org.apache.spark.sql.functions._
    val ev = Tables.eventsMicros(spark, sf).select(
      expr(Skew.skewedKeySql("user_id")).as("k"),
      col("event_id"), col("event_type"), col("value"))
    val compact = Tables.orders(spark, sf)
      .groupBy(expr(Skew.skewedKeySql("o_custkey")).as("k"))
      .agg(count(lit(1)).as("n_orders"))

    // the fixture-free skew is real: the hot key dominates
    val sizes = ev.groupBy("k").agg(count(lit(1)).as("n"))
      .orderBy(desc("n")).collect()
    val maxUnsalted = sizes.head.getLong(1)
    assert(maxUnsalted > 100, s"expected a hot key, got $maxUnsalted")

    // phase 1 bounds the per-partition group: no (k, salt) cell holds
    // more than ~1/saltFactor of the hot key (generous 2× slack for
    // hash imbalance)
    val saltedSizes = Skew.saltedJoin(ev, compact)
      .groupBy("k", "salt").agg(count(lit(1)).as("n"))
      .agg(max("n")).collect().head.getLong(0)
    assert(saltedSizes * Skew.joinSaltFactor <= maxUnsalted * 2,
      s"salting must spread the hot key: max cell $saltedSizes " +
        s"vs unsalted $maxUnsalted")

    // semantically invisible: same multiset of joined rows
    val viaSalt = Skew.saltedJoin(ev, compact)
      .select("k", "event_id", "event_type", "value", "n_orders")
    val plain = ev.join(compact, "k")
      .select("k", "event_id", "event_type", "value", "n_orders")
    assert(viaSalt.exceptAll(plain).isEmpty && plain.exceptAll(viaSalt).isEmpty)

    // and with broadcast off, the join is a shuffle join keyed on
    // (k, salt) — the salt really is in the partitioning
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Skew.saltedJoin(ev, compact)
        .queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        plan.take(600))
      val ji = math.max(plan.indexOf("SortMergeJoin"),
        plan.indexOf("ShuffledHashJoin"))
      assert(plan.substring(ji, plan.indexOf("\n", ji)).contains("salt"),
        "join keys must include the salt")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("q169 string stats: hand fixture — nulls, ndv, lexicographic bounds, exact avg ppm") {
    val s = spark
    import s.implicits._
    val df = Seq(
      Some("aa"), Some("aa"), Some("b"), Some("cccc"), None
    ).toDF("v")
    val r = Skew.stringStatsOne(df, "t", Seq("v")).collect().head
    assert(r.getString(0) == "t.v")
    assert(r.getLong(1) == 5L)      // n_rows
    assert(r.getLong(2) == 4L)      // n_values
    assert(r.getLong(3) == 1L)      // n_null
    assert(r.getLong(4) == 3L)      // ndv
    assert(r.getString(5) == "aa" && r.getString(6) == "cccc")
    assert(r.getLong(7) == 9L)      // len_sum = 2+2+1+4
    assert(r.getLong(8) == 2250000L) // 9·10⁶ div 4
  }

  test("q213 z-score params: exact integer moment identity, truncated " +
    "mean, null variance on a single-value group") {
    val s = spark
    import s.implicits._
    // type a: values 1.0/2.0/3.0 → vm 1000/2000/3000:
    //   mean = 6000 div 3 = 2000
    //   var  = (3·14e6 − 36e6) div (3·2) = 6e6/6 = 1_000_000 milli²
    // type b: 0.0015/0.0035 → vm 1/3: mean = 4 div 2 = 2,
    //   var = (2·10 − 16) div 2 = 2 (exact, no float rounding)
    // type c: single value → variance must be NULL via nullif, not a
    //   division error
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 0.0015), ("b", 0.0035), ("c", 9.0))
      .toDF("event_type", "value")
    val out = Skew.zscoreCore(df).collect()
    val byType = out.map(r => r.getString(0) -> r).toMap
    assert(byType("a").getLong(1) == 3L)
    assert(byType("a").getLong(2) == 2000L)
    assert(byType("a").getLong(3) == 1000000L)
    assert(byType("b").getLong(2) == 2L)
    assert(byType("b").getLong(3) == 2L)
    assert(byType("c").getLong(1) == 1L)
    assert(byType("c").isNullAt(3))
  }
}
