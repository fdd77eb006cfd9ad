package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Sampling

/** Deterministic-sampling contracts: the keep/split decision must be a
  * pure function of (doc_id, salt) — re-runs identical, rule
  * recomputable outside Spark — and stratum rates must track their
  * configured 16ths.
  */
class SamplingSpec extends AnyFunSuite with SparkTestBase {

  private def jvmNibble(docId: Long, salt: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$docId$salt".getBytes("UTF-8"))
    (d(0) >> 4) & 0xf
  }

  test("stratified sample is deterministic and matches a JVM re-computation of the rule") {
    val a = Sampling.stratifiedSample(spark, sf).collect()
    val b = Sampling.stratifiedSample(spark, sf).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.nonEmpty)
    a.foreach { r =>
      val (id, lang) = (r.getLong(0), r.getString(1))
      val rate = Sampling.rateSixteenths.getOrElse(lang, Sampling.defaultSixteenths)
      assert(jvmNibble(id, ":strat") < rate, s"doc $id ($lang) should not be in the sample")
    }
  }

  test("per-stratum sample rates track their configured 16ths") {
    val total = Tables.documents(spark, sf)
      .groupBy("lang").agg(count(lit(1)).as("n"))
    val kept = Sampling.stratifiedSample(spark, sf)
      .groupBy("lang").agg(count(lit(1)).as("k"))
    total.join(kept, Seq("lang"), "left").collect().foreach { r =>
      val lang = r.getString(0)
      val n = r.getLong(1)
      val k = if (r.isNullAt(2)) 0L else r.getLong(2)
      val expect = Sampling.rateSixteenths.getOrElse(lang, Sampling.defaultSixteenths) / 16.0
      // binomial 4-sigma band around the configured rate
      val sigma = math.sqrt(n * expect * (1 - expect))
      assert(math.abs(k - n * expect) <= 4 * sigma + 1,
        s"$lang: kept $k of $n, configured rate $expect")
    }
  }

  test("train/eval split covers every doc exactly once, decisions independent of the sampler") {
    val split = Sampling.trainEvalSplit(spark, sf)
    val n = Tables.documents(spark, sf).count()
    assert(split.count() == n)
    val byside = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byside.keySet == Set("train", "eval"))
    assert(byside("train") + byside("eval") == n)
    // different salt → the eval set must not equal the sample complement
    // (independence smoke check; collision probability is negligible)
    val sampleIds = Sampling.stratifiedSample(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val evalIds = split.filter(col("split") === "eval")
      .collect().map(_.getLong(0)).toSet
    assert(evalIds != sampleIds)
  }

  test("group k-fold: folds 0..3, leakage-free (every user in exactly one fold)") {
    val ev = Tables.eventsMicros(spark, sf)
    val out = Sampling.groupKFoldCore(ev)
    val folds = out.select("fold").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(folds.forall(f => f >= 0 && f < Sampling.kFolds))
    // structural disjointness: assigning per-event reproduces the same
    // user→fold function, so distinct (user, fold) == distinct user
    val assign = ev.select(col("user_id"),
      (conv(substring(md5(concat(col("user_id").cast("string"),
        lit(":fold")).cast("binary")), 1, 1), 16, 10).cast("int")
        / lit(16 / Sampling.kFolds)).cast("long").as("fold"))
    assert(assign.select("user_id", "fold").distinct().count()
      === assign.select("user_id").distinct().count())
    // the audit's user counts add back up to the global distinct count
    val total = out.groupBy("event_type").sum("n_users")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val global = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // per type, Σ over folds = global distinct users of that type —
    // exactly because each user owns one fold
    assert(total === global)
  }

  test("q181: negatives never collide with positives, cap at k per " +
    "user, and are bit-stable across runs") {
    val out = Sampling.negativeSamples(spark, sf).cache()
    try {
      val pos = Tables.orders(spark, sf)
        .join(Tables.lineitem(spark, sf),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("user_id"),
          col("l_partkey").as("item_id")).distinct()
      // no sampled negative is a true positive
      assert(out.join(pos, Seq("user_id", "item_id"), "left_semi")
        .count() == 0)
      // every purchasing user gets some negatives, never more than k
      val perUser = out.groupBy("user_id").count()
      assert(perUser.count() == pos.select("user_id").distinct().count())
      assert(perUser.filter(col("count") > Sampling.negPerUser)
        .count() == 0)
      // item ids stay inside the catalog domain
      val maxItem = Tables.part(spark, sf)
        .agg(max("p_partkey")).collect().head.getLong(0)
      assert(out.filter(col("item_id") < 0 || col("item_id") > maxItem)
        .count() == 0)
      // seed stability: a second evaluation is bit-identical
      val again = Sampling.negativeSamples(spark, sf)
      assert(out.collect().toSeq == again.collect().toSeq)
    } finally out.unpersist()
  }

  test("q184: priority sample equals an independent JVM recomputation " +
    "of the Duffield-Lund-Thorup rule") {
    import spark.implicits._
    val got = Sampling.weightedPrioritySample(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    // independent reference: java MessageDigest md5, BigInteger hex
    // parse, plain Long arithmetic — shares no code with the operator
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice")
      .as[(Long, Double)].collect().toSeq
      .map { case (k, price) =>
        val hex = md.digest(s"$k:wsamp".getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString.take(8)
        val u = java.lang.Long.parseLong(hex, 16) + 1L
        val w = math.floor(price).toLong + 1L
        (k, w, (w * 4294967296L) / u)
      }
      .sortBy { case (k, _, p) => (-p, k) }
      .take(Sampling.prioritySampleK)
    assert(got === expected)
    // higher weight must never lose to a lower weight at the same u —
    // the monotonicity that makes it WEIGHTED sampling
    assert(got.forall { case (_, w, p) => p >= w })
  }

  test("q326: DLT estimates equal an independent replica (tau from the " +
    "k+1-th priority), and the estimated total is near the population") {
    import spark.implicits._
    val k = Sampling.prioritySampleK
    val md = java.security.MessageDigest.getInstance("MD5")
    val all = Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice")
      .as[(Long, Double)].collect().toSeq
      .map { case (key, price) =>
        val hex = md.digest(s"$key:wsamp".getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString.take(8)
        val u = java.lang.Long.parseLong(hex, 16) + 1L
        val w = math.floor(price).toLong + 1L
        (key, w, (w * 4294967296L) / u)
      }
      .sortBy { case (key, _, p) => (-p, key) }
    val tau = if (all.length > k) all(k)._3 else 0L
    val expected = all.take(k).zipWithIndex.map { case ((key, w, p), i) =>
      ((i + 1).toLong, key, w, p, math.max(w, tau)) }
    val got = Sampling.priorityEstimates(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === expected)
    // the DLT property the estimator exists for: the sample's Σŵ sits
    // near the population Σw (unbiased in expectation; this fixed
    // fixture draw lands well inside ±30%)
    val popTotal = all.map(_._2).sum.toDouble
    val estTotal = got.map(_._5).sum.toDouble
    assert(math.abs(estTotal - popTotal) / popTotal < 0.3,
      s"estimated $estTotal vs population $popTotal")
  }

  test("q193: every bootstrap replicate matches an independent JVM " +
    "recomputation of the Poisson weights and weighted means") {
    import spark.implicits._
    val got = Sampling.poissonBootstrap(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) == (0L until Sampling.bootstrapReplicates.toLong))
    val src = Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice")
      .as[(Long, Double)].collect().toSeq
    val md = java.security.MessageDigest.getInstance("MD5")
    def weight(k: Long, b: Int): Long = {
      val h = (md.digest(s"$k:$b:boot".getBytes("UTF-8"))(0) >> 4) & 0xf
      if (h < 6) 0L else if (h < 12) 1L else if (h < 15) 2L else 3L
    }
    val expected = (0 until Sampling.bootstrapReplicates).map { b =>
      val ws = src.map { case (k, p) =>
        (weight(k, b), math.floor(p * 100.0).toLong)
      }
      val n = ws.map(_._1).sum
      val s = ws.map { case (w, c) => BigInt(w) * c }.sum
      (b.toLong, n, (s / n).toLong)
    }
    assert(got === expected)
    // resampling sanity: replicates genuinely differ (not one sample
    // repeated) and every effective size is near n (Poisson(1) mass)
    assert(got.map(_._3).distinct.size > 1)
    val n0 = src.size
    assert(got.forall { case (_, n, _) =>
      n > n0 / 2 && n < n0 * 2 })
  }

  test("q227 stratified top-k: the hash-prefilter plan reproduces the " +
    "naive full-sort ranking exactly, with the prefilter ACTIVE") {
    import spark.implicits._
    // 5000 docs in one stratum with k=10 → thr = 2³²·40/5000 ≪ 2³²,
    // so the prefilter genuinely drops ~99% of rows before ranking —
    // the test would not regress to triviality if thr capped out.
    val k = 10
    val docs = (0L until 5000L).map(i => (if (i % 5 == 0) "aa" else "bb", i))
      .toDF("lang", "doc_id")
    val got = Sampling.stratifiedTopKCore(docs, k)
      .as[(String, Long, Long)].collect().toSeq
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long): String =
      md.digest(s"$id:topk".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
    val naive = Seq("aa", "bb").flatMap { lang =>
      (0L until 5000L).filter(i => (if (i % 5 == 0) "aa" else "bb") == lang)
        .sortBy(i => (key(i), i)).take(k).zipWithIndex
        .map { case (id, r) => (lang, r + 1L, id) }
    }
    assert(got === naive)
  }

  test("q227 stratified top-k: a stratum smaller than k emits all its " +
    "rows, ranked") {
    import spark.implicits._
    val docs = ((0L until 3L).map(("tiny", _)) ++
      (100L until 1100L).map(("big", _))).toDF("lang", "doc_id")
    val got = Sampling.stratifiedTopKCore(docs, 50)
      .as[(String, Long, Long)].collect().toSeq
    assert(got.count(_._1 == "tiny") == 3)
    assert(got.count(_._1 == "big") == 50)
    assert(got.filter(_._1 == "tiny").map(_._2).sorted == Seq(1L, 2L, 3L))
  }

  test("q255 apportionment: allocations sum EXACTLY to the budget and " +
      "largest remainders win the leftover") {
    import spark.implicits._
    // T=10 over weights 1,1,1 → quotas 3.33… : floors 3,3,3, leftover 1
    // → the lexicographically-first lang wins the tie
    val eq = Sampling.apportionCore(
      Seq(("a", 1L), ("b", 1L), ("c", 1L)).toDF("lang", "w"), 10L)
      .collect().map(r => (r.getString(0), r.getLong(4)))
    assert(eq.toSeq == Seq(("a", 4L), ("b", 3L), ("c", 3L)))
    // remainder order ≠ weight order: T=100, w=(10,14,76) → quotas
    // (10, 14, 76) exact… use w=(13,28,59): quotas 13,28,59 exact too.
    // w=(15,22,63)/Σ=100? exact again — pick Σ∤T: w=(1,2,4), T=10 →
    // quotas 10/7,20/7,40/7 = floors 1,2,5 leftover 2; rems 3/7,6/7,5/7
    // → b and c get +1, a (largest floor-gap loser) does not
    val un = Sampling.apportionCore(
      Seq(("a", 1L), ("b", 2L), ("c", 4L)).toDF("lang", "w"), 10L)
      .collect().map(r => (r.getString(0), r.getLong(4)))
    assert(un.toSeq == Seq(("a", 1L), ("b", 3L), ("c", 6L)))
    // the corpus query: exact-sum invariant
    val corpus = Sampling.tokenApportionment(spark, sf).collect()
    assert(corpus.map(_.getLong(4)).sum == Sampling.apportionBudget)
  }

  test("q309 temperature mixture: hand-computed α=0.5 weights, head " +
      "downweighted but never inverted, allocations sum to budget") {
    import spark.implicits._
    // en 900 of 1000 tokens, fr 100: shares 900000/100000 ppm;
    // w = floor(1e6·√share) = 948683 / 316227; tw = 1264910;
    // floors 750000 / 249999, leftover 1 goes to fr (larger remainder
    // 764910 vs 500000) — a 90% head samples at 75%
    val docs = Seq(
      ("en", Seq.fill(900)("t").mkString(" ")),
      ("fr", Seq.fill(100)("t").mkString(" ")))
      .toDF("lang", "text")
    val got = Sampling.temperatureMixtureCore(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == Seq(
      ("en", 900L, 900000L, 948683L, 750000L, 500000L, 750000L),
      ("fr", 100L, 100000L, 316227L, 249999L, 764910L, 250000L)))
    assert(got.map(_._7).sum == Sampling.tempBudget)
    // corpus run: exact budget conservation and order preservation
    val corpus = Sampling.temperatureMixture(spark, sf).collect()
      .map(r => (r.getLong(2), r.getLong(6))).toSeq
    assert(corpus.map(_._2).sum == Sampling.tempBudget)
    assert(corpus.sortBy(_._1).map(_._2) ==
      corpus.sortBy(_._1).map(_._2).sorted,
      "temperature must never invert the share order")
  }

  test("q254 weighted percentiles equal a driver-side replica") {
    val grain = graft.Tables.lineitem(spark, sf)
      .filter(col("l_extendedprice").isNotNull && col("l_quantity").isNotNull)
      .selectExpr("cast(l_extendedprice * 100 as bigint) as v",
        "cast(l_quantity as bigint) as w")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (v, ws) => (v, ws.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    val tot = grain.map(_._2).sum
    var cum = 0L
    val cums = grain.map { case (v, w) => cum += w; (v, cum) }
    val want = graft.ops.GlobalIndex.wpctPs.map(p =>
      p -> cums.find { case (_, c) => c * 100 >= p * tot }.get._1).toMap
    val got = graft.ops.GlobalIndex.weightedPercentiles(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("q286 token-budget selection: greedy prefix in quality order, " +
      "exact-boundary doc excluded, crossing doc included") {
    import spark.implicits._
    // quality (distinct ratio ppm): d1 1e6, d3 1e6, d4 666666, d2 250000
    // total tokens 14 → budget 7; cum before d4 is exactly 7 → excluded
    val docs = Seq(
      (1L, "a b c d"), (2L, "a a a a"), (3L, "x y z"), (4L, "p p q"))
      .toDF("doc_id", "text")
    val out = Sampling.budgetSelectionCore(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((1L, 1000000L, 4L, 4L), (3L, 1000000L, 3L, 7L)))
    // budget crossing mid-doc: d4' = "p q" is now all-distinct (q 1e6),
    // total 13 → budget 6; order d1, d3, d4', d2 — before d3 = 4 < 6 ≤
    // cum 7, so d3 CROSSES the budget and is included; before d4' = 7
    // ≥ 6 → out
    val docs2 = Seq(
      (1L, "a b c d"), (2L, "a a a a"), (3L, "x y z"), (4L, "p q"))
      .toDF("doc_id", "text")
    val out2 = Sampling.budgetSelectionCore(docs2).collect().map(_.getLong(0))
    assert(out2.toSeq === Seq(1L, 3L))
  }

  test("q290 coherent sample: layers equal an in-JVM md5-nibble replica " +
      "and membership is referentially closed") {
    def nib(key: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$key:coh".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      Integer.parseInt(hex.substring(0, 1), 16)
    }
    val custKeys = graft.Tables.customer(spark, sf)
      .select("c_custkey").collect().map(_.getLong(0))
      .filter(nib(_) < Sampling.coherentSixteenths)
    val ordRows = graft.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter(t => nib(t._2) < Sampling.coherentSixteenths)
    val ordKeys = ordRows.map(_._1).toSet
    val liKeys = graft.Tables.lineitem(spark, sf)
      .select("l_orderkey").collect().map(_.getLong(0))
      .filter(ordKeys.contains)
    def ck(ks: Iterable[Long]): Long =
      (ks.map(BigInt(_)).sum % 1000000007).toLong
    val got = Sampling.coherentSample(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq(
      ("1_customer", custKeys.length.toLong, ck(custKeys)),
      ("2_orders", ordRows.length.toLong, ck(ordRows.map(_._1))),
      ("3_lineitem", liKeys.length.toLong, ck(liKeys))))
    // coherence: every sampled order's customer is itself sampled
    val cs = custKeys.toSet
    assert(ordRows.forall(t => cs.contains(t._2)))
  }

  test("q252 rendezvous sharding: movement lands ONLY in the new shard " +
      "and totals reconcile") {
    val rows = Sampling.rendezvousSharding(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq ==
      (0L until Sampling.hrwShardsAfter.toLong))
    // HRW's defining property: resize S→S+1 moves exactly the docs
    // whose new-argmax is the added shard; survivors never reshuffle
    rows.filter(_._1 != Sampling.hrwShards.toLong)
      .foreach { case (s, _, moved) => assert(moved == 0L, s"shard $s") }
    val newShard = rows.find(_._1 == Sampling.hrwShards.toLong).get
    assert(newShard._2 == newShard._3 && newShard._2 > 0)
    val total = rows.map(_._2).sum
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(total == nDocs)
  }

  test("q299 leakage-safe split: groups never straddle, singletons " +
      "agree with q59, and the straddle audit matches a JVM replica") {
    import spark.implicits._
    // ids 1..32 share one text (one dup group); 100 and 101 unique
    val docs = ((1L to 32L).map(i => (i, "same dup text")) ++
      Seq((100L, "unique a"), (101L, "unique b"))).toDF("doc_id", "text")
    val out = Sampling.leakageSafeSplitCore(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getBoolean(4)))
    val naive = (id: Long) =>
      if (jvmNibble(id, ":split") < 14) "train" else "eval"
    val grp = out.filter(_._2 == 1L)
    assert(grp.length == 32 && grp.forall(_._3 == 32L))
    // one split for the whole group, and it is the rep's q59 split
    assert(grp.map(_._4).distinct.toSeq == Seq(naive(1L)))
    // the row-level rule DOES straddle ids 1..32 (independent replica),
    // and the audit flag reports exactly that
    val naiveSides = (1L to 32L).map(naive).distinct.length
    assert(naiveSides == 2, "fixture must exercise the straddle")
    assert(grp.forall(_._5))
    // singletons: rep = self, split = q59's assignment, no straddle
    Seq(100L, 101L).foreach { id =>
      val r = out.find(_._1 == id).get
      assert(r._2 == id && r._3 == 1L && r._4 == naive(id) && !r._5)
    }
  }
}
