package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Customer/example scoring — RFM segmentation (q137) and score-decile
  * lift (q141): the two standard "rank everyone against the population"
  * reads (marketing segmentation; model-eval calibration). Not in the
  * reference (no per-entity scoring of any kind).
  *
  * Both deliberately avoid the textbook `ntile()` formulation: an
  * un-partitioned ranking window is a single-task global sort — the one
  * shape this engine bans at 100 TB. Instead the population quantile
  * BOUNDARIES are computed by the q102 discrete-selection kernel
  * (Skew.cumeCuts — histogram collapse first, so the ordered pass runs
  * over distinct values), broadcast as one tiny row, and every entity
  * scores itself with pure comparisons in the scan stage. Equal values
  * land in the same bucket by construction (ntile would split them
  * arbitrarily across bucket borders — worse semantics AND
  * nondeterministic under ties), and the boundary rule is shared with
  * q102/q119 so the engines can't drift.
  */
object Scoring {

  private val dayS = 86400L

  /** q137 — RFM segmentation: per customer, Recency (days since last
    * order, against the global latest order day), Frequency (order
    * count) and Monetary (exact DECIMAL revenue sum), each scored 1–4
    * by population quartile (4 = best: most recent / most orders /
    * highest spend), concatenated into the classic 3-digit segment.
    * Customers with no orders have no RFM row (nothing to score).
    */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame =
    rfmCore(Tables.orders(spark, dir))

  private[graft] def rfmCore(orders: DataFrame): DataFrame = {
    val dec28 = "decimal(28,6)"
    val o = orders.select(col("o_custkey"),
      col("o_totalprice").cast("decimal(18,6)").as("price_q"),
      expr(s"cast(o_orderdate as long) div $dayS").as("day"))
    val cust = o.groupBy("o_custkey").agg(
      count(lit(1)).as("n_orders"),
      max("day").as("last_day"),
      sum("price_q").as("mon"))
    val maxDay = cust.agg(max("last_day").as("global_last_day"))
    val c = cust.crossJoin(broadcast(maxDay))
      .select(col("o_custkey").as("c_custkey"), col("n_orders"),
        (col("global_last_day") - col("last_day")).as("recency_days"),
        col("mon"))
    // population quartile boundaries via the q102 discrete-selection
    // kernel, one stacked frame so all three metrics share the pass
    val stacked = c.select(lit("f").as("metric"),
        col("n_orders").cast(dec28).as("v"))
      .unionAll(c.select(lit("r").as("metric"),
        col("recency_days").cast(dec28).as("v")))
      .unionAll(c.select(lit("m").as("metric"), col("mon").cast(dec28).as("v")))
    val cuts = Skew.cumeCuts(stacked, "v",
      Seq("q1" -> 0.25, "q2" -> 0.5, "q3" -> 0.75), groupCol = "metric")
    def bounds(m: String) = broadcast(cuts.filter(col("metric") === m)
      .select(col("q1").as(s"${m}_q1"), col("q2").as(s"${m}_q2"),
        col("q3").as(s"${m}_q3")))
    def above(v: Column, m: String): Column =
      Seq("q1", "q2", "q3").map(q =>
        when(v > col(s"${m}_$q"), 1L).otherwise(0L)).reduce(_ + _)
    c.crossJoin(bounds("r")).crossJoin(bounds("f")).crossJoin(bounds("m"))
      .withColumn("r_score", lit(4L) - above(col("recency_days").cast(dec28), "r"))
      .withColumn("f_score", lit(1L) + above(col("n_orders").cast(dec28), "f"))
      .withColumn("m_score", lit(1L) + above(col("mon").cast(dec28), "m"))
      .select(col("c_custkey"), col("n_orders"), col("recency_days"),
        col("mon").cast("double").as("monetary"),
        col("r_score"), col("f_score"), col("m_score"),
        concat(col("r_score").cast("string"), col("f_score").cast("string"),
          col("m_score").cast("string")).as("segment"))
      .orderBy("c_custkey")
  }

  /** The q141 decile cuts: p10..p90. */
  private val decilePs: Seq[Double] = (1 to 9).map(_ / 10.0)

  /** q141 — score-decile lift table: events scored by `value`, labeled
    * by `event_type = 'purchase'`; rows bucket into population deciles
    * (boundary comparisons, same kernel as q137) and each decile
    * reports volume, positives and the exact integer-scaled positive
    * rate — the calibration/lift read that grades any propensity
    * score. pos_rate_e6 is one BIGINT multiply-then-divide (exact in
    * both engines); lift against the base rate is a consumer-side
    * division of two exact rates.
    */
  def decileLift(spark: SparkSession, dir: String): DataFrame =
    decileLiftCore(Tables.eventsMicros(spark, dir)
      .filter(col("value").isNotNull))

  private[graft] def decileLiftCore(ev0: DataFrame): DataFrame = {
    val ev = ev0.select(col("value"),
      when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
    val cuts = Skew.cumeCuts(ev.select(lit("v").as("metric"), col("value")),
      "value", decilePs.map(p => s"p${(p * 100).round}" -> p),
      groupCol = "metric")
    val decile = decilePs.map(p =>
        when(col("value") > col(s"p${(p * 100).round}"), 1L).otherwise(0L))
      .reduce(_ + _) + lit(1L)
    ev.crossJoin(broadcast(cuts.drop("metric")))
      .withColumn("decile", decile)
      .groupBy("decile")
      .agg(count(lit(1)).as("n"), sum("pos").as("n_pos"))
      .withColumn("pos_rate_e6", expr("n_pos * 1000000 div n"))
      .orderBy("decile")
  }

  /** q142 — DISTRIBUTION DRIFT by decile (the PSI-style monitoring
    * read every production model/pipeline needs): decile boundaries
    * are fit on the BASELINE half of the timeline (data-derived
    * midpoint cutoff, q135's convention), both halves bucket by those
    * fixed boundaries, and each bucket reports exact counts and
    * integer-scaled population shares plus the share delta. A drifted
    * feature shows up as mass leaving baseline deciles — visible in
    * delta_e6 without ever computing the ulp-unstable Σ(p−q)·ln(p/q)
    * (the exact counts let a consumer derive any divergence offline).
    *
    * Scale: boundary fit is the q102 kernel on the baseline half
    * (histogram collapse first); bucketing is broadcast comparisons in
    * the scan; the rest is a 10-row aggregate. One full-data exchange.
    */
  def distributionDrift(spark: SparkSession, dir: String): DataFrame =
    driftCore(Tables.eventsMicros(spark, dir)
      .filter(col("value").isNotNull))

  private[graft] def driftCore(ev0: DataFrame): DataFrame = {
    val ev = ev0.select(col("value"), col("tsu"))
    val cutoff = ev.agg(expr("(min(tsu) + max(tsu)) div 2").as("cut_us"))
    val tagged = ev.crossJoin(broadcast(cutoff))
      .withColumn("is_base", col("tsu") < col("cut_us"))
    val cuts = Skew.cumeCuts(
      tagged.filter(col("is_base")).select(lit("v").as("metric"), col("value")),
      "value", decilePs.map(p => s"p${(p * 100).round}" -> p),
      groupCol = "metric")
    val bucket = decilePs.map(p =>
        when(col("value") > col(s"p${(p * 100).round}"), 1L).otherwise(0L))
      .reduce(_ + _) + lit(1L)
    val perBucket = tagged.crossJoin(broadcast(cuts.drop("metric")))
      .withColumn("bucket", bucket)
      .groupBy("bucket")
      .agg(sum(when(col("is_base"), 1L).otherwise(0L)).as("n_base"),
        sum(when(col("is_base"), 0L).otherwise(1L)).as("n_cur"))
    val totals = perBucket.agg(sum("n_base").as("t_base"),
      sum("n_cur").as("t_cur"))
    perBucket.crossJoin(broadcast(totals))
      .withColumn("share_base_e6", expr("n_base * 1000000 div t_base"))
      .withColumn("share_cur_e6", expr("n_cur * 1000000 div t_cur"))
      .select(col("bucket"), col("n_base"), col("n_cur"),
        col("share_base_e6"), col("share_cur_e6"),
        (col("share_cur_e6") - col("share_base_e6")).as("delta_e6"))
      .orderBy("bucket")
  }

  /** q143 — REVENUE CONCENTRATION ("how few customers make 80% of
    * revenue"): exact-decimal per-customer revenue, collapsed to the
    * distinct-revenue histogram, then one descending cumulative pass
    * over DISTINCT values (the q102 trick again — the ordered pass
    * never sees per-customer rows). Prefix cuts use whole-value-group
    * granularity (a cut never splits customers with equal revenue —
    * the deterministic convention; an intra-group split would be
    * arbitrary anyway). The 80% compare is integer-exact
    * (cum·5 ≥ total·4), the decile share is one IEEE division of two
    * exact decimals.
    */
  def revenueConcentration(spark: SparkSession, dir: String): DataFrame =
    concentrationCore(Tables.orders(spark, dir))

  private[graft] def concentrationCore(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cust = orders
      .select(col("o_custkey"),
        col("o_totalprice").cast("decimal(18,6)").as("price_q"))
      .groupBy("o_custkey").agg(sum("price_q").as("rev"))
    // explicit widths so both engines land on DECIMAL(38,6) exactly
    // (implicit promotion would exceed 38 and fall back engine-specific)
    val vals = cust.groupBy("rev").agg(count(lit(1)).as("n_cust"))
      .withColumn("grp_rev",
        expr("CAST(rev AS DECIMAL(30,6)) * CAST(n_cust AS DECIMAL(8,0))"))
    // ordered pass over distinct revenue values only (value-bounded)
    val wDesc = Window.orderBy(desc("rev"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = vals
      .withColumn("cum_cust", sum("n_cust").over(wDesc))
      .withColumn("cum_rev", sum("grp_rev").over(wDesc))
    val totals = vals.agg(sum("n_cust").as("t_cust"),
      sum("grp_rev").as("t_rev"))
    cum.crossJoin(broadcast(totals))
      .agg(
        max("t_cust").as("n_customers"),
        max("t_rev").cast("double").as("total_revenue"),
        min(when(expr("cum_rev * 5 >= t_rev * 4"), col("cum_cust")))
          .as("n_to_80pct"),
        round(min(when(col("cum_cust") >= greatest(lit(1L),
            expr("t_cust div 10")), col("cum_rev"))).cast("double")
          / max("t_rev").cast("double"), 6).as("top_decile_rev_share"))
  }

  /** q218 — TWO-SAMPLE KOLMOGOROV–SMIRNOV statistic: the
    * distribution-shift test that needs NO binning choice at all —
    * q142's PSI deciles quantize (a shift inside one decile is
    * invisible); KS is the supremum gap between the two empirical
    * CDFs, sensitive everywhere. Samples are the q142 timeline halves
    * (baseline = before the data-derived midpoint), so the two tests
    * audit the same split two ways.
    *
    * Exact integers: the frame collapses to VALUE grain (q205's
    * discipline — doubles are only grouped and compared, never summed),
    * cumulative counts come from the TWO-PHASE global prefix sum
    * ([[GlobalIndex.prefixSummedBy]] — range exchange + per-partition
    * partials + broadcast offsets; round-11 ADVICE fix: the previous
    * bare `Window.orderBy("value")` was a single-partition sort that
    * approaches corpus scale on continuous doubles), and the sup gap
    * is max |cum₁·n₂ − cum₂·n₁| — cross-multiplied so no per-value
    * division; one truncating division at the end emits ks_ppm.
    * DECIMAL(38,0) products (cum·n passes 2⁶³ near 3e9-row samples).
    *
    * Scale: one full-data hash agg to value grain; the CDF pass
    * scales like any range shuffle — no distinct-value-domain
    * assumption left. One row out.
    */
  def ksStatistic(spark: SparkSession, dir: String): DataFrame =
    ksCore(Tables.eventsMicros(spark, dir)
      .filter(col("value").isNotNull))

  private[graft] def ksCore(ev0: DataFrame): DataFrame = {
    val ev = ev0.select(col("value"), col("tsu"))
    val cutoff = ev.agg(expr("(min(tsu) + max(tsu)) div 2").as("cut_us"))
    val grain = ev.crossJoin(broadcast(cutoff))
      .groupBy("value")
      .agg(count(when(col("tsu") < col("cut_us"), 1)).as("c1"),
        count(when(col("tsu") >= col("cut_us"), 1)).as("c2"))
    // grain is value-unique (groupBy key) → the two-phase contract holds
    GlobalIndex.prefixSummedBy(grain, Seq("value"), Seq("c1", "c2"))
      .withColumnRenamed("cum_c1", "cum1")
      .withColumnRenamed("cum_c2", "cum2")
      .withColumnRenamed("total_c1", "n1")
      .withColumnRenamed("total_c2", "n2")
      .withColumn("dev",
        expr("""abs(cast(cum1 as decimal(38,0)) * n2
                - cast(cum2 as decimal(38,0)) * n1)"""))
      .agg(max("n1").as("n_base"), max("n2").as("n_current"),
        max("dev").as("sup"))
      .select(col("n_base"), col("n_current"),
        expr("""cast(sup * 1000000
                div nullif(cast(n_base as decimal(38,0)) * n_current, 0)
                as bigint)""").as("ks_ppm"))
  }

  /** q219 — GINI COEFFICIENT of customer revenue: the standard
    * inequality index completing q143's concentration read (top-share
    * answers "how few make 80%"; Gini summarizes the WHOLE Lorenz
    * curve in one number). The textbook all-pairs |xᵢ−xⱼ| definition
    * is quadratic; the order-statistic identity
    * G = Σ(2i−n−1)·x₍ᵢ₎ / (n·Σx) makes it one ranked pass — and the
    * rank comes from the q182 TWO-PHASE numbering (range exchange +
    * local sorts), not a single-partition ntile window, so the ranking
    * scales like any shuffle. (cents, custkey) is a unique total
    * order → the rank, hence the coefficient, is deterministic.
    *
    * Exact: revenue in floor-cents (q201's convention), Σ(rank·x) in
    * DECIMAL(38,0) (passes 2⁶³ almost immediately: rank·cents is
    * ~10¹⁸ at one million customers), one truncating division to
    * gini_ppm.
    */
  def giniRevenue(spark: SparkSession, dir: String): DataFrame =
    giniCore(Tables.orders(spark, dir)
      .groupBy(col("o_custkey").as("ckey"))
      .agg(expr("cast(sum(floor(o_totalprice * 100.0D)) as bigint)")
        .as("cents")))

  /** Over a (ckey, cents) per-entity frame; fixture seam. */
  private[graft] def giniCore(rev: DataFrame): DataFrame =
    GlobalIndex.numberedBy(rev.select(col("cents"), col("ckey")),
        Seq("cents", "ckey"))
      .agg(count(lit(1)).as("n_customers"),
        sum(expr("cast(cents as decimal(38,0))")).as("s"),
        sum(expr("cast(rn as decimal(38,0)) * cents")).as("srx"))
      .select(col("n_customers"), col("s").cast("long").as("total_cents"),
        expr("""cast((2 * srx - (n_customers + 1) * s) * 1000000
                div nullif(n_customers * s, 0) as bigint)""")
          .as("gini_ppm"))

  /** q229 bin count: 1/B relative-error class on the Lorenz curve. */
  private[graft] val giniBins = 256

  /** q229 — BINNED-LORENZ GINI, the sketch twin of q219 for the
    * continuous-value regime (the q102→q149 pattern: the exact kernel
    * is the gate, the sketch is the scale path when the ordered pass
    * over the value domain is itself the bottleneck). q219's two-phase
    * ranking already scales like a shuffle, but it still range-
    * exchanges EVERY entity row; this twin collapses entities to
    * [[giniBins]] equal-WIDTH revenue bins in one hash agg and
    * integrates the Lorenz curve over bins: within-bin order
    * contributes at most the bin's value spread, so the coefficient is
    * exact-to-the-binning — and because the binning rule is pure
    * integer arithmetic ((cents−lo)·B div span), the SKETCH ITSELF is
    * engine-reproducible and oracle-gated, unlike a t-digest.
    * ScoringSpec pins the sketch-vs-exact gap against q219.
    *
    * Grouped-data identity (trapezoid Lorenz, all integers):
    * G·N·S = N·S − Σᵢ nᵢ·(2·cumS₍₋₁₎ + sᵢ) over ascending bins.
    * DECIMAL(38,0) throughout — N·S < 10³⁸ holds to ~10¹² customers ×
    * ~10¹⁷ total cents, far past the 100 TB design point.
    *
    * Scale: one bounds agg + one hash agg to B rows (the rev subplan
    * evaluates once per pass — two passes total, vs q219's one pass +
    * row-grain range exchange); the ordered pass is O(B) on one task.
    */
  def giniBinned(spark: SparkSession, dir: String): DataFrame =
    giniBinnedCore(Tables.orders(spark, dir)
      .groupBy(col("o_custkey").as("ckey"))
      .agg(expr("cast(sum(floor(o_totalprice * 100.0D)) as bigint)")
        .as("cents")))

  /** Over a (ckey, cents) per-entity frame; fixture seam. */
  private[graft] def giniBinnedCore(rev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = rev.agg(min("cents").as("lo"), max("cents").as("hi"))
    val binned = rev.crossJoin(broadcast(b))
      .withColumn("bin", expr(
        s"""cast((cast(cents as decimal(38,0)) - lo) * $giniBins
            div (cast(hi as decimal(38,0)) - lo + 1) as bigint)"""))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_i"),
        sum(expr("cast(cents as decimal(38,0))")).as("s_i"))
    // B-row frame: the single-partition ordered pass is O(B), by design
    val w = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, -1)
    binned
      .withColumn("cum_prev",
        coalesce(sum("s_i").over(w), lit(0).cast("decimal(38,0)")))
      .agg(sum("n_i").as("n"), sum("s_i").as("s"),
        sum(expr("cast(n_i as decimal(38,0)) * (2 * cum_prev + s_i)"))
          .as("t"))
      .select(col("n").as("n_customers"),
        col("s").cast("long").as("total_cents"),
        expr("""cast((cast(n as decimal(38,0)) * s - t) * 1000000
                div nullif(cast(n as decimal(38,0)) * s, 0) as bigint)""")
          .as("gini_binned_ppm"))
  }

  /** q238's two cohorts — event types whose `value` distributions the
    * test compares. ONE definition shared with the interpolated oracle.
    */
  private[graft] val mwuGroupA = "purchase"
  private[graft] val mwuGroupB = "click"

  /** q238 — MANN–WHITNEY U (rank-sum) test: do purchase values
    * stochastically dominate click values? The nonparametric
    * two-sample location test completing q218's KS (KS asks "are the
    * distributions DIFFERENT anywhere"; U asks "is one SHIFTED above
    * the other" and yields the common-language effect size
    * P(A > B) + ½P(A = B)).
    *
    * Exact integers throughout: value-grain collapse (q205's
    * discipline), cumulative counts from the two-phase global prefix
    * sum (q218's kernel — no single-partition window), tied ranks by
    * the midrank convention DOUBLED so they stay integral
    * (2·midrank of a tie block = 2·cum_before + cnt + 1), so
    * 2R₁ = Σ c₁·rank2 and 2U₁ = 2R₁ − n₁(n₁+1) are exact
    * DECIMAL(38,0); cles_ppm = 2U₁·10⁶ div (2n₁n₂). u_a_x2 emits as
    * BIGINT — past n ≈ 2·10⁹ per cohort that cast would overflow and
    * ANSI RAISES (the Exact stance: fail loudly, never saturate);
    * cles_ppm stays valid to any n.
    */
  def mannWhitneyU(spark: SparkSession, dir: String): DataFrame =
    mwuCore(Tables.events(spark, dir)
      .filter(col("value").isNotNull &&
        col("event_type").isin(mwuGroupA, mwuGroupB))
      .select(col("value"), (col("event_type") === mwuGroupA).as("is_a")))

  /** Over a (value, is_a) frame; fixture seam for the spec. */
  private[graft] def mwuCore(ev: DataFrame): DataFrame = {
    val grain = ev.groupBy("value")
      .agg(count(lit(1)).as("cnt"), count(when(col("is_a"), 1)).as("ca"))
    // grain is value-unique (groupBy key) → the two-phase contract holds
    GlobalIndex.prefixSummedBy(grain, Seq("value"), Seq("cnt"))
      .withColumn("rank2", expr("2 * (cum_cnt - cnt) + cnt + 1"))
      .agg(max("total_cnt").as("n_tot"),
        sum("ca").as("n_a"),
        sum(expr("cast(ca as decimal(38,0)) * rank2")).as("r_a_x2"))
      .select(col("n_a"),
        expr("n_tot - n_a").as("n_b"),
        expr("""cast(r_a_x2 - cast(n_a as decimal(38,0)) * (n_a + 1)
                as bigint)""").as("u_a_x2"),
        expr("""cast((r_a_x2 - cast(n_a as decimal(38,0)) * (n_a + 1))
                  * 1000000
                div nullif(2 * cast(n_a as decimal(38,0)) * (n_tot - n_a), 0)
                as bigint)""").as("cles_ppm"))
  }

  /** q239 — SPEARMAN RANK CORRELATION between order quantity and line
    * price: the monotone-association readout completing the stats
    * family (q25 Pearson assumes linearity; q238's U compares two
    * cohorts; Spearman asks "do these two columns RANK together"
    * across one population, robust to any monotone transform and to
    * outliers).
    *
    * Scale shape: each column collapses to VALUE grain (one hash agg),
    * gets exact doubled midranks from the two-phase global prefix sum
    * (q238's kernel — no single-partition window, no row-grain ordered
    * pass), and the tiny rank tables join back to rows by value — the
    * x side is a broadcast (bounded quantity domain), the y side a
    * shuffle equi-join that scales like any join. One final hash agg
    * folds the five sufficient statistics.
    *
    * Exactness stance (q237's): Σr, Σr², Σrᵪrᵧ are exact
    * DECIMAL(38,0) over doubled midranks (rank2 ≤ 2n ⇒ n·Σrᵪrᵧ ≤ 4n⁴,
    * exact to n ≈ 2·10⁹ rows; past that ANSI RAISES, never saturates);
    * the final ρ casts the exact centered moments to DOUBLE — both
    * engines correctly-round the same integers to the same binary64,
    * run the identical sqrt/divide tree, and round to 6dp.
    * Doubling the midranks cancels in ρ (scale-invariance), so no
    * halving step exists to drift.
    */
  def spearmanCorr(spark: SparkSession, dir: String): DataFrame =
    spearmanCore(Tables.lineitem(spark, dir)
      .filter(col("l_quantity").isNotNull && col("l_extendedprice").isNotNull)
      .select(expr("cast(floor(l_quantity) as bigint)").as("x"),
        expr("cast(floor(l_extendedprice * 100.0D) as bigint)").as("y")))

  /** Over an (x, y) BIGINT frame; fixture seam for the spec. */
  private[graft] def spearmanCore(pts: DataFrame): DataFrame = {
    // ONE boundary pass for BOTH ranked columns (r11 verdict task 3):
    // both range-bucketing boundary arrays come from a single
    // aggregate over pts instead of one approx-quantile job per
    // column, each re-scanning the upstream lineage. Row-grain
    // quantiles stand in for value-grain ones — boundaries steer
    // balance only, never rank values, so the hash is unchanged.
    val bounds = GlobalIndex.probeBounds(pts, Seq("x", "y"))
    def rank2Of(cn: String): DataFrame = {
      val grain = pts.groupBy(cn).agg(count(lit(1)).as("cnt"))
      GlobalIndex.prefixSummedBy(grain, Seq(cn), Seq("cnt"),
          Some(bounds(cn)))
        .select(col(cn), expr("2 * (cum_cnt - cnt) + cnt + 1").as(s"r$cn"))
    }
    pts.join(rank2Of("x"), Seq("x"))
      .join(rank2Of("y"), Seq("y"))
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(rx as decimal(38,0))")).as("sx"),
        sum(expr("cast(ry as decimal(38,0))")).as("sy"),
        sum(expr("cast(rx as decimal(38,0)) * rx")).as("sxx"),
        sum(expr("cast(ry as decimal(38,0)) * ry")).as("syy"),
        sum(expr("cast(rx as decimal(38,0)) * ry")).as("sxy"))
      .select(col("n").as("n_rows"),
        expr("""round(cast(n * sxy - sx * sy as double)
                / nullif(sqrt(cast(n * sxx - sx * sx as double))
                       * sqrt(cast(n * syy - sy * sy as double)), 0.0D),
                6)""").as("rho"))
  }

  /** q293 — CROSS-SOURCE QUANTILE NORMALIZATION: map each document's
    * per-source percentile of `n_chars` onto the GLOBAL value at that
    * percentile — the calibration step a mixing pipeline runs before
    * comparing scores across heterogeneous sources (a "long doc" from
    * a short-form source and one from a book corpus sit at the same
    * source-percentile but wildly different raw values; after
    * normalization both carry the corpus-wide value for their rank).
    * Nearest-rank-below mapping, no interpolation: target global rank
    * = 1 + ⌊pr·(N−1)/10⁶⌋ over the (n_chars, doc_id) total order.
    * All exact integers: the source percentile is the ANSI
    * percent_rank rational (rank−1)/(n−1) as one truncating ppm
    * division (single-doc source → 0 ppm), and every product that
    * multiplies a ppm or a rank by a corpus count rides DECIMAL(38,0)
    * (BIGINT wraps past ~9.2·10¹² docs — the q198 discipline).
    *
    * Scale: NO per-source ranking window (partition-by-source is a
    * handful of corpus-sized single tasks — the skew this module's
    * header bans), and no source-leading sort key either (the range
    * partitioner draws its bounds from the LEADING column, so a
    * per-source constant would put each source in one pid — the same
    * single-task shape through the back door; caught in r13 review).
    * ONE value-balanced range partition on (n_chars, doc_id) serves
    * both rank passes: each pid holds a value-range slice of EVERY
    * source, per-source row numbers come from local (pid, source)
    * sorts plus a |pids|×|sources| offsets frame prefix-summed per
    * source (the q182 two-phase discipline at the (pid, source)
    * grain), tie semantics exactly ANSI rank() via the value-grain
    * first-row-number collapse; the global map side reuses the SAME
    * ranged frame with pid-level offsets, consumed by an equi-join
    * on the computed target rank. NULL source is excluded
    * symmetrically in engine and oracle (the q280 discipline).
    */
  def quantileNormalize(spark: SparkSession, dir: String): DataFrame =
    quantileNormCore(Tables.documents(spark, dir))

  /** Core over any (doc_id, source, n_chars) frame — fixture seam. */
  private[graft] def quantileNormCore(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs.filter(col("n_chars").isNotNull && col("source").isNotNull)
      .select("doc_id", "source", "n_chars")
    // one range partition, four consumers → eager checkpoint (the
    // q276/q284 one-scan rule)
    val ranged = GlobalIndex.rangedDeterministic(d, Seq("n_chars", "doc_id"))
      .localCheckpoint(true)
    val local = ranged.withColumn("lrn",
      row_number().over(Window.partitionBy("pid", "source")
        .orderBy("n_chars", "doc_id")).cast("long"))
    val offs = local.groupBy("pid", "source").agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(sum("cnt").over(
        Window.partitionBy("source").orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("pid", "source", "off")
    val rowNum = local.join(broadcast(offs), Seq("pid", "source"))
      .withColumn("src_rownum", col("off") + col("lrn"))
    // ANSI rank(): ties share the first row number of their value group
    val valFirst = rowNum.groupBy("source", "n_chars")
      .agg(min("src_rownum").as("src_rank"))
    val nSrc = rowNum.groupBy("source").agg(count(lit(1)).as("n_src"))
    // global side: same ranged frame, pid-local numbering + the
    // O(#partitions) offsets window (the numberedBy shape inlined so
    // the scan is shared)
    val gloc = ranged.withColumn("glrn",
      row_number().over(Window.partitionBy("pid")
        .orderBy("n_chars", "doc_id")).cast("long"))
    val goffs = gloc.groupBy("pid").agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(sum("cnt").over(Window.orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("pid", "off")
    val g = gloc.join(broadcast(goffs), Seq("pid"))
      .select((col("off") + col("glrn")).as("g_rn"),
        col("n_chars").as("norm_chars"))
    val nTot = d.agg(count(lit(1)).as("n_g"))
    rowNum.join(valFirst, Seq("source", "n_chars"))
      .join(broadcast(nSrc), Seq("source"))
      .withColumn("src_pr_ppm",
        when(col("n_src") === 1L, 0L)
          .otherwise(expr("""cast(cast(src_rank - 1 as decimal(38,0))
                             * 1000000 div (n_src - 1) as bigint)""")))
      .crossJoin(broadcast(nTot))
      .withColumn("target_rn",
        expr("""cast(cast(src_pr_ppm as decimal(38,0)) * (n_g - 1)
                div 1000000 as bigint) + 1"""))
      .join(g, col("target_rn") === col("g_rn"))
      .select("doc_id", "source", "n_chars", "src_rank", "n_src",
        "src_pr_ppm", "norm_chars")
      .orderBy("doc_id")
  }

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q293_quantile_normalize" -> (quantileNormalize(_, _)),
    "q229_gini_binned" -> (giniBinned(_, _)),
    "q218_ks_statistic" -> (ksStatistic(_, _)),
    "q238_mann_whitney_u" -> (mannWhitneyU(_, _)),
    "q239_spearman_corr" -> (spearmanCorr(_, _)),
    "q219_gini_revenue" -> (giniRevenue(_, _)),
    "q137_rfm_segments" -> (rfmSegments(_, _)),
    "q141_decile_lift" -> (decileLift(_, _)),
    "q142_distribution_drift" -> (distributionDrift(_, _)),
    "q143_revenue_concentration" -> (revenueConcentration(_, _)))

  /** Shared SQL fragment: the discrete-selection boundary rule (must
    * stay textually in sync with q102's oracle — same rule).
    */
  private def cutSql(ps: Seq[(String, Double)]): String =
    ps.map { case (name, p) =>
      s"min(v) FILTER (WHERE cum::DOUBLE / n::DOUBLE >= ${p}::DOUBLE) AS $name"
    }.mkString(",\n             ")

  val oracles: Map[String, String] = Map(
    // q293: ANSI rank()/row_number() windows replay the two-phase
    // numbering's tie semantics exactly; same truncating ppm and
    // nearest-rank-below arithmetic in HUGEINT
    "q293_quantile_normalize" ->
      """WITH d AS (
            SELECT doc_id, source, n_chars FROM documents
            WHERE n_chars IS NOT NULL AND source IS NOT NULL),
          s AS (
            SELECT doc_id, source, n_chars,
              rank() OVER (PARTITION BY source ORDER BY n_chars)::BIGINT
                AS src_rank,
              count(*) OVER (PARTITION BY source)::BIGINT AS n_src
            FROM d),
          g AS (
            SELECT n_chars AS norm_chars,
              row_number() OVER (ORDER BY n_chars, doc_id)::BIGINT AS g_rn
            FROM d),
          n AS (SELECT count(*)::BIGINT AS n_g FROM d),
          t AS (
            SELECT s.*, CASE WHEN n_src = 1 THEN 0::BIGINT
              ELSE ((src_rank - 1)::HUGEINT * 1000000
                    // (n_src - 1))::BIGINT END AS src_pr_ppm
            FROM s),
          m AS (
            SELECT t.*,
              (src_pr_ppm::HUGEINT * (n_g - 1) // 1000000)::BIGINT + 1
                AS target_rn
            FROM t, n)
          SELECT doc_id, source, n_chars, src_rank, n_src, src_pr_ppm,
            norm_chars
          FROM m JOIN g ON m.target_rn = g.g_rn
          ORDER BY doc_id""",
    // q229: same integer bin rule, same grouped-Lorenz identity in
    // HUGEINT, same truncating division — the sketch is deterministic
    "q229_gini_binned" ->
      s"""WITH r AS (
            SELECT o_custkey AS ckey,
              CAST(sum(floor(o_totalprice * CAST(100.0 AS DOUBLE)))
                AS BIGINT) AS cents
            FROM orders GROUP BY 1),
          b AS (SELECT min(cents) AS lo, max(cents) AS hi FROM r),
          g AS (
            SELECT ((cents::HUGEINT - lo) * $giniBins
                    // (hi::HUGEINT - lo + 1))::BIGINT AS bin,
              count(*)::BIGINT AS n_i, sum(cents::HUGEINT) AS s_i
            FROM r, b GROUP BY 1),
          c AS (
            SELECT *, coalesce(sum(s_i) OVER (ORDER BY bin
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              0) AS cum_prev
            FROM g),
          t AS (
            SELECT sum(n_i) AS n, sum(s_i) AS s,
              sum(n_i::HUGEINT * (2 * cum_prev + s_i)) AS t
            FROM c)
          SELECT n::BIGINT AS n_customers, s::BIGINT AS total_cents,
            ((n::HUGEINT * s - t) * 1000000
             // nullif(n::HUGEINT * s, 0))::BIGINT AS gini_binned_ppm
          FROM t""",
    // q238: same value-grain collapse, same doubled-midrank identity
    // (2·cum_before + cnt + 1), same HUGEINT rank-sum and truncating
    // effect-size division
    "q238_mann_whitney_u" ->
      s"""WITH ev AS (
            SELECT value, event_type = '$mwuGroupA' AS is_a
            FROM events WHERE value IS NOT NULL
              AND event_type IN ('$mwuGroupA', '$mwuGroupB')),
          g AS (
            SELECT value, count(*)::BIGINT AS cnt,
              (count(*) FILTER (is_a))::BIGINT AS ca
            FROM ev GROUP BY 1),
          p AS (
            SELECT *, sum(cnt) OVER (ORDER BY value
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cnt
            FROM g),
          a AS (
            SELECT sum(ca)::HUGEINT AS n_a,
              sum(cnt)::HUGEINT AS n_tot,
              sum(ca::HUGEINT * (2 * (cum_cnt - cnt) + cnt + 1)) AS r_a_x2
            FROM p)
          SELECT n_a::BIGINT AS n_a, (n_tot - n_a)::BIGINT AS n_b,
            (r_a_x2 - n_a * (n_a + 1))::BIGINT AS u_a_x2,
            ((r_a_x2 - n_a * (n_a + 1)) * 1000000
             // nullif(2 * n_a * (n_tot - n_a), 0))::BIGINT AS cles_ppm
          FROM a""",
    // q239: same value-grain doubled midranks (2·cum_before + cnt + 1),
    // same HUGEINT sufficient statistics, same double solve + round 6dp
    "q239_spearman_corr" ->
      """WITH t AS (
            SELECT floor(l_quantity)::BIGINT AS x,
              floor(l_extendedprice * 100)::BIGINT AS y
            FROM lineitem
            WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
          gx AS (SELECT x, count(*)::BIGINT AS cnt FROM t GROUP BY 1),
          rx AS (
            SELECT x, 2 * (sum(cnt) OVER (ORDER BY x
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
              + cnt + 1 AS rx
            FROM gx),
          gy AS (SELECT y, count(*)::BIGINT AS cnt FROM t GROUP BY 1),
          ry AS (
            SELECT y, 2 * (sum(cnt) OVER (ORDER BY y
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
              + cnt + 1 AS ry
            FROM gy),
          s AS (
            SELECT count(*)::HUGEINT AS n,
              sum(rx::HUGEINT) AS sx, sum(ry::HUGEINT) AS sy,
              sum(rx::HUGEINT * rx) AS sxx, sum(ry::HUGEINT * ry) AS syy,
              sum(rx::HUGEINT * ry) AS sxy
            FROM t JOIN rx USING (x) JOIN ry USING (y))
          SELECT n::BIGINT AS n_rows,
            round((n * sxy - sx * sy)::DOUBLE
              / nullif(sqrt((n * sxx - sx * sx)::DOUBLE)
                     * sqrt((n * syy - sy * sy)::DOUBLE), 0), 6) AS rho
          FROM s""",
    // q218: same midpoint split, same value-grain cumulative counts,
    // same cross-multiplied sup gap in HUGEINT
    "q218_ks_statistic" ->
      """WITH ev AS (
           SELECT value, epoch_ns(ts) // 1000 AS tsu
           FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
         p AS (SELECT (min(tsu) + max(tsu)) // 2 AS cut FROM ev),
         g AS (
           SELECT value,
             count(*) FILTER (WHERE tsu < (SELECT cut FROM p)) AS c1,
             count(*) FILTER (WHERE tsu >= (SELECT cut FROM p)) AS c2
           FROM ev GROUP BY 1),
         c AS (
           SELECT
             sum(c1) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
             sum(c2) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2,
             sum(c1) OVER () AS n1, sum(c2) OVER () AS n2
           FROM g)
         SELECT max(n1)::BIGINT AS n_base, max(n2)::BIGINT AS n_current,
           (max(abs(cum1::HUGEINT * n2 - cum2::HUGEINT * n1)) * 1000000
            // nullif(max(n1)::HUGEINT * max(n2), 0))::BIGINT AS ks_ppm
         FROM c""",
    // q219: same (cents, ckey) total order, same order-statistic
    // identity in HUGEINT, same truncating division
    "q219_gini_revenue" ->
      """WITH r AS (
           SELECT o_custkey AS ckey,
             CAST(sum(floor(o_totalprice * CAST(100.0 AS DOUBLE)))
               AS BIGINT) AS cents
           FROM orders GROUP BY 1),
         k AS (
           SELECT cents,
             row_number() OVER (ORDER BY cents, ckey) AS rn
           FROM r)
         SELECT count(*)::BIGINT AS n_customers,
           sum(cents)::BIGINT AS total_cents,
           ((2 * sum(rn::HUGEINT * cents)
             - (count(*) + 1) * sum(cents::HUGEINT)) * 1000000
            // nullif(count(*)::HUGEINT * sum(cents), 0))::BIGINT
             AS gini_ppm
         FROM k""",
    "q137_rfm_segments" ->
      s"""WITH o AS (
            SELECT o_custkey,
                   CAST(o_totalprice AS DECIMAL(18,6)) AS price_q,
                   epoch_ms(o_orderdate) // 1000 // $dayS AS day
            FROM orders),
          cust AS (
            SELECT o_custkey AS c_custkey, count(*) AS n_orders,
                   (SELECT max(day) FROM o) - max(day) AS recency_days,
                   sum(price_q) AS mon
            FROM o GROUP BY 1),
          stacked AS (
            SELECT 'f' AS metric, CAST(n_orders AS DECIMAL(28,6)) AS v FROM cust
            UNION ALL SELECT 'r', CAST(recency_days AS DECIMAL(28,6)) FROM cust
            UNION ALL SELECT 'm', CAST(mon AS DECIMAL(28,6)) FROM cust),
          g AS (SELECT metric, v, count(*) AS c FROM stacked GROUP BY 1, 2),
          cum AS (SELECT metric, v,
                    sum(c) OVER (PARTITION BY metric ORDER BY v) AS cum,
                    sum(c) OVER (PARTITION BY metric) AS n
                  FROM g),
          cuts AS (SELECT metric,
             ${cutSql(Seq("q1" -> 0.25, "q2" -> 0.5, "q3" -> 0.75))}
           FROM cum GROUP BY 1),
          r AS (SELECT q1, q2, q3 FROM cuts WHERE metric = 'r'),
          f AS (SELECT q1, q2, q3 FROM cuts WHERE metric = 'f'),
          m AS (SELECT q1, q2, q3 FROM cuts WHERE metric = 'm'),
          scored AS (
            SELECT c.c_custkey, c.n_orders, c.recency_days,
              CAST(c.mon AS DOUBLE) AS monetary,
              4 - ((CAST(c.recency_days AS DECIMAL(28,6)) > r.q1)::BIGINT
                 + (CAST(c.recency_days AS DECIMAL(28,6)) > r.q2)::BIGINT
                 + (CAST(c.recency_days AS DECIMAL(28,6)) > r.q3)::BIGINT)
                AS r_score,
              1 + ((CAST(c.n_orders AS DECIMAL(28,6)) > f.q1)::BIGINT
                 + (CAST(c.n_orders AS DECIMAL(28,6)) > f.q2)::BIGINT
                 + (CAST(c.n_orders AS DECIMAL(28,6)) > f.q3)::BIGINT)
                AS f_score,
              1 + ((CAST(c.mon AS DECIMAL(28,6)) > m.q1)::BIGINT
                 + (CAST(c.mon AS DECIMAL(28,6)) > m.q2)::BIGINT
                 + (CAST(c.mon AS DECIMAL(28,6)) > m.q3)::BIGINT)
                AS m_score
            FROM cust c, r, f, m)
          SELECT c_custkey, n_orders, recency_days, monetary,
            r_score, f_score, m_score,
            r_score::VARCHAR || f_score::VARCHAR || m_score::VARCHAR
              AS segment
          FROM scored ORDER BY c_custkey""",
    // q142: boundaries fit on the pre-cutoff half only, identical cume
    // rule; shares are exact BIGINT multiply-then-floor-divide
    "q142_distribution_drift" -> {
      val dec = decilePs.map(p =>
        s"(value > p${(p * 100).round})::BIGINT").mkString(" + ")
      s"""WITH ev AS (
            SELECT value, epoch_ns(ts) // 1000 AS tsu
            FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
          cut AS (SELECT (min(tsu) + max(tsu)) // 2 AS cut_us FROM ev),
          t AS (SELECT value, tsu < (SELECT cut_us FROM cut) AS is_base
                FROM ev),
          g AS (SELECT value AS v, count(*) AS c FROM t
                WHERE is_base GROUP BY 1),
          cum AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum,
                    sum(c) OVER () AS n FROM g),
          cuts AS (SELECT
             ${cutSql(decilePs.map(p => s"p${(p * 100).round}" -> p))}
           FROM cum),
          b AS (SELECT 1 + ($dec) AS bucket,
                  sum(CASE WHEN is_base THEN 1 ELSE 0 END)::BIGINT AS n_base,
                  sum(CASE WHEN is_base THEN 0 ELSE 1 END)::BIGINT AS n_cur
                FROM t, cuts GROUP BY 1),
          tot AS (SELECT sum(n_base)::BIGINT AS t_base,
                    sum(n_cur)::BIGINT AS t_cur FROM b)
          SELECT bucket, n_base, n_cur,
            (n_base * 1000000) // t_base AS share_base_e6,
            (n_cur * 1000000) // t_cur AS share_cur_e6,
            (n_cur * 1000000) // t_cur - (n_base * 1000000) // t_base
              AS delta_e6
          FROM b, tot ORDER BY bucket"""
    },
    // q143: identical distinct-value cumulative pass; the 80% compare
    // is decimal-exact, the decile share one IEEE division
    "q143_revenue_concentration" ->
      """WITH cust AS (
           SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
           FROM orders GROUP BY 1),
         vals AS (
           SELECT rev, count(*) AS n_cust,
             CAST(rev AS DECIMAL(30,6)) * CAST(count(*) AS DECIMAL(8,0))
               AS grp_rev
           FROM cust GROUP BY rev),
         cum AS (
           SELECT *, sum(n_cust) OVER w AS cum_cust,
             sum(grp_rev) OVER w AS cum_rev
           FROM vals
           WINDOW w AS (ORDER BY rev DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         tot AS (SELECT sum(n_cust) AS t_cust, sum(grp_rev) AS t_rev
                 FROM vals)
         SELECT max(t_cust)::BIGINT AS n_customers,
           max(t_rev)::DOUBLE AS total_revenue,
           min(CASE WHEN cum_rev * 5 >= t_rev * 4 THEN cum_cust END)::BIGINT
             AS n_to_80pct,
           round(min(CASE WHEN cum_cust >= greatest(1, t_cust // 10)
               THEN cum_rev END)::DOUBLE / max(t_rev)::DOUBLE, 6)
             AS top_decile_rev_share
         FROM cum, tot""",
    "q141_decile_lift" -> {
      val dec = decilePs.map(p =>
        s"(value > p${(p * 100).round})::BIGINT").mkString(" + ")
      s"""WITH ev AS (
            SELECT value,
              CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
            FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
          g AS (SELECT value AS v, count(*) AS c FROM ev GROUP BY 1),
          cum AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum,
                    sum(c) OVER () AS n FROM g),
          cuts AS (SELECT
             ${cutSql(decilePs.map(p => s"p${(p * 100).round}" -> p))}
           FROM cum)
          SELECT 1 + ($dec) AS decile, count(*) AS n,
            sum(pos)::BIGINT AS n_pos,
            (sum(pos)::BIGINT * 1000000) // count(*) AS pos_rate_e6
          FROM ev, cuts
          GROUP BY 1 ORDER BY 1"""
    })
}
