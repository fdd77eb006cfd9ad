package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Global consecutive row numbering at scale — the "zipWithIndex"
  * problem. A naive `row_number() OVER (ORDER BY key)` collapses the
  * whole table into ONE task (Spark plans an empty-partition window as
  * a single-partition sort), which is the canonical 100 TB
  * scale-killer: the job runs, slowly, until the one executor holding
  * 100 TB of sorted rows dies. The scalable shape is the classic
  * two-phase numbering every distributed engine uses internally:
  *
  *   1. range-partition by the sort key (`repartitionByRange`) so
  *      partition i holds keys strictly below partition i+1;
  *   2. number rows LOCALLY within each partition (a window keyed on
  *      the partition id — each partition sorts independently);
  *   3. count rows per partition (a #partitions-row side table),
  *      prefix-sum those counts into per-partition offsets, and
  *      broadcast-join the offsets back: global_rn = offset + local_rn.
  *
  * Only the offsets frame (one row per partition) is ever sequential;
  * the data path is two slim exchanges and a local sort, all linear.
  * The emitted mapping is engine-independent — the global rank in the
  * total order (l_orderkey, l_linenumber), which is unique — so the
  * oracle can verify it with a plain `row_number()` even though the
  * physical plans are completely different.
  *
  * Reference analog: none (its pipelines never need a global ordinal);
  * first-class here because training-data sharding, deterministic
  * example ids, and resumable exports all start with "assign every row
  * a stable consecutive number".
  */
object GlobalIndex {

  /** Audit stride: the verified output is every `stride`-th numbered
    * row — enough to pin the whole numbering (any insertion/deletion/
    * swap shifts every later ordinal) without dumping the full table.
    */
  private[graft] val stride = 100

  /** q182 — global row numbers over lineitem in (l_orderkey,
    * l_linenumber) order, two-phase, no single-partition sort.
    */
  def globalRowNumbers(spark: SparkSession, dir: String): DataFrame =
    numberedAll(Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber")))
      .filter(col("rn") % stride === 0)
      .orderBy("rn")

  /** Full numbering over any frame with (l_orderkey, l_linenumber);
    * fixture seam for the spec (which replays a shuffled fixture,
    * compares to a driver-side sort, and asserts the plan contains no
    * global sort of the data path).
    */
  private[graft] def numberedAll(li: DataFrame): DataFrame =
    numberedBy(li, Seq("l_orderkey", "l_linenumber"))

  /** The generic two-phase numbering: appends `rn` = 1-based rank in
    * the total order of `sortCols` (which must be a unique key of the
    * frame for the rank to be deterministic). Data path: one range
    * exchange + local sorts; only the #partitions-row offsets frame is
    * sequential.
    */
  /** Deterministically range-bucketed copy of `df` with an ordered
    * `pid` column — the shared phase 1 of [[numberedBy]] and
    * [[prefixSummedBy]].
    *
    * WHY NOT `repartitionByRange` + `spark_partition_id()` (round-11
    * bug fix, caught by q238): the pid-stamped range exchange feeds
    * TWO consumers (the offsets aggregate and the final join), and
    * Spark will NOT reuse it — `spark_partition_id()` is a
    * nondeterministic expression, so the two subtrees never
    * canonicalize equal and each consumer executes its own copy.
    * `repartitionByRange` picks its boundaries by SAMPLING the
    * child's rows in arrival order; on an agg-fed input that order
    * varies per execution, so the two copies land rows in DIFFERENT
    * pids — offsets from one partitioning joined to local sums of
    * another (measured: five runs of the q238 rank sum gave five
    * different wrong totals; a local sort below the range exchange
    * does not help — EliminateSorts removes it). The oracle passes
    * q218/q219/q182 had been riding exchange-reuse luck.
    *
    * The fix removes runtime partition identity from the math
    * entirely: ONE bounded job at plan-build time collects ≤ nParts
    * approx-quantile boundaries of the leading sort key (numeric by
    * kernel contract) to the driver, and `pid` becomes a LITERAL
    * bucket expression — a pure function of the row, identical in
    * every execution of every consumer, AQE-proof by construction.
    * The boundaries only steer BALANCE, never correctness: any
    * monotone bucketing yields correct global sums/ranks, and the
    * ordered-`pid` windows downstream do their own exchange. Massive
    * ties on one key value collapse to one bucket — the inherent
    * key-grain bound, same as range partitioning's.
    */
  /** One-pass boundary probe for SEVERAL numeric columns at once: one
    * aggregate job over `df` returns, per column, the deduped
    * approx-quantile boundaries [[rangedDeterministic]] needs. Exists
    * so a kernel that two-phase-ranks MULTIPLE columns of the same
    * frame (q239 Spearman ranks x and y) pays ONE scan of the upstream
    * lineage for all its boundary arrays instead of one scan per
    * column (r11 ADVICE: spearmanCore re-scanned lineitem twice just
    * for boundaries). Non-finite percentiles are dropped (r11 ADVICE:
    * a ±Infinity/NaN boundary would render as 'InfinityD' and fail SQL
    * literal parsing; boundaries only steer balance, so dropping them
    * is always safe).
    */
  private[graft] def probeBounds(df: DataFrame,
                                 cols: Seq[String]): Map[String, Seq[Double]] = {
    val nParts = df.sparkSession.sessionState.conf.numShufflePartitions
    val probs = (1 until nParts).map(i => i.toDouble / nParts)
    if (probs.isEmpty) return cols.map(_ -> Seq.empty[Double]).toMap
    val aggs = cols.map(c => expr(
      s"approx_percentile(cast(`$c` as double), " +
        s"array(${probs.mkString(", ")}), 10000)"))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    cols.zipWithIndex.map { case (c, i) =>
      c -> (if (r.isNullAt(i)) Seq.empty[Double]
            else r.getSeq[Double](i).distinct
              .filter(java.lang.Double.isFinite))
    }.toMap
  }

  /** `preBounds`: a caller that already probed boundaries (via
    * [[probeBounds]], possibly over a DIFFERENT but distribution-
    * representative frame — e.g. row grain instead of value grain)
    * passes them here and skips this call's own probe job. Correctness
    * never depends on which boundaries arrive: any monotone bucketing
    * yields correct ranks/sums (scaladoc above); boundaries are
    * balance-only.
    */
  private[graft] def rangedDeterministic(df: DataFrame, sortCols: Seq[String],
      preBounds: Option[Seq[Double]] = None): DataFrame = {
    val head = sortCols.head
    val bounds: Seq[Double] =
      preBounds.getOrElse(probeBounds(df, Seq(head))(head))
    // pid: O(#bounds) linear scan per row — bounded by the session's
    // shuffle-partition count (32 here); a cluster running thousands
    // of range partitions would want a binary-search bucket lookup,
    // noted as the scale-up lever (r11 ADVICE).
    val pidExpr =
      if (bounds.isEmpty) lit(0)
      else expr(s"size(filter(array(${bounds.map(b => s"${b}D").mkString(", ")}), " +
        s"b -> cast(`$head` as double) > b))")
    df.withColumn("pid", pidExpr)
  }

  private[graft] def numberedBy(df: DataFrame,
                                sortCols: Seq[String]): DataFrame = {
    // phase 1: range partition — partition ids are ordered by key range
    val ranged = rangedDeterministic(df, sortCols)
    // phase 2: local numbering (each pid sorts only its own slice)
    val local = ranged.withColumn("local_rn",
      row_number().over(
        Window.partitionBy("pid").orderBy(sortCols.map(col): _*))
        .cast("long"))
    // phase 3: per-partition counts → exclusive prefix sums. One row
    // per partition, so the single-partition window is O(#partitions),
    // not O(#rows) — the whole point of the design.
    val offsets = local.groupBy("pid").agg(count(lit(1)).as("n"))
      .withColumn("offset",
        coalesce(sum("n").over(Window.orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("pid", "offset")
    local.join(broadcast(offsets), Seq("pid"))
      .select(sortCols.map(col) :+
        (col("offset") + col("local_rn")).as("rn"): _*)
  }

  /** The generic two-phase GLOBAL PREFIX SUM — the cumulative-sum
    * sibling of [[numberedBy]], for kernels (KS CDFs, Lorenz curves)
    * that need running totals in a global order without the
    * single-partition `Window.orderBy` sort. Appends, for each
    * `sumCols` column c, `cum_c` = inclusive prefix sum of c in the
    * total order of `sortCols`, and `total_c` = the grand total —
    * both from the same two slim exchanges: range partition, local
    * windowed sums per partition, then a #partitions-row offsets
    * frame (per-partition totals, exclusive-prefix-summed and
    * grand-totalled in one O(#partitions) window) broadcast back.
    * `sortCols` must be a unique key of the frame (same contract as
    * [[numberedBy]]) or per-row cumulative values are tie-ambiguous.
    * Added round 11 for q218 (ADVICE: its value-grain CDF pass was a
    * bare `Window.orderBy("value")` — single-partition at continuous-
    * double scale, contradicting the q182/q219 discipline).
    */
  private[graft] def prefixSummedBy(df: DataFrame, sortCols: Seq[String],
                                    sumCols: Seq[String],
                                    preBounds: Option[Seq[Double]] = None)
      : DataFrame = {
    val ranged = rangedDeterministic(df, sortCols, preBounds)
    val run = Window.partitionBy("pid").orderBy(sortCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val local = sumCols.foldLeft(ranged) { (d, c) =>
      d.withColumn(s"local_cum_$c", sum(col(c)).over(run))
    }
    // one row per partition → the sequential windows are O(#partitions)
    val perPid = local.groupBy("pid")
      .agg(sum(col(sumCols.head)).as(s"part_${sumCols.head}"),
        sumCols.tail.map(c => sum(col(c)).as(s"part_$c")): _*)
    val offW = Window.orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val totW = Window.orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = sumCols.foldLeft(perPid) { (d, c) =>
      d.withColumn(s"off_$c",
          coalesce(sum(col(s"part_$c")).over(offW), lit(0L)))
        .withColumn(s"total_$c", sum(col(s"part_$c")).over(totW))
    }.select(col("pid") +: sumCols.flatMap(c =>
        Seq(col(s"off_$c"), col(s"total_$c"))): _*)
    local.join(broadcast(offsets), Seq("pid"))
      .select(df.columns.map(col).toIndexedSeq ++ sumCols.flatMap(c => Seq(
        (col(s"off_$c") + col(s"local_cum_$c")).as(s"cum_$c"),
        col(s"total_$c"))): _*)
  }

  /** q200 bucket count (the ANALYZE-histogram convention: equal-HEIGHT
    * buckets, boundaries wherever the data puts them).
    */
  private[graft] val histBuckets = 8

  /** q200 — EQUI-DEPTH HISTOGRAM: the other ANALYZE artifact after
    * q161's per-column stats — B buckets each holding exactly ~n/B rows
    * of `o_totalprice`, with observed [lo, hi] boundaries and an exact
    * decimal sum per bucket. Equal-depth (not equal-width) is what a
    * cost-based optimizer stores, because selectivity of a range
    * predicate then reads off as "how many buckets does it span" even
    * under heavy skew (an equal-width histogram collapses to one
    * overloaded bin on Zipf data).
    *
    * Scale: bucket assignment = the two-phase global numbering
    * ([[numberedBy]] — range exchange + local sorts, no
    * single-partition window), then `bucket = (rn−1)·B div n`, then one
    * hash agg. The bucket multiply is safe to 2^63/B ≈ 1.1e18 rows —
    * documented bound, far beyond a 100 TB table's row count. The
    * (price, orderkey) sort key is unique, so bucket membership — and
    * therefore every output cell — is engine-independent; the oracle
    * re-derives it with a plain rank.
    */
  def equidepthHistogram(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .select(col("o_totalprice"), col("o_orderkey"))
    // driver-side single-value count (the probeBounds stance: one
    // metadata-sized read feeding a literal into the plan)
    val n = base.count()
    numberedBy(base, Seq("o_totalprice", "o_orderkey"))
      .withColumn("bucket", expr(s"(rn - 1) * $histBuckets div ${math.max(n, 1L)}"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_rows"),
        min("o_totalprice").as("lo"),
        max("o_totalprice").as("hi"),
        round(sum(col("o_totalprice").cast("decimal(18,4)")).cast("double"), 4)
          .as("price_sum"))
      .orderBy("bucket")
  }

  /** q246 percentile fractions. */
  private[graft] val pcontPs = Seq(0.25, 0.5, 0.75, 0.9, 0.99)

  /** q246 — EXACT INTERPOLATED PERCENTILES (the `percentile_cont`
    * contract: rank position pos = 1 + p·(n−1), linear interpolation
    * between the two bracketing order statistics) — completing the
    * quantile family: q102/q28 are the DISCRETE selection rule, q149
    * the approximate sketch; this is the exact continuous one, and the
    * classic way to compute it (`percentile_cont` over a window, or
    * sort-and-index) collapses the table into one sorted partition.
    *
    * Scale shape: the same two-phase global numbering as q182 (range
    * exchange + local sorts; only the #partitions offsets frame is
    * sequential), then the ≤ 2·|ps| bracketing rows are picked by a
    * pushed `rn IN (...)` filter and joined to a broadcast 5-row
    * target table — no post-numbering full-table pass and never a
    * single-partition sort. Ties in the value column don't disturb the
    * result: the tie-break (orderkey, linenumber) only permutes equal
    * values within a rank run, and interpolation reads VALUES at the
    * two positions.
    *
    * One driver-side count() feeds the literal positions — the
    * probeBounds stance (a column-pruned count stage, no data
    * movement), and at any corpus size its output is one long.
    */
  def percentileCont(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.lineitem(spark, dir)
      .select(col("l_extendedprice").cast("double").as("v"),
        col("l_orderkey"), col("l_linenumber"))
    val n = base.count()
    val targets = pcontPs.map { p =>
      val pos = 1.0 + p * (n - 1)
      (p, math.floor(pos).toLong, math.ceil(pos).toLong,
        pos - math.floor(pos))
    }
    val s = spark
    import s.implicits._
    // one row PER BRACKET SIDE so the pick is a plain equi-join on rn
    // (an OR of the two bracket ranks would plan a BroadcastNestedLoop
    // — O(1) here, but the hash-join form is free and PlanGuard-clean)
    val tdf = targets.flatMap { case (p, lo, hi, frac) =>
      Seq((p, frac, lo, "lo"), (p, frac, hi, "hi"))
    }.toDF("p", "frac", "rn", "side")
    val wanted = targets.flatMap(t => Seq(t._2, t._3)).distinct
    numberedBy(base, Seq("v", "l_orderkey", "l_linenumber"))
      .filter(col("rn").isin(wanted: _*))
      .join(broadcast(tdf), Seq("rn"))
      .groupBy("p", "frac")
      .agg(min(when(col("side") === "lo", col("v"))).as("lo_v"),
        min(when(col("side") === "hi", col("v"))).as("hi_v"))
      .select(col("p"),
        round(col("lo_v") + col("frac") * (col("hi_v") - col("lo_v")), 4)
          .as("value"))
      .orderBy("p")
  }

  /** q254 percentile points (×100). */
  private[graft] val wpctPs = Seq(25L, 50L, 75L, 90L)

  /** q254 — EXACT WEIGHTED PERCENTILES: quantity-weighted price
    * percentiles — "the price below which p% of SHIPPED UNITS (not
    * line items) fall" — the weighted sibling of q246 (row-weighted)
    * and q102 (discrete selection). The selection rule is pure
    * integers: the smallest value v with cumWeight(v)·100 ≥ p·totalW —
    * no interpolation, no division, so the cross-engine contract is
    * exact whatever the weight magnitudes.
    *
    * Scale shape: collapse to VALUE grain (one hash agg — the only
    * corpus-scale stage), then the q238/q239 two-phase prefix-sum
    * kernel gives every grain row its cumulative weight without a
    * single-partition window; the percentile pick is a 4-row broadcast
    * join + min-agg over the filtered grain.
    */
  def weightedPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val grain = Tables.lineitem(spark, dir)
      .filter(col("l_extendedprice").isNotNull && col("l_quantity").isNotNull)
      .select(expr("cast(l_extendedprice * 100 as bigint)").as("v"),
        expr("cast(l_quantity as bigint)").as("w"))
      .groupBy("v").agg(sum("w").as("w"))
      // materialized once (r17): prefixSummedBy's boundary probe is its
      // own job, and without this the scan+agg ran twice (probe + main)
      .localCheckpoint(true)
    val cum = prefixSummedBy(grain, Seq("v"), Seq("w"))
    // no join at all: each grain row knows which percentile thresholds
    // its cumulative step CROSSES ((cum−w, cum] spans p·tot/100), and
    // cum is strictly increasing over the value grain, so each p picks
    // exactly one row — a literal explode + filter, never a
    // nested-loop join of grain × thresholds
    cum.withColumn("p", explode(typedLit(wpctPs)))
      .filter(col("cum_w") * 100 >= col("p") * col("total_w") &&
        (col("cum_w") - col("w")) * 100 < col("p") * col("total_w"))
      .groupBy("p")
      .agg(min("v").as("value_e2"), max("total_w").as("total_weight"))
      .orderBy("p")
  }

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q182_global_row_numbers" -> (globalRowNumbers(_, _)),
    "q200_equidepth_histogram" -> (equidepthHistogram(_, _)),
    "q246_percentile_cont" -> (percentileCont(_, _)),
    "q254_weighted_percentiles" -> (weightedPercentiles(_, _)))

  val oracles: Map[String, String] = Map(
    // the logical contract — rank in the total order — stated directly;
    // the engine must reproduce it from the partitioned two-phase plan
    "q182_global_row_numbers" ->
      s"""SELECT l_orderkey, l_linenumber, rn FROM (
            SELECT l_orderkey, l_linenumber,
              row_number() OVER (ORDER BY l_orderkey, l_linenumber) AS rn
            FROM lineitem)
          WHERE rn % $stride = 0 ORDER BY rn""",
    // q254: same value-grain collapse, same integer crossing rule via
    // a plain cumulative window (DuckDB's single-node sort is the
    // oracle's privilege; the engine side must reproduce it from the
    // partitioned prefix-sum kernel)
    "q254_weighted_percentiles" -> {
      val arr = wpctPs.mkString("[", ",", "]")
      s"""WITH grain AS (
            SELECT (l_extendedprice * 100)::BIGINT AS v,
              sum(l_quantity::BIGINT)::BIGINT AS w
            FROM lineitem
            WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
            GROUP BY 1),
          cum AS (
            SELECT v, w,
              sum(w) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
              sum(w) OVER () AS tw
            FROM grain),
          x AS (SELECT unnest($arr::BIGINT[]) AS p)
          SELECT p, min(v) AS value_e2, max(tw)::BIGINT AS total_weight
          FROM cum JOIN x ON cw * 100 >= p * tw AND (cw - w) * 100 < p * tw
          GROUP BY 1 ORDER BY p""" },
    // q246: DuckDB's native percentile_cont implements the identical
    // pos = 1 + p(n−1) + linear-interpolation contract over the same
    // double-cast values; 4dp rounding on both sides absorbs the
    // engines' association-order ulp
    "q246_percentile_cont" -> {
      val arr = pcontPs.mkString("[", ",", "]")
      s"""WITH q AS (
            SELECT percentile_cont($arr)
              WITHIN GROUP (ORDER BY l_extendedprice::DOUBLE) AS vs
            FROM lineitem)
          SELECT $arr[i]::DOUBLE AS p, round(vs[i], 4) AS value
          FROM q, LATERAL unnest(generate_series(1, ${pcontPs.size})) AS u(i)
          ORDER BY p"""
    },
    // q200: bucket re-derived from a plain rank over the same unique
    // total order, same integral bucket formula, decimal-exact sums
    "q200_equidepth_histogram" ->
      s"""WITH r AS (
            SELECT o_totalprice,
              row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
              count(*) OVER () AS n
            FROM orders)
          SELECT (rn - 1) * $histBuckets // greatest(n, 1) AS bucket,
            count(*)::BIGINT AS n_rows,
            min(o_totalprice) AS lo,
            max(o_totalprice) AS hi,
            round(sum(o_totalprice::DECIMAL(18,4))::DOUBLE, 4) AS price_sum
          FROM r GROUP BY 1 ORDER BY 1""")
}
