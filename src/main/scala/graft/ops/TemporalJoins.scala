package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Temporal join surface over `events`: as-of join and banded
  * time-range join — the two join shapes Spark has no built-in operator
  * for (the brief's canonical examples of operators to re-express
  * Spark-first). Not in the reference (which has no joins at all —
  * SURVEY.md §2.8); first-class training-pipeline capability: aligning
  * a fact stream to the latest preceding dimension state (as-of) and
  * attributing events to a trailing context window (range) are the two
  * standard temporal-feature operators.
  *
  * Both are built so the pair volume stays linear at 100 TB:
  *
  *  - As-of: NOT a join at all physically — union-tag both sides and
  *    take a running `last(_, ignoreNulls)` over one (user_id)-
  *    partitioned window. One exchange, O(n log n) sort per partition,
  *    zero pair blowup regardless of how many right-side rows precede a
  *    left row (a naive inequality join is quadratic per key).
  *  - Range: band the timeline into lookback-sized buckets and equi-join
  *    on (user_id, band): a trailing window of width W can only span a
  *    row's own band and the one before it, so each left row joins at
  *    most two buckets — candidate volume is 2·|right| per band pair,
  *    never per-key cartesian. Same blocking idea as the LSH band join
  *    (ops/Dedup.scala).
  *
  * Timestamps are handled at µs precision (`ts div 1000` on the
  * nanos-as-long column) like Sessionization — DuckDB truncates ns → µs
  * on read, so µs is the finest externally-verifiable resolution.
  */
object TemporalJoins {

  /** q36 — as-of join: each `error` event matched to the latest `click`
    * by the same user at-or-before it (inclusive, DuckDB `ASOF JOIN`
    * `>=` semantics). Ties inside one µs resolve to the highest click
    * event_id on both sides: the engine orders the window by (tsu, side,
    * event_id) so the running `last` lands on the max-event_id click;
    * the oracle collapses clicks to one row per (user, tsu) with
    * `max(event_id)`/`arg_max` before the ASOF join. Errors with no
    * preceding click drop out (inner as-of).
    */
  def asofErrorClicks(spark: SparkSession, dir: String): DataFrame =
    asofCore(Tables.eventsMicros(spark, dir))

  /** Core over any frame with (event_id, user_id, tsu, event_type,
    * value) — separable from the `events` accessor so specs can pin the
    * semantics on hand-computed fixtures.
    */
  private[graft] def asofCore(ev: DataFrame): DataFrame = {
    // the click payload rides as ONE nullable struct, so id/tsu/value are
    // atomically from the SAME click row: three independent
    // last(_, ignoreNulls) calls would each skip nulls separately — a
    // click with a null value would then contribute its id/tsu while the
    // value came from an EARLIER click, silently diverging from the
    // oracle's arg_max (round-7 advice)
    val clicks = ev.filter(col("event_type") === "click").select(
      col("user_id"), col("tsu"), lit(0).as("side"), col("event_id"),
      struct(col("event_id").as("click_id"), col("tsu").as("click_tsu"),
        col("value").as("click_value")).as("click_pack"),
      lit(null).cast("long").as("error_id"))
    val errors = ev.filter(col("event_type") === "error").select(
      col("user_id"), col("tsu"), lit(1).as("side"), col("event_id"),
      lit(null)
        .cast("struct<click_id:bigint,click_tsu:bigint,click_value:double>")
        .as("click_pack"),
      col("event_id").as("error_id"))

    // side orders clicks before errors within a µs (inclusive <=); the
    // frame's last non-null click struct is the as-of match — one window
    // function, one sort, one exchange.
    val w = Window.partitionBy("user_id")
      .orderBy("tsu", "side", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(errors)
      .withColumn("m", last("click_pack", ignoreNulls = true).over(w))
      .filter(col("side") === 1 && col("m").isNotNull)
      .select(
        col("error_id"), col("user_id"), col("tsu").as("err_tsu"),
        col("m.click_id"), col("m.click_tsu"), col("m.click_value"),
        (col("tsu") - col("m.click_tsu")).as("gap_us"))
      .orderBy("error_id")
  }

  /** q191 — NEAREST-neighbor as-of: each `error` matched to the click
    * closest in time in EITHER direction (sensor/trace alignment wants
    * the nearest reading, not the latest-before — q36 is the backward
    * half, this is the symmetric member of the as-of family). Same
    * one-union-one-sort shape as [[asofCore]]: the backward candidate
    * is the frame's last click pack (unbounded preceding, inclusive of
    * same-µs earlier-id clicks — q36's tie rule), the forward
    * candidate the frame's first click pack over the FOLLOWING frame;
    * the pick is pure arithmetic (backward wins distance ties,
    * documented and oracle-mirrored). Still one exchange on user_id
    * and one per-partition sort — the two frames share the same window
    * ordering, so Spark plans a single Window node; no self-join, no
    * per-error probe.
    */
  def nearestErrorClicks(spark: SparkSession, dir: String): DataFrame =
    nearestCore(Tables.eventsMicros(spark, dir))

  private[graft] def nearestCore(ev: DataFrame): DataFrame = {
    // same atomic click-pack discipline as asofCore: id and tsu travel
    // in ONE nullable struct so both always come from the same click
    val clicks = ev.filter(col("event_type") === "click").select(
      col("user_id"), col("tsu"), lit(0).as("side"), col("event_id"),
      struct(col("event_id").as("click_id"), col("tsu").as("click_tsu"))
        .as("click_pack"),
      lit(null).cast("long").as("error_id"))
    val errors = ev.filter(col("event_type") === "error").select(
      col("user_id"), col("tsu"), lit(1).as("side"), col("event_id"),
      lit(null).cast("struct<click_id:bigint,click_tsu:bigint>")
        .as("click_pack"),
      col("event_id").as("error_id"))
    val order = Window.partitionBy("user_id").orderBy("tsu", "side", "event_id")
    val wb = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = order.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    clicks.unionByName(errors)
      .withColumn("b", last("click_pack", ignoreNulls = true).over(wb))
      .withColumn("f", first("click_pack", ignoreNulls = true).over(wf))
      .filter(col("side") === 1 && (col("b").isNotNull || col("f").isNotNull))
      .withColumn("m",
        when(col("b").isNull, col("f"))
          .when(col("f").isNull, col("b"))
          .when(col("tsu") - col("b.click_tsu")
            <= col("f.click_tsu") - col("tsu"), col("b"))
          .otherwise(col("f")))
      .select(col("error_id"), col("user_id"), col("tsu").as("err_tsu"),
        col("m.click_id"), (col("m.click_tsu") - col("tsu")).as("delta_us"))
      .orderBy("error_id")
  }

  /** Lookback width for q37: clicks strictly before the purchase,
    * within 10 minutes.
    */
  val lookbackSeconds = 600L
  private val lookbackUs = lookbackSeconds * 1000000L

  /** q37 — banded range join: per purchase, count + decimal-exact sum of
    * same-user clicks in [purchase − 10 min, purchase). Left semantics:
    * purchases with no clicks in window keep n_clicks = 0. The range
    * predicate rides the equi-join on (user_id, band) — each purchase
    * probes exactly two bands, so no per-user cartesian at any scale.
    */
  def purchaseClickAttribution(spark: SparkSession, dir: String): DataFrame =
    rangeCore(Tables.eventsMicros(spark, dir))

  /** Core over any frame with (event_id, user_id, tsu, event_type,
    * value); same fixture-injection seam as [[asofCore]].
    */
  private[graft] def rangeCore(ev: DataFrame): DataFrame = {
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("tsu").as("purchase_tsu"),
        expr(s"tsu div $lookbackUs").as("band"))
      // a trailing window of exactly the band width spans ≤ 2 bands
      .withColumn("jband", explode(array(col("band"), col("band") - 1)))
      .drop("band")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("tsu").as("click_tsu"),
        // decimal quantization before summing: double sums are
        // order-dependent (the repo's money-sum discipline, ops/Skew)
        col("value").cast("decimal(18,6)").as("click_value"),
        expr(s"tsu div $lookbackUs").as("cband"))

    purchases
      .join(clicks,
        purchases("user_id") === clicks("c_user_id") &&
          col("jband") === col("cband") &&
          col("click_tsu") >= col("purchase_tsu") - lookbackUs &&
          col("click_tsu") < col("purchase_tsu"),
        "left_outer")
      // the two band probes of one purchase regroup here; a click
      // matches exactly one of them (its own band), so no double count
      .groupBy(col("purchase_id"), purchases("user_id"), col("purchase_tsu"))
      .agg(
        count(col("click_tsu")).as("n_clicks"),
        round(coalesce(sum(col("click_value")), lit(0)).cast("double"), 2)
          .as("click_total"))
      .orderBy("purchase_id")
  }

  /** Trailing width for q73's RANGE frame: one hour in µs. */
  val rollingWindowUs: Long = 3600L * 1000000L

  /** q73 — time-range rolling window: per event, count + decimal-exact
    * value sum of the same user's events in the trailing hour. A RANGE
    * frame on the µs timeline — the frame boundary is a time distance,
    * not a row position, so the W-family gains the frame class q11/q12's
    * rows-frames don't cover, and intra-µs duplicate timestamps get set
    * semantics (all peers in, identically in both engines — a ROWS frame
    * would be tie-order-dependent here). One exchange on user_id. Cost
    * honesty: Spark's sliding-frame WindowExec RE-AGGREGATES the
    * buffered frame on every slide (count/sum have no subtract-on-evict
    * path), so a user with k events inside one window width pays
    * O(k·w), not O(k) — acceptable while per-(user, hour) density is
    * bounded; a pathologically hot key wants pre-aggregation to a
    * coarser grain (the q37 banding) before the window.
    */
  def rollingHourWindow(spark: SparkSession, dir: String): DataFrame =
    rollingCore(Tables.eventsMicros(spark, dir))

  private[graft] def rollingCore(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tsu")
      .rangeBetween(-rollingWindowUs, 0)
    ev.select(col("event_id"), col("user_id"), col("tsu"),
        col("value").cast("decimal(18,6)").as("value_q"))
      .withColumn("n_trailing_1h", count(lit(1)).over(w))
      .withColumn("sum_trailing_1h",
        round(sum("value_q").over(w).cast("double"), 2))
      .select("event_id", "user_id", "tsu", "n_trailing_1h", "sum_trailing_1h")
      .orderBy("event_id")
  }

  /** The HOT-KEY-SAFE twin of [[rollingCore]] — identical output, no
    * O(k·w) re-aggregation. Spark's sliding RANGE frame re-sums the
    * buffered frame on every slide (count/sum have no subtract-on-evict
    * path), so one bot-like user with 10⁶ events/hour makes the frame
    * quadratic and that task the stage straggler (the cost honesty note
    * on [[rollingHourWindow]]). This formulation is O(k log k) per key
    * in the WORST case, any density:
    *
    *   1. collapse intra-µs peers per (user, tsu) — RANGE gives peers
    *      set semantics anyway, so one row per distinct timestamp
    *      carries (count, exact decimal sum, the event_ids);
    *   2. running prefix sums over a growing UNBOUNDED-PRECEDING rows
    *      frame — Spark maintains those incrementally, O(1) per row;
    *   3. each row also emits a PROBE at tsu − W − 1 µs; the prefix sum
    *      at the probe is the as-of lookup of the window's left edge —
    *      the same union-tag + running `last(struct)` trick as
    *      [[asofCore]] (probe after real rows within a µs: inclusive);
    *   4. trailing agg = own prefix − boundary prefix (decimal-exact
    *      differences of exact sums = the direct frame sums, to the
    *      last bit), then the peer group explodes back to events.
    *
    * The price of the bound is exchange count: the peer-collapsed rows
    * pass a (user, tsu) aggregation exchange, the prefix-sum window's
    * user_id sort, and the union's re-shuffle into the boundary window
    * (Spark's Union forgets child partitioning; the duplicated cum
    * subtree dedupes via ReusedExchange) — measured ~0.6 s vs q73's
    * ~0.3 s warm at sf0.1's bounded density, which is why
    * [[rollingCore]] stays the default q73 plan and this is the
    * registered escape hatch (q101), held to the same oracle semantics
    * by the shared property test.
    */
  private[graft] def rollingCoreScalable(ev: DataFrame): DataFrame = {
    val byTs = ev
      .select(col("event_id"), col("user_id"), col("tsu"),
        col("value").cast("decimal(18,6)").as("value_q"))
      .groupBy("user_id", "tsu")
      .agg(count(lit(1)).as("cnt"), sum("value_q").as("val_q"),
        count(col("value_q")).as("nn"), collect_list("event_id").as("ids"))
    val cumW = Window.partitionBy("user_id").orderBy("tsu")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // cum_nn (non-null value count) carries the frame's NULL semantics:
    // a RANGE sum over a frame holding only null values is NULL, not 0
    // — a bare prefix-sum difference would emit 0 whenever the user has
    // any earlier non-null value (round-8 review)
    val cum = byTs
      .withColumn("cum_cnt", sum("cnt").over(cumW))
      .withColumn("cum_val", sum("val_q").over(cumW))
      .withColumn("cum_nn", sum("nn").over(cumW))

    val packT = "struct<cum_cnt:bigint,cum_val:decimal(38,6),cum_nn:bigint>"
    val real = cum.select(
      col("user_id"), col("tsu"), lit(0).as("side"),
      struct(col("cum_cnt"), col("cum_val"), col("cum_nn"))
        .cast(packT).as("pack"),
      lit(null).cast("bigint").as("o_tsu"),
      lit(null).cast("bigint").as("o_cnt"),
      lit(null).cast("decimal(38,6)").as("o_val"),
      lit(null).cast("bigint").as("o_nn"),
      lit(null).cast("array<bigint>").as("ids"))
    val probes = cum.select(
      col("user_id"), (col("tsu") - rollingWindowUs - 1).as("tsu"),
      lit(1).as("side"), lit(null).cast(packT).as("pack"),
      col("tsu").as("o_tsu"), col("cum_cnt").as("o_cnt"),
      col("cum_val").as("o_val"), col("cum_nn").as("o_nn"), col("ids"))

    val w = Window.partitionBy("user_id").orderBy("tsu", "side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    real.unionByName(probes)
      .withColumn("base", last("pack", ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(
        col("user_id"), col("o_tsu").as("tsu"),
        (col("o_cnt") - coalesce(col("base.cum_cnt"), lit(0L)))
          .as("n_trailing_1h"),
        when(
          (col("o_nn") - coalesce(col("base.cum_nn"), lit(0L))) === 0,
          lit(null).cast("double"))
          .otherwise(round(
            (coalesce(col("o_val"), lit(0).cast("decimal(38,6)"))
              - coalesce(col("base.cum_val"), lit(0).cast("decimal(38,6)")))
              .cast("double"), 2))
          .as("sum_trailing_1h"),
        explode(col("ids")).as("event_id"))
      .select("event_id", "user_id", "tsu", "n_trailing_1h", "sum_trailing_1h")
      .orderBy("event_id")
  }

  /** Share of readings q152 deterministically blanks (3/16) — md5-nibble
    * on event_id (the q58/q59 content-keyed discipline), salt ":gap".
    */
  private[graft] def gapNibble: org.apache.spark.sql.Column =
    conv(substring(md5(concat(col("event_id").cast("string"),
      lit(":gap")).cast("binary")), 1, 1), 16, 10).cast("int")

  /** q152 — LOCF GAP-FILL (last observation carried forward): the
    * standard repair for sparse sensor/metric streams — a reading is
    * missing, carry the user's latest prior reading forward. The
    * third member of the as-of family: q36 aligns two STREAMS, q123
    * aligns a stream to SCD2 STATE, this aligns a stream to ITSELF
    * across its own gaps. Physically identical discipline to
    * [[asofCore]]: one (user_id)-partitioned window, a running
    * `last(_, ignoreNulls)` over a single nullable STRUCT so the
    * carried value and its source event_id come atomically from the
    * same observed row (the round-7 advice that fixed asofCore), one
    * exchange, zero pair blowup at any gap length.
    *
    * The 3/16 missingness is verification plumbing (deterministic
    * md5-nibble, re-derivable by the oracle); production feeds a frame
    * whose nulls are real. Leading gaps (no prior observation) stay
    * null — LOCF repairs history, it does not invent it.
    */
  def locfGapFill(spark: SparkSession, dir: String): DataFrame =
    locfCore(Tables.eventsMicros(spark, dir).withColumn("v_obs",
      when(gapNibble >= 3, col("value"))))

  /** Core over any frame with (event_id, user_id, tsu, v_obs) where
    * v_obs is null on the rows to fill — spec seam for hand fixtures.
    */
  private[graft] def locfCore(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tsu", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      // null struct exactly when the reading is missing: value and
      // source id can never come from different rows
      .withColumn("obs_pack",
        when(col("v_obs").isNotNull,
          struct(col("v_obs").as("v"), col("event_id").as("src"))))
      .withColumn("fill", last("obs_pack", ignoreNulls = true).over(w))
      // total (null-free) output: nullable doubles round-trip as NaN
      // through parquet→pandas on the gate side, and NaN ≠ NaN would
      // fail the exact-hash compare — flags + sentinels carry the same
      // information losslessly (has_fill disambiguates a real 0.0)
      .select(col("event_id"), col("user_id"), col("tsu"),
        col("v_obs").isNull.as("is_gap"),
        col("fill").isNotNull.as("has_fill"),
        coalesce(col("fill.v"), lit(0.0)).as("v_filled"),
        coalesce(col("fill.src"), lit(-1L)).as("fill_src"))
      .orderBy("event_id")
  }

  // ---- q249: interval-overlap join -------------------------------------

  /** q249 geometry: per-day synthetic maintenance windows (start hour
    * = md5(day)%22, length 2 h — both engines replay the hash), hour
    * cells for the grid join.
    */
  private val mwLenUs = 2L * 3600L * 1000000L
  private val cellUs = 3600L * 1000000L
  private val dayUs = 86400L * 1000000L

  /** q249 — INTERVAL-OVERLAP JOIN: which user sessions overlap which
    * maintenance windows, with the exact overlap duration — the
    * both-sides-are-intervals join that q36/q37/q191 (point-vs-range)
    * don't cover, and the canonical shape Spark has no native operator
    * for (a raw `ON s < we AND ws < e` range predicate plans as a
    * nested-loop over the cross product).
    *
    * Scale shape: both interval sets explode to HOUR CELLS and
    * equi-join on the cell — candidate volume is Σ busy-hours, linear
    * in total interval length, never |A|×|B|. Each overlapping pair
    * shares its FIRST common cell exactly once (cell = max of the two
    * start cells — the q64 first-collision discipline, no
    * dropDuplicates shuffle), where the exact µs overlap is computed
    * and the touching-only case (overlap 0) is dropped. The cell join
    * is an ordinary hash exchange; a skewed busy hour salts like
    * q168.
    */
  def intervalOverlapJoin(spark: SparkSession, dir: String): DataFrame =
    intervalOverlapCore(Tables.eventsMicros(spark, dir))

  private[graft] def intervalOverlapCore(ev: DataFrame): DataFrame = {
    val sess = Sessionization.sessionBounds(ev)
    val wins = ev
      .select(expr(s"tsu div $dayUs").as("day")).distinct()
      .withColumn("h0",
        expr("cast(conv(substring(md5(cast(concat(cast(day as string), " +
          "':mw') as binary)), 1, 8), 16, 10) as bigint) % 22"))
      .select(col("day"),
        (col("day") * dayUs + col("h0") * cellUs).as("ws"))
      .withColumn("we", col("ws") + mwLenUs)
    val sCells = sess.withColumn("cell", explode(sequence(
      expr(s"session_start_us div $cellUs"),
      expr(s"session_end_us div $cellUs"))))
    val wCells = wins.withColumn("cell", explode(sequence(
      expr(s"ws div $cellUs"), expr(s"(we - 1) div $cellUs"))))
    sCells.join(wCells, Seq("cell"))
      .filter(col("cell") === greatest(
        expr(s"session_start_us div $cellUs"), expr(s"ws div $cellUs")))
      .withColumn("overlap_us",
        least(col("session_end_us"), col("we"))
          - greatest(col("session_start_us"), col("ws")))
      .filter(col("overlap_us") > 0)
      .select(col("user_id"), col("session_id"), col("day"),
        col("overlap_us"))
      .orderBy("user_id", "session_id", "day")
  }

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q249_interval_overlap_join" -> (intervalOverlapJoin(_, _)),
    "q152_locf_gap_fill" -> (locfGapFill(_, _)),
    "q36_asof_join" -> (asofErrorClicks(_, _)),
    "q191_nearest_asof" -> (nearestErrorClicks(_, _)),
    "q37_range_join" -> (purchaseClickAttribution(_, _)),
    "q73_rolling_hour_window" -> (rollingHourWindow(_, _)),
    // the hot-key-safe twin as a first-class registered query: same
    // semantics, same oracle, worst-case O(k log k) plan — the enforced
    // form of q73's documented density bound
    "q101_rolling_hour_hotsafe" -> ((s, d) =>
      rollingCoreScalable(Tables.eventsMicros(s, d))))

  val oracles: Map[String, String] = Map(
    // q249: brute-force interval join (no grid — the oracle proves the
    // cell/first-cell machinery changes nothing), same q27 session
    // derivation at µs, same md5 window-placement hash
    "q249_interval_overlap_join" -> {
      val gapUs = Sessionization.gapSeconds * 1000000L
      s"""WITH marked AS (
            SELECT user_id, event_id, epoch_ns(ts) // 1000 AS tsu,
              CASE WHEN lag(epoch_ns(ts) // 1000) OVER w IS NULL
                     OR epoch_ns(ts) // 1000
                        - lag(epoch_ns(ts) // 1000) OVER w > $gapUs
                   THEN 1 ELSE 0 END AS opens
            FROM events WHERE ts IS NOT NULL
            WINDOW w AS (PARTITION BY user_id
              ORDER BY epoch_ns(ts) // 1000, event_id)),
          sess AS (
            SELECT user_id, tsu,
              sum(opens) OVER (PARTITION BY user_id ORDER BY tsu, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                AS session_id
            FROM marked),
          sb AS (
            SELECT user_id, session_id, min(tsu) AS s, max(tsu) AS e
            FROM sess GROUP BY 1, 2),
          wins AS (
            SELECT day,
              day * $dayUs
                + (('0x' || substr(md5(day::VARCHAR || ':mw'), 1, 8))::BIGINT
                   % 22) * $cellUs AS ws
            FROM (SELECT DISTINCT epoch_ns(ts) // 1000 // $dayUs AS day
                  FROM events WHERE ts IS NOT NULL)),
          w2 AS (SELECT day, ws, ws + $mwLenUs AS we FROM wins)
          SELECT user_id, session_id, day,
            (least(e, we) - greatest(s, ws))::BIGINT AS overlap_us
          FROM sb JOIN w2 ON least(e, we) - greatest(s, ws) > 0
          ORDER BY user_id, session_id, day""" },
    // q152: DuckDB's native IGNORE NULLS window carry — an independent
    // formulation (two last_value calls over columns that are null on
    // exactly the same rows ≡ the engine's atomic struct carry); the
    // filled doubles pass through unrounded, so any drift anywhere
    // would hash-mismatch
    "q152_locf_gap_fill" ->
      """WITH ev AS (
           SELECT event_id, user_id, epoch_ns(ts) // 1000 AS tsu,
             CASE WHEN strpos('0123456789abcdef',
                 substr(md5(event_id::VARCHAR || ':gap'), 1, 1)) - 1 >= 3
               THEN value END AS v_obs
           FROM events WHERE ts IS NOT NULL),
         f AS (
           SELECT event_id, user_id, tsu, v_obs IS NULL AS is_gap,
             last_value(v_obs IGNORE NULLS) OVER w AS fv,
             last_value(CASE WHEN v_obs IS NOT NULL THEN event_id END
               IGNORE NULLS) OVER w AS fs
           FROM ev
           WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT event_id, user_id, tsu, is_gap,
           fv IS NOT NULL AS has_fill,
           coalesce(fv, 0.0) AS v_filled,
           coalesce(fs, -1)::BIGINT AS fill_src
         FROM f ORDER BY event_id""",
    // the oracle is DuckDB's NATIVE ASOF JOIN — an independent
    // implementation of the semantics, not a re-derivation of ours
    // q191: independently formulated as TWO DuckDB ASOF joins (backward
    // >= with max-id µs collapse — q36's tie rule; forward < with
    // min-id collapse, same-µs clicks being backward-only by the
    // engine's (tsu, side, id) order), then the same arithmetic pick
    "q191_nearest_asof" ->
      """WITH ev AS (
           SELECT event_id, user_id, epoch_ns(ts) // 1000 AS tsu,
                  event_type
           FROM events WHERE ts IS NOT NULL),
         bclicks AS (
           SELECT user_id, tsu, max(event_id) AS click_id
           FROM ev WHERE event_type = 'click' GROUP BY 1, 2),
         fclicks AS (
           SELECT user_id, tsu, min(event_id) AS click_id
           FROM ev WHERE event_type = 'click' GROUP BY 1, 2),
         errors AS (
           SELECT event_id AS error_id, user_id, tsu AS err_tsu
           FROM ev WHERE event_type = 'error'),
         b AS (
           SELECT e.error_id, e.user_id, e.err_tsu,
                  c.click_id AS b_id, c.tsu AS b_tsu
           FROM errors e ASOF LEFT JOIN bclicks c
             ON e.user_id = c.user_id AND e.err_tsu >= c.tsu),
         f AS (
           SELECT e.error_id, c.click_id AS f_id, c.tsu AS f_tsu
           FROM errors e ASOF LEFT JOIN fclicks c
             ON e.user_id = c.user_id AND e.err_tsu < c.tsu)
         SELECT b.error_id, b.user_id, b.err_tsu,
           CASE WHEN b_id IS NULL THEN f_id
                WHEN f_id IS NULL THEN b_id
                WHEN b.err_tsu - b_tsu <= f_tsu - b.err_tsu THEN b_id
                ELSE f_id END AS click_id,
           CASE WHEN b_id IS NULL THEN f_tsu
                WHEN f_id IS NULL THEN b_tsu
                WHEN b.err_tsu - b_tsu <= f_tsu - b.err_tsu THEN b_tsu
                ELSE f_tsu END - b.err_tsu AS delta_us
         FROM b JOIN f USING (error_id)
         WHERE b_id IS NOT NULL OR f_id IS NOT NULL
         ORDER BY error_id""",
    "q36_asof_join" ->
      """WITH ev AS (
           SELECT event_id, user_id, epoch_ns(ts) // 1000 AS tsu, value,
                  event_type
           FROM events WHERE ts IS NOT NULL),
         clicks AS (
           SELECT user_id, tsu, max(event_id) AS click_id,
                  arg_max(value, event_id) AS click_value
           FROM ev WHERE event_type = 'click' GROUP BY 1, 2),
         errors AS (
           SELECT event_id AS error_id, user_id, tsu AS err_tsu
           FROM ev WHERE event_type = 'error')
         SELECT e.error_id, e.user_id, e.err_tsu,
                c.click_id, c.tsu AS click_tsu, c.click_value,
                e.err_tsu - c.tsu AS gap_us
         FROM errors e ASOF JOIN clicks c
           ON e.user_id = c.user_id AND e.err_tsu >= c.tsu
         ORDER BY e.error_id""",
    "q37_range_join" ->
      s"""WITH ev AS (
           SELECT event_id, user_id, epoch_ns(ts) // 1000 AS tsu, value,
                  event_type
           FROM events WHERE ts IS NOT NULL),
         p AS (
           SELECT event_id AS purchase_id, user_id, tsu AS purchase_tsu
           FROM ev WHERE event_type = 'purchase'),
         c AS (
           SELECT user_id, tsu AS click_tsu,
                  CAST(value AS DECIMAL(18,6)) AS click_value
           FROM ev WHERE event_type = 'click')
         SELECT p.purchase_id, p.user_id, p.purchase_tsu,
                count(c.click_tsu) AS n_clicks,
                round(coalesce(sum(c.click_value), 0)::DOUBLE, 2)
                  AS click_total
         FROM p LEFT JOIN c
           ON p.user_id = c.user_id
          AND c.click_tsu >= p.purchase_tsu - $lookbackUs
          AND c.click_tsu < p.purchase_tsu
         GROUP BY 1, 2, 3
         ORDER BY p.purchase_id""",
    // q101 shares q73's oracle verbatim: the hot-key-safe plan must be
    // semantically invisible
    "q101_rolling_hour_hotsafe" -> rollingOracle,
    "q73_rolling_hour_window" -> rollingOracle)

  private lazy val rollingOracle: String =
    s"""WITH ev AS (
           SELECT event_id, user_id, epoch_ns(ts) // 1000 AS tsu,
                  CAST(value AS DECIMAL(18,6)) AS value_q
           FROM events WHERE ts IS NOT NULL)
         SELECT event_id, user_id, tsu,
                count(*) OVER w AS n_trailing_1h,
                round((sum(value_q) OVER w)::DOUBLE, 2) AS sum_trailing_1h
         FROM ev
         WINDOW w AS (PARTITION BY user_id ORDER BY tsu
           RANGE BETWEEN $rollingWindowUs PRECEDING AND CURRENT ROW)
         ORDER BY event_id"""
}
