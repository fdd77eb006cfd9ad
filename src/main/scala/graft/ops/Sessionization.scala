package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Gap-based sessionization of the event stream — the classic
  * training-data/clickstream operator (not in the reference, which has
  * no per-user temporal analysis; a first-class addition per the
  * engine's north star).
  *
  * Batch algorithm: per user, order by time; a row opens a new session
  * when the gap to the previous event exceeds `gapSeconds`; session id =
  * running count of session-opens; then one aggregate per (user,
  * session). Two window passes + one aggregation, all on the same
  * user_id partitioning — Spark plans a single exchange (the lag and
  * running-sum windows share their sort, and partitioning by user_id
  * satisfies the wider (user_id, session_id) clustering).
  *
  * The streaming twin (graft.streaming.Sessionize) holds open sessions
  * in keyed state with event-time timeouts; this batch form is the
  * backfill path — same session definition, oracle-checked.
  */
object Sessionization {

  val gapSeconds = 3600L
  private val gapUs = gapSeconds * 1000000L

  /** THE session-labeling chain (lag → opens flag → running sum),
    * shared by q27's rollup and q116's paths so the session definition
    * — strict > gapUs, (tsu, event_id) tie order — exists exactly
    * once. Ordering AND gap decisions run at µs — the external
    * precision (DuckDB truncates TIMESTAMP(NANOS) to µs on read, so an
    * oracle can never see ns; a gap within 1 µs of exactly
    * `gapSeconds` would otherwise split sessions differently per
    * engine). Intra-µs ties break on event_id, identically both sides.
    */
  private def labeled(ev: DataFrame): DataFrame = {
    val byTime = Window.partitionBy("user_id").orderBy("tsu", "event_id")
    val running = byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("prev_tsu", lag("tsu", 1).over(byTime))
      .withColumn("opens",
        when(col("prev_tsu").isNull || col("tsu") - col("prev_tsu") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum("opens").over(running))
  }

  def sessions(spark: SparkSession, dir: String): DataFrame = {
    sessionBounds(Tables.eventsMicros(spark, dir))
      .withColumn("duration_sec",
        expr("(session_end_us - session_start_us) div 1000000"))
      .select("user_id", "session_id", "session_start_us", "session_end_us",
        "n_events", "duration_sec")
      .orderBy("user_id", "session_id")
  }

  /** One session row per (user, session) with its closed time bounds —
    * q27's rollup and q136's sweep share this frame.
    */
  private[graft] def sessionBounds(ev: DataFrame): DataFrame =
    labeled(ev)
      .groupBy("user_id", "session_id")
      .agg(
        min("tsu").as("session_start_us"),
        max("tsu").as("session_end_us"),
        count(lit(1)).as("n_events"))

  /** q235 — NATIVE session_window TWIN of q27: the same gap-session
    * rollup through Spark's built-in `session_window` aggregation (the
    * operator Structured Streaming uses for stateful session aggs,
    * equally available in batch). The registered surface keeps BOTH:
    * q27's explicit lag→running-sum chain is the portable/backfill
    * form; this is the engine-native form — one hash-less session
    * aggregation, no window functions at all, and the SAME exchange
    * (user_id) at scale.
    *
    * Semantics bridge, exact at the µs grain both engines share:
    * q27 merges consecutive events iff gap ≤ gapUs (strict > opens);
    * `session_window` merges iff gap < windowGap. With
    * windowGap = gapUs + 1 µs the two rules coincide on integer µs.
    * Output is q27's rollup minus the per-user ordinal (session_id is
    * an artifact of the labeling chain; the native operator identifies
    * sessions by their bounds), ordered by (user, start).
    */
  def sessionWindowNative(spark: SparkSession, dir: String): DataFrame =
    Tables.eventsMicros(spark, dir)
      .withColumn("tsx", timestamp_micros(col("tsu")))
      .groupBy(col("user_id"),
        session_window(col("tsx"), s"${gapUs + 1} microseconds"))
      .agg(
        min("tsu").as("session_start_us"),
        max("tsu").as("session_end_us"),
        count(lit(1)).as("n_events"))
      .withColumn("duration_sec",
        expr("(session_end_us - session_start_us) div 1000000"))
      .select("user_id", "session_start_us", "session_end_us",
        "n_events", "duration_sec")
      .orderBy("user_id", "session_start_us")

  private val hourUs = 3600000000L

  /** q136 — PEAK CONCURRENT SESSIONS per hour: the capacity-planning
    * read ("how many sessions were open at once") that needs interval
    * OVERLAP counting, not event counting. A session occupies the
    * closed interval [start_us, end_us].
    *
    * The textbook sweep (±1 deltas, one global ordered running sum) is
    * inherently serial, so it is decomposed into the parallel-prefix
    * shape: deltas are collapsed per timestamp (the step function
    * changes only BETWEEN distinct instants — also what makes
    * intra-instant +1/−1 pairs cancel instead of overshooting the
    * peak), the running sum runs WITHIN each hour bucket
    * (hour-partitioned window — fully parallel), and the cross-bucket
    * carry-in is a prefix sum over the per-hour NET table, which is
    * calendar-bounded (one row per hour, ~9 k rows/year) however many
    * trillion sessions the data holds — that single-partition window
    * is over the tiny frame, never the data. Peak(h) =
    * carry_in(h) + max(0, max local running) — the max(0,·) term is
    * the hour-start value, reached before any delta of the hour.
    * Hours with no boundary events still report (their concurrency is
    * the carry), via an explode(sequence) spine off the bounds row.
    */
  def peakConcurrency(spark: SparkSession, dir: String): DataFrame =
    peakConcurrencyCore(Tables.eventsMicros(spark, dir))

  private[graft] def peakConcurrencyCore(ev: DataFrame): DataFrame = {
    val sess = sessionBounds(ev)
      .select(col("session_start_us").as("s"), col("session_end_us").as("e"))
    // closed interval → the −1 applies at e+1 (a session [a,b] and a
    // probe at instant b still overlap)
    val deltas = sess.select(col("s").as("t"), lit(1L).as("delta"))
      .unionAll(sess.select((col("e") + lit(1L)).as("t"),
        lit(-1L).as("delta")))
    val net = deltas.groupBy("t").agg(sum("delta").as("net"))
      .withColumn("hour", expr(s"t div $hourUs"))
    val wHour = Window.partitionBy("hour").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val loc = net.withColumn("run", sum("net").over(wHour))
      .groupBy("hour")
      .agg(sum("net").as("hour_net"), max("run").as("max_local"))
    val spine = loc.agg(min("hour").as("h0"), max("hour").as("h1"))
      .select(explode(sequence(col("h0"), col("h1"))).as("hour"))
    val starts = sess.groupBy(expr(s"s div $hourUs").as("hour"))
      .agg(count(lit(1)).as("n_starts"))
    val ends = sess.groupBy(expr(s"e div $hourUs").as("hour"))
      .agg(count(lit(1)).as("n_ends"))
    // the carry prefix: single-partition window, but over the
    // calendar-bounded hourly table (see scaladoc)
    val wCarry = Window.orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, -1)
    spine.join(loc, Seq("hour"), "left_outer")
      .join(starts, Seq("hour"), "left_outer")
      .join(ends, Seq("hour"), "left_outer")
      .withColumn("carry_in",
        coalesce(sum("hour_net").over(wCarry), lit(0L)))
      .select(col("hour"),
        coalesce(col("n_starts"), lit(0L)).as("n_starts"),
        coalesce(col("n_ends"), lit(0L)).as("n_ends"),
        (col("carry_in")
          + greatest(lit(0L), coalesce(col("max_local"), lit(0L))))
          .as("peak_sessions"))
      .orderBy("hour")
  }

  val pathMaxLen = 8
  val pathTopK = 50

  /** q116 — top user JOURNEYS: the frequency table of session paths
    * (the first `pathMaxLen` event types of each session, in order),
    * the product-analytics read q27's session boundaries and q106's
    * one-step transition matrix both stop short of — a path is the
    * whole Markov chain realization, not its edges.
    *
    * Scale-safe by construction: events are ranked INSIDE the session
    * window and cut at `pathMaxLen` BEFORE any collect — a bot session
    * of 10⁶ events contributes 8 rows to the fold, not a 10⁶-element
    * array on one executor. The rank window shares the session
    * labeling's user_id-grained exchange (one sort extension, no new
    * shuffle); the path fold then collapses to at most
    * |event_type|^maxLen distinct paths — vocabulary-bounded, like
    * every frequency table here.
    */
  def sessionPaths(spark: SparkSession, dir: String): DataFrame =
    sessionPathsCore(Tables.eventsMicros(spark, dir))

  /** Core over any (user_id, event_id, tsu, event_type) frame —
    * fixture-injection seam for the spec.
    */
  private[graft] def sessionPathsCore(events: DataFrame): DataFrame = {
    val bySession = Window.partitionBy("user_id", "session_id")
      .orderBy("tsu", "event_id")
    labeled(events)
      .withColumn("rnk", row_number().over(bySession))
      .filter(col("rnk") <= pathMaxLen)
      .groupBy("user_id", "session_id")
      .agg(sort_array(collect_list(struct(col("rnk"), col("event_type"))))
        .as("evs"))
      .select(expr("array_join(transform(evs, e -> e.event_type), '>')")
        .as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(desc("n_sessions"), asc("path"))
      .limit(pathTopK)
  }

  /** q151 — SESSION CONVERSION RATE by hour of session start: the
    * product metric a sessionized stream exists to answer ("of the
    * sessions that began this hour, how many converted?"). A session
    * converts if ANY of its events is a purchase; attribution is to
    * the session's START hour (the acquisition view — a session
    * straddling midnight belongs to the hour that produced it).
    *
    * One pass over the labeled stream: the per-session collapse
    * (min start, max converted-flag) shares the session labeling's
    * user_id exchange; the hourly rollup is calendar-bounded; the rate
    * is exact (BIGINT cross-multiply, q145's discipline — no float
    * division in the gate).
    */
  def sessionConversion(spark: SparkSession, dir: String): DataFrame =
    sessionConversionCore(Tables.eventsMicros(spark, dir))

  private[graft] def sessionConversionCore(ev: DataFrame): DataFrame =
    labeled(ev)
      .groupBy("user_id", "session_id")
      .agg(min("tsu").as("start_us"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("converted"))
      .groupBy(expr(s"start_us div $hourUs").as("hour"))
      .agg(count(lit(1)).as("n_sessions"),
        sum("converted").as("n_converting"))
      .withColumn("cvr_e6", expr("n_converting * 1000000 div n_sessions"))
      .orderBy("hour")

  private[graft] val firstLastPpm = 400000L
  private[graft] val middlePoolPpm = 200000L

  /** q188 — POSITION-BASED MULTI-TOUCH ATTRIBUTION: distribute each
    * session's purchase value across the clicks that led to it —
    * first and last touch 40% each, the middle pool splitting the
    * remaining 20% (U-shaped attribution, the standard marketing
    * model; 1 click takes 100%, 2 clicks 50/50). Credit shares are
    * exact integer ppm — the middle split truncates (`div (n−2)`),
    * and the per-click credit is the session's purchase milli-value
    * scaled through a DECIMAL(38,0) intermediate (the q158 pattern:
    * milli·10⁶ passes 2⁶³ once a session's purchases pass ~$9·10⁹ —
    * absurd for one session, but the audit column class is the same
    * one ADVICE flagged twice; widen by construction, not by hope).
    *
    * One session labeling (the shared `labeled` chain — same exchange
    * family on user_id for the purchase collapse, the click ranking,
    * and their join), then a 24-row hourly rollup. Truncation dust
    * (≤ 2 ppm per session) is deliberately dropped, never
    * redistributed — the conservation property worth having is
    * "credit ≤ purchase", and the oracle re-derives the identical
    * dust.
    */
  def attribution(spark: SparkSession, dir: String): DataFrame =
    attributionCore(Tables.eventsMicros(spark, dir)
      .filter(col("value").isNotNull))

  private[graft] def attributionCore(ev: DataFrame): DataFrame = {
    val lab = labeled(ev.select(col("user_id"), col("tsu"),
      col("event_id"), col("event_type"), col("value")))
    val purch = lab.groupBy("user_id", "session_id")
      .agg(sum(when(col("event_type") === "purchase",
        expr("floor(value * 1000.0D)")).otherwise(0L)).as("purchase_milli"))
      .filter(col("purchase_milli") > 0)
    val bySess = Window.partitionBy("user_id", "session_id")
    val clicks = lab.filter(col("event_type") === "click")
      .withColumn("pos",
        row_number().over(bySess.orderBy("tsu", "event_id")).cast("long"))
      .withColumn("n", count(lit(1)).over(bySess))
    clicks.join(purch, Seq("user_id", "session_id"))
      .withColumn("share_ppm",
        when(col("n") === 1, 1000000L)
          .when(col("pos") === 1 || col("pos") === col("n"),
            when(col("n") === 2, 500000L).otherwise(lit(firstLastPpm)))
          .otherwise(expr(s"$middlePoolPpm div (n - 2)")))
      .withColumn("credit_milli",
        expr("(cast(purchase_milli as decimal(38,0)) * share_ppm)" +
          " div 1000000"))
      .groupBy(expr("(tsu % 86400000000) div 3600000000").as("hour"))
      .agg(count(lit(1)).as("n_clicks"),
        sum("credit_milli").as("credited_milli"))
      .orderBy("hour")
  }

  /** q274 duration clamp: each event spawns the interval
    * [tsu, tsu + clamp(value minutes, 1 min, 2 h)) — `value` is the
    * only per-row magnitude in the events table, so it stands in for
    * a real duration column. floor() BEFORE the bigint cast: Spark's
    * double→bigint cast truncates, DuckDB's rounds — flooring the
    * (identical IEEE) product first makes the cast exact on both.
    */
  private val minDurUs = 60000000L
  private val maxDurUs = 7200000000L

  /** q274 — INTERVAL UNION (merge overlapping intervals): per user,
    * merge the interval set into maximal disjoint islands and emit the
    * per-user coverage stats — n_islands, covered_us (union length,
    * NOT the double-counting sum of interval lengths), longest island.
    * q27 sessionizes POINT events by gap; q136 sweeps GLOBAL
    * concurrency; this is the third classic interval kernel — per-key
    * union of genuine [start, end) intervals (the
    * busy-time/availability/dedup-span primitive). Touching intervals
    * (start = running max end) merge: coverage is closed-open.
    *
    * The merge is the gaps-and-islands chain: per user order by
    * (start, end, event_id); an interval opens a new island iff its
    * start exceeds the running max of PRIOR ends (strictly — abutting
    * spans stay merged); island id = running count of opens; then one
    * agg per (user, island) and one per user. All integer µs.
    *
    * Scale: both windows and both aggs ride ONE exchange on user_id
    * (the q27 plan shape); no global sort, no self-join — the naive
    * interval-overlap self-join is O(n²) per key, this is O(n log n)
    * local sort.
    */
  def intervalUnion(spark: SparkSession, dir: String): DataFrame =
    intervalUnionCore(
      Tables.eventsMicros(spark, dir)
        .filter(col("value").isNotNull)
        .select(col("user_id"), col("event_id"), col("tsu").as("s"),
          (col("tsu") + greatest(lit(minDurUs),
            least(expr("cast(floor(value * 60000000) as bigint)"),
              lit(maxDurUs)))).as("e")))

  /** Core over any (user_id, event_id, s, e) interval frame. */
  private[graft] def intervalUnionCore(iv: DataFrame): DataFrame = {
    val byStart = Window.partitionBy("user_id").orderBy("s", "e", "event_id")
    val prior = byStart.rowsBetween(Window.unboundedPreceding, -1)
    val running = byStart.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    iv.withColumn("pmax", max("e").over(prior))
      .withColumn("opens",
        when(col("pmax").isNull || col("s") > col("pmax"), 1L).otherwise(0L))
      .withColumn("island", sum("opens").over(running))
      .groupBy("user_id", "island")
      .agg(min("s").as("i_start"), max("e").as("i_end"),
        count(lit(1)).as("n_iv"))
      .groupBy("user_id")
      .agg(
        sum("n_iv").as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("i_end") - col("i_start")).as("covered_us"),
        max(col("i_end") - col("i_start")).as("max_island_us"))
      .orderBy("user_id")
  }

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q274_interval_union" -> (intervalUnion(_, _)),
    "q188_session_attribution" -> (attribution(_, _)),
    "q27_sessionization" -> (sessions(_, _)),
    "q235_session_window_native" -> (sessionWindowNative(_, _)),
    "q116_session_paths" -> (sessionPaths(_, _)),
    "q136_peak_concurrency" -> (peakConcurrency(_, _)),
    "q151_session_conversion" -> (sessionConversion(_, _)))

  val oracles: Map[String, String] = Map(
    // q274: same clamp (floor before cast), same strict-open islands
    // over the same (s, e, event_id) order, same closed-open algebra
    "q274_interval_union" ->
      s"""WITH iv AS (
            SELECT user_id, event_id,
              (epoch_ns(ts) // 1000) AS s,
              (epoch_ns(ts) // 1000) + greatest($minDurUs,
                least(floor(value * 60000000)::BIGINT, $maxDurUs)) AS e
            FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
          lab AS (
            SELECT user_id, event_id, s, e,
              CASE WHEN max(e) OVER (PARTITION BY user_id
                     ORDER BY s, e, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     IS NULL
                   OR s > max(e) OVER (PARTITION BY user_id
                     ORDER BY s, e, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                THEN 1 ELSE 0 END AS opens
            FROM iv),
          isl AS (
            SELECT user_id, s, e,
              sum(opens) OVER (PARTITION BY user_id
                ORDER BY s, e, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
            FROM lab),
          g AS (
            SELECT user_id, island, min(s) AS i_start, max(e) AS i_end,
              count(*)::BIGINT AS n_iv
            FROM isl GROUP BY 1, 2)
          SELECT user_id, sum(n_iv)::BIGINT AS n_intervals,
            count(*)::BIGINT AS n_islands,
            sum(i_end - i_start)::BIGINT AS covered_us,
            max(i_end - i_start)::BIGINT AS max_island_us
          FROM g GROUP BY 1 ORDER BY 1""",
    // q188: identical µs session labeling, U-shaped share table, and
    // HUGEINT-widened credit scaling; per-click truncation before the
    // hourly sum, exactly as the engine computes it
    "q188_session_attribution" ->
      s"""WITH ev AS (
            SELECT user_id, event_id, event_type, value,
              epoch_ns(ts) // 1000 AS tsu
            FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
          marked AS (
            SELECT *, CASE WHEN lag(tsu) OVER w IS NULL
                OR tsu - lag(tsu) OVER w > $gapUs THEN 1 ELSE 0 END AS opens
            FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
          sess AS (
            SELECT *, sum(opens) OVER (PARTITION BY user_id
              ORDER BY tsu, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
              AS session_id
            FROM marked),
          purch AS (
            SELECT user_id, session_id,
              sum(CASE WHEN event_type = 'purchase' THEN
                CAST(floor(value * CAST(1000.0 AS DOUBLE)) AS BIGINT)
                ELSE 0 END)::BIGINT AS purchase_milli
            FROM sess GROUP BY 1, 2
            HAVING sum(CASE WHEN event_type = 'purchase' THEN
              CAST(floor(value * CAST(1000.0 AS DOUBLE)) AS BIGINT)
              ELSE 0 END) > 0),
          clicks AS (
            SELECT user_id, session_id, tsu,
              row_number() OVER (PARTITION BY user_id, session_id
                ORDER BY tsu, event_id) AS pos,
              count(*) OVER (PARTITION BY user_id, session_id) AS n
            FROM sess WHERE event_type = 'click'),
          cr AS (
            SELECT tsu, purchase_milli,
              CASE WHEN n = 1 THEN 1000000
                   WHEN pos = 1 OR pos = n THEN
                     CASE WHEN n = 2 THEN 500000 ELSE $firstLastPpm END
                   ELSE $middlePoolPpm // (n - 2) END AS share_ppm
            FROM clicks JOIN purch USING (user_id, session_id))
          SELECT (tsu % 86400000000) // 3600000000 AS hour,
            count(*) AS n_clicks,
            sum((purchase_milli::HUGEINT * share_ppm) // 1000000)::BIGINT
              AS credited_milli
          FROM cr GROUP BY 1 ORDER BY 1""",
    // q235: q27's session relation (the gap rules coincide at µs grain
    // — see the scaladoc bridge), rolled up without the ordinal
    "q235_session_window_native" ->
      s"""WITH marked AS (
            SELECT user_id, event_id, epoch_ns(ts) AS tsn,
              CASE WHEN lag(epoch_ns(ts)) OVER w IS NULL
                     OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER w > ${gapUs * 1000L}
                   THEN 1 ELSE 0 END AS opens
            FROM events WHERE ts IS NOT NULL
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)),
          sess AS (
            SELECT user_id, tsn,
              sum(opens) OVER (PARTITION BY user_id ORDER BY tsn, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_id
            FROM marked)
          SELECT user_id,
            min(tsn) // 1000 AS session_start_us,
            max(tsn) // 1000 AS session_end_us,
            count(*) AS n_events,
            (max(tsn) // 1000 - min(tsn) // 1000) // 1000000 AS duration_sec
          FROM sess GROUP BY user_id, session_id
          ORDER BY user_id, session_start_us""",
    "q27_sessionization" ->
      s"""WITH marked AS (
            SELECT user_id, event_id, epoch_ns(ts) AS tsn,
              CASE WHEN lag(epoch_ns(ts)) OVER w IS NULL
                     OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER w > ${gapUs * 1000L}
                   THEN 1 ELSE 0 END AS opens
            FROM events WHERE ts IS NOT NULL
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)),
          sess AS (
            SELECT user_id, tsn,
              sum(opens) OVER (PARTITION BY user_id ORDER BY tsn, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_id
            FROM marked)
          SELECT user_id, session_id,
            min(tsn) // 1000 AS session_start_us,
            max(tsn) // 1000 AS session_end_us,
            count(*) AS n_events,
            (max(tsn) // 1000 - min(tsn) // 1000) // 1000000 AS duration_sec
          FROM sess GROUP BY 1, 2 ORDER BY 1, 2""",
    // q116: same µs session derivation with event_type carried; ordered
    // string_agg replays the in-session rank cut — strings and integers
    // only
    "q116_session_paths" ->
      s"""WITH marked AS (
            SELECT user_id, event_id, event_type, epoch_ns(ts) AS tsn,
              CASE WHEN lag(epoch_ns(ts)) OVER w IS NULL
                     OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER w > ${gapUs * 1000L}
                   THEN 1 ELSE 0 END AS opens
            FROM events WHERE ts IS NOT NULL
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)),
          sess AS (
            SELECT user_id, event_id, event_type, tsn,
              sum(opens) OVER (PARTITION BY user_id ORDER BY tsn, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                AS session_id
            FROM marked),
          ranked AS (
            SELECT user_id, session_id, event_type,
              row_number() OVER (PARTITION BY user_id, session_id
                ORDER BY tsn, event_id) AS rnk
            FROM sess),
          paths AS (
            SELECT string_agg(event_type, '>' ORDER BY rnk) AS path
            FROM ranked WHERE rnk <= ${pathMaxLen}
            GROUP BY user_id, session_id)
          SELECT path, count(*) AS n_sessions FROM paths
          GROUP BY 1 ORDER BY n_sessions DESC, path LIMIT ${pathTopK}""",
    // q136: same µs session derivation, then the identical
    // collapse→bucket-sweep→carry decomposition (all BIGINT; the
    // max(0,·) term is the hour-start concurrency)
    "q136_peak_concurrency" ->
      s"""WITH marked AS (
            SELECT user_id, event_id, epoch_ns(ts) AS tsn,
              CASE WHEN lag(epoch_ns(ts)) OVER w IS NULL
                     OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER w > ${gapUs * 1000L}
                   THEN 1 ELSE 0 END AS opens
            FROM events WHERE ts IS NOT NULL
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)),
          sess0 AS (
            SELECT user_id, tsn,
              sum(opens) OVER (PARTITION BY user_id ORDER BY tsn, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                AS session_id
            FROM marked),
          sess AS (
            SELECT min(tsn) // 1000 AS s, max(tsn) // 1000 AS e
            FROM sess0 GROUP BY user_id, session_id),
          d AS (SELECT s AS t, 1::BIGINT AS delta FROM sess
                UNION ALL SELECT e + 1, (-1)::BIGINT FROM sess),
          net AS (SELECT t, sum(delta)::BIGINT AS net,
                    t // ${hourUs} AS hour
                  FROM d GROUP BY t),
          loc AS (SELECT hour, sum(net)::BIGINT AS hour_net,
                    max(run)::BIGINT AS max_local
                  FROM (SELECT hour, net, t,
                          sum(net) OVER (PARTITION BY hour ORDER BY t
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                            ::BIGINT AS run
                        FROM net) GROUP BY hour),
          spine AS (SELECT unnest(range(min(hour), max(hour) + 1)) AS hour
                    FROM loc),
          starts AS (SELECT s // ${hourUs} AS hour, count(*) AS n_starts
                     FROM sess GROUP BY 1),
          ends AS (SELECT e // ${hourUs} AS hour, count(*) AS n_ends
                   FROM sess GROUP BY 1),
          c AS (SELECT sp.hour,
                  coalesce(st.n_starts, 0) AS n_starts,
                  coalesce(en.n_ends, 0) AS n_ends,
                  l.max_local,
                  coalesce(sum(l.hour_net) OVER (ORDER BY sp.hour
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    ::BIGINT AS carry_in
                FROM spine sp LEFT JOIN loc l ON sp.hour = l.hour
                  LEFT JOIN starts st ON sp.hour = st.hour
                  LEFT JOIN ends en ON sp.hour = en.hour)
          SELECT hour, n_starts, n_ends,
            carry_in + greatest(0, coalesce(max_local, 0)) AS peak_sessions
          FROM c ORDER BY hour""",
    // q151: same µs session derivation with event_type carried; the
    // rate is one exact BIGINT multiply-then-floor-divide
    "q151_session_conversion" ->
      s"""WITH marked AS (
            SELECT user_id, event_id, event_type, epoch_ns(ts) AS tsn,
              CASE WHEN lag(epoch_ns(ts)) OVER w IS NULL
                     OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER w > ${gapUs * 1000L}
                   THEN 1 ELSE 0 END AS opens
            FROM events WHERE ts IS NOT NULL
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)),
          sess AS (
            SELECT user_id, event_type, tsn,
              sum(opens) OVER (PARTITION BY user_id ORDER BY tsn, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                AS session_id
            FROM marked),
          per AS (
            SELECT user_id, session_id, min(tsn) // 1000 AS start_us,
              max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS conv
            FROM sess GROUP BY 1, 2)
          SELECT start_us // ${hourUs} AS hour, count(*) AS n_sessions,
            sum(conv)::BIGINT AS n_converting,
            (sum(conv)::BIGINT * 1000000) // count(*) AS cvr_e6
          FROM per GROUP BY 1 ORDER BY 1""")
}
