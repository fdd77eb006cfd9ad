package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Behavioral analytics over the event stream: funnel progression and
  * cohort retention — the two standard product-analytics operators a
  * clickstream engine is expected to answer (not in the reference,
  * which has no per-user temporal analysis; first-class additions like
  * sessionization q27).
  *
  * Both are exact-arithmetic by construction (µs timestamps, BIGINT
  * day/stage math), so they hash-match the DuckDB oracle — no float in
  * the output at all. Every shuffle is on user_id or the
  * cohort/offset group keys; nothing is quadratic and nothing sorts
  * globally except the bounded presentation orderBy.
  */
object Behavior {

  /** q76 — ordered funnel signup → click → purchase per user: first
    * signup, first click at-or-after it, first purchase at-or-after
    * that click; `stage` = how far the user got (1–3). Stages chain
    * through min-aggregates and re-joins on user_id, so one hash
    * partitioning serves all three rounds (no window sort needed — a
    * min beats a full per-user ordering at 100 TB).
    */
  /** The registered q76 instance of the generic N-stage funnel. */
  val defaultFunnelStages: Seq[String] = Seq("signup", "click", "purchase")

  def funnel(spark: SparkSession, dir: String): DataFrame =
    funnelCore(Tables.eventsMicros(spark, dir))

  /** Generic ordered funnel over an arbitrary stage list (round-7
    * advice: a product-analytics engine takes the stages as a
    * parameter, not a hardcoded triple). Per user: first stage-1 event,
    * then for each later stage the first event at-or-after the previous
    * stage's match; `stage` = how far the user got (1..N). Output
    * columns are `<stage>_tsu` in stage order, so the default instance
    * is exactly the historical q76 shape.
    *
    * Each stage is a min-aggregate re-joined on user_id — one hash
    * partitioning serves every round (no per-user window sort; a min
    * beats a full per-user ordering at 100 TB), and the frame carried
    * between stages is one row per surviving user, monotonically
    * shrinking down the funnel.
    */
  private[graft] def funnelCore(
      ev: DataFrame,
      stages: Seq[String] = defaultFunnelStages): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct == stages, s"funnel stages must be distinct: $stages")
    val first = ev.filter(col("event_type") === stages.head)
      .groupBy("user_id").agg(min("tsu").as(s"${stages.head}_tsu"))
    // chained mins: stage k's first qualifying time gates stage k+1
    val times = stages.tail.scanLeft(first) { case (prev, st) =>
      val prevTsu = prev.columns.last
      ev.filter(col("event_type") === st)
        .join(prev, "user_id")
        .filter(col("tsu") >= col(prevTsu))
        .groupBy("user_id").agg(min("tsu").as(s"${st}_tsu"))
    }
    val joined = times.tail.foldLeft(first)(_.join(_, Seq("user_id"), "left_outer"))
    val depth = stages.tail
      .map(st => when(col(s"${st}_tsu").isNotNull, 1).otherwise(0))
      .foldLeft(lit(1): org.apache.spark.sql.Column)(_ + _)
    joined
      .withColumn("stage", depth.cast("long"))
      .select(col("user_id") +: stages.map(st => col(s"${st}_tsu"))
        :+ col("stage"): _*)
      .orderBy("user_id")
  }

  /** q278 per-step conversion deadline (1 h). */
  private[graft] val funnelWindowUs = 3600000000L

  /** q278 — WINDOWED FUNNEL: q76 with a per-step conversion deadline —
    * each stage must land within [[funnelWindowUs]] of the PREVIOUS
    * stage's matched event, the form every product-analytics funnel
    * actually runs ("purchased within an hour of clicking", not
    * "eventually"). Semantics are first-touch greedy, stated
    * explicitly: stage k matches its EARLIEST qualifying event, and
    * stage k+1's window anchors there — a user a later anchor would
    * have converted is counted as dropped, exactly as the standard
    * analytics engines count it (deterministic, and the oracle replays
    * the same rule; maximizing depth over anchor choices is a
    * different, quadratic problem).
    *
    * Scale: q76's chain shape verbatim — stage mins and re-joins all
    * ride one user_id hash partitioning; the carried frame is one row
    * per surviving user and shrinks monotonically.
    */
  def windowedFunnel(spark: SparkSession, dir: String): DataFrame =
    windowedFunnelCore(Tables.eventsMicros(spark, dir))

  private[graft] def windowedFunnelCore(
      ev: DataFrame,
      stages: Seq[String] = defaultFunnelStages,
      windowUs: Long = funnelWindowUs): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct == stages, s"funnel stages must be distinct: $stages")
    val first = ev.filter(col("event_type") === stages.head)
      .groupBy("user_id").agg(min("tsu").as(s"${stages.head}_tsu"))
    val times = stages.tail.scanLeft(first) { case (prev, st) =>
      val prevTsu = prev.columns.last
      ev.filter(col("event_type") === st)
        .join(prev, "user_id")
        .filter(col("tsu") >= col(prevTsu)
          && col("tsu") <= col(prevTsu) + windowUs)
        .groupBy("user_id").agg(min("tsu").as(s"${st}_tsu"))
    }
    val joined = times.tail.foldLeft(first)(_.join(_, Seq("user_id"), "left_outer"))
    val depth = stages.tail
      .map(st => when(col(s"${st}_tsu").isNotNull, 1).otherwise(0))
      .foldLeft(lit(1): org.apache.spark.sql.Column)(_ + _)
    joined
      .withColumn("stage", depth.cast("long"))
      // missed stages carry 0, never NULL: a nullable BIGINT re-hydrates
      // as float64+NaN in the driver's pandas compare (the q104-class
      // trap) — unlike q76, the deadline really does drop converters, so
      // NULLs WOULD appear here; `stage` already encodes which are unset
      .select(col("user_id") +: stages.map(st =>
        coalesce(col(s"${st}_tsu"), lit(0L)).as(s"${st}_tsu"))
        :+ col("stage"): _*)
      .orderBy("user_id")
  }

  /** q289 — ANY-ORDER FUNNEL: q76/q278 require signup→click→purchase
    * in sequence; this is the set-completion read ("touched all three
    * surfaces, in whatever order, within an hour of the first touch")
    * that activation metrics actually use when steps aren't causally
    * ordered. Per user: first touch per stage, stages_hit = how many
    * stages ever fire, completion = every stage's first touch lands
    * inside [first_touch, first_touch + window] — deterministic pure
    * aggregation, no anchoring subtleties (unlike the sequential
    * funnel there's no greedy choice to make: first touches are
    * unique minima).
    *
    * Scale: ONE map-side-combinable agg to user grain (conditional
    * mins); everything after is a projection. No joins at all — the
    * chain shape q76 needs for sequence constraints vanishes when
    * order doesn't matter.
    */
  def anyOrderFunnel(spark: SparkSession, dir: String): DataFrame =
    anyOrderFunnelCore(Tables.eventsMicros(spark, dir))

  private[graft] def anyOrderFunnelCore(
      ev: DataFrame,
      stages: Seq[String] = defaultFunnelStages,
      windowUs: Long = funnelWindowUs): DataFrame = {
    val mins = stages.map(st =>
      min(when(col("event_type") === st, col("tsu"))).as(s"${st}_tsu"))
    val hit = stages.map(st => when(col(s"${st}_tsu").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    val firstTouch = least(stages.map(st => col(s"${st}_tsu")): _*)
    val lastFirst = greatest(stages.map(st => col(s"${st}_tsu")): _*)
    ev.filter(col("event_type").isin(stages: _*))
      .groupBy("user_id")
      .agg(mins.head, mins.tail: _*)
      .withColumn("stages_hit", hit.cast("long"))
      .withColumn("first_touch_tsu", firstTouch)
      // complete iff all stages fired and the LAST first-touch is
      // within the window of the FIRST (least/greatest are null-safe
      // only when all inputs are non-null — gated by stages_hit)
      .withColumn("completed",
        col("stages_hit") === stages.size &&
          lastFirst <= firstTouch + windowUs)
      // missed stages emit 0, never NULL (the q104-class NaN trap)
      .select(col("user_id") +: stages.map(st =>
        coalesce(col(s"${st}_tsu"), lit(0L)).as(s"${st}_tsu")) ++:
        Seq(col("stages_hit"), col("first_touch_tsu"), col("completed")): _*)
      .orderBy("user_id")
  }

  private val dayUs = 86400000000L

  /** q77 — cohort retention: users grouped by first-active day; for
    * each (cohort_day, day_offset), how many of that cohort were active
    * offset days later. The (user, day) distinct collapses the event
    * volume to active-days BEFORE any join — state is bounded by
    * users × days, not events.
    */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame =
    cohortCore(Tables.eventsMicros(spark, dir))

  private[graft] def cohortCore(ev: DataFrame): DataFrame = {
    val days = ev
      .select(col("user_id"), expr(s"tsu div $dayUs").as("day"))
      .distinct()
    val cohort = days.groupBy("user_id").agg(min("day").as("cohort_day"))
    days.join(cohort, "user_id")
      .withColumn("day_offset", col("day") - col("cohort_day"))
      // rows are distinct (user, day): a plain count IS distinct users
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** q106 — event-flow transition matrix (the Markov view of the
    * clickstream): counts of consecutive (from → to) event-type pairs
    * per user timeline, plus each row's share of its from-type — the
    * standard flow/sankey input. One lag window per user (ordered by
    * (tsu, event_id) so intra-µs ties are deterministic in both
    * engines), then a 25-cell aggregate; the probability is a single
    * division of exact counts, identical IEEE both sides. One exchange
    * on user_id, and the transition table is |types|² rows however
    * large the stream.
    */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame =
    transitionsCore(Tables.eventsMicros(spark, dir))

  private[graft] def transitionsCore(ev: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("tsu", "event_id")
    val share = org.apache.spark.sql.expressions.Window
      .partitionBy("from_type")
    ev.select(col("user_id"), col("tsu"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type").as("from_type"),
        col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .withColumn("p", round(col("n_transitions").cast("double")
        / sum("n_transitions").over(share).cast("double"), 6))
      .orderBy("from_type", "to_type")
  }

  /** EWMA lookback depth for q185: the current row plus 7 lags. */
  private[graft] val ewmaDepth = 8
  private[graft] val ewmaStride = 7

  /** q185 — EXPONENTIAL MOVING AVERAGE, bounded lookback: per-user
    * smoothed event value with decay α = 1/2 over the last 8
    * observations — the standard trend/smoothing signal (load scores,
    * spend velocity, engagement decay). A true unbounded EWMA is a
    * sequential recurrence no SQL engine parallelizes and no
    * cross-engine oracle can replay exactly in floats; the bounded
    * form is the production shape anyway (with α = 1/2 the truncated
    * tail weighs < 0.4% of the signal) and it makes the op a plain
    * 8-term weighted sum over lag windows: weights 2⁷..2⁰ over
    * (current..lag7), normalized by the weights actually present at
    * the head of each user's timeline. Everything is integer
    * arithmetic — values in exact milli-units via floor, one shared
    * truncating division at the end — so the oracle replays it
    * bit-for-bit.
    *
    * 100 TB: ONE exchange on user_id, one per-partition sort, and the
    * 8 lags all share the same window frame (Spark plans a single
    * Window node); per-row state is 8 longs however long the history.
    * The emitted audit is every 7th row of each user's timeline.
    */
  def ewmaSmoothing(spark: SparkSession, dir: String): DataFrame =
    // value-null guard (P4): keeps vm non-null so den ≥ 2⁷ and the
    // shared division can never hit ANSI divide-by-zero
    ewmaCore(Tables.eventsMicros(spark, dir).filter(col("value").isNotNull))

  private[graft] def ewmaCore(ev: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("tsu", "event_id")
    val base = ev.select(col("user_id"), col("tsu"), col("event_id"),
      expr("floor(value * 1000.0D)").as("vm"))
    val lagged = (1 until ewmaDepth).foldLeft(
      base.withColumn("rn", row_number().over(w).cast("long"))) {
      case (df, k) => df.withColumn(s"vm_$k", lag("vm", k).over(w))
    }
    val terms = (0 until ewmaDepth).map { k =>
      val weight = 1L << (ewmaDepth - 1 - k)
      val v = if (k == 0) col("vm") else col(s"vm_$k")
      (when(v.isNotNull, v * weight).otherwise(lit(0L)),
        when(v.isNotNull, lit(weight)).otherwise(lit(0L)))
    }
    lagged
      .withColumn("num", terms.map(_._1).reduce(_ + _))
      .withColumn("den", terms.map(_._2).reduce(_ + _))
      .select(col("user_id"), col("event_id"), col("vm"),
        expr("num div den").as("ewma_milli"), col("rn"))
      .filter(col("rn") % ewmaStride === 0)
      .select("user_id", "event_id", "vm", "ewma_milli")
      .orderBy("user_id", "event_id")
  }

  /** q190 — TIME-WEIGHTED AVERAGE (TWAP): the correct mean for
    * irregularly sampled step signals (meter readings, prices, state
    * levels), where the plain average over-weights bursts. Each
    * observation holds until the next one, so its weight is the hold
    * duration: twap = Σ vᵢ·dtᵢ / Σ dtᵢ over [first, last] per user.
    * One lead window (same user_id exchange + sort as the q185 EWMA),
    * then a hash aggregate. The per-interval product vm·dt reaches
    * milli-value·µs ≈ 5·10⁵ · 3·10¹³ ≈ 10¹⁹ over a year's hold —
    * PAST 2⁶³, so the products and their sum run in DECIMAL(38,0)
    * (HUGEINT oracle-side) by construction, with one truncating
    * division at the end. Same-µs observations get dt = 0 (zero
    * weight, kept); single-observation users have no hold interval
    * and drop (span 0 — no TWAP is defined).
    */
  def twap(spark: SparkSession, dir: String): DataFrame =
    twapCore(Tables.eventsMicros(spark, dir).filter(col("value").isNotNull))

  private[graft] def twapCore(ev: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("tsu", "event_id")
    ev.select(col("user_id"), col("tsu"), col("event_id"),
        expr("floor(value * 1000.0D)").as("vm"))
      .withColumn("dt", lead("tsu", 1).over(w) - col("tsu"))
      .filter(col("dt").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_holds"),
        sum("dt").as("span_us"),
        sum(expr("cast(vm as decimal(38,0)) * dt")).as("vt"))
      .filter(col("span_us") > 0)
      .select(col("user_id"), col("n_holds"), col("span_us"),
        expr("vt div span_us").as("twap_milli"))
      .orderBy("user_id")
  }

  /** q192 — CALENDAR SPINE DENSIFY: turn the observed event stream into
    * a gapless (event_type, day) panel with explicit ZERO rows — the
    * precondition for any window/trend computation downstream (a ROWS
    * frame over a table with missing days silently reads the wrong
    * neighbors; q145 dodges that with RANGE frames, this op fixes the
    * table itself, the other standard answer). The spine is generated,
    * not stored: a single-row (min_day, max_day) bounds broadcast
    * (q135's sanctioned pattern) crossed with the bounded type
    * dimension and `sequence`-exploded — |types|·|days| rows however
    * large the fact table — then ONE left join against the hash-agg'd
    * daily counts.
    */
  def calendarSpine(spark: SparkSession, dir: String): DataFrame =
    spineCore(Tables.eventsMicros(spark, dir))

  private[graft] val dayUs2 = 86400000000L

  private[graft] def spineCore(ev: DataFrame): DataFrame = {
    val days = ev.select(expr(s"tsu div $dayUs2").as("day"),
      col("event_type"))
    val bounds = days.agg(min("day").as("d0"), max("day").as("d1"))
    val spine = days.select("event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    val daily = days.groupBy("event_type", "day")
      .agg(count(lit(1)).as("n"))
    spine.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("n"), lit(0L)).as("n_events"))
      .orderBy("event_type", "day")
  }

  /** Sliding-window geometry for q108: 1-hour windows advancing every
    * 15 minutes (width a whole multiple of the slide, so every event
    * covers exactly width/slide windows).
    */
  val slideUs = 900000000L
  val slideWindowUs = 3600000000L
  private val slidesPerWindow = (slideWindowUs / slideUs).toInt

  /** q108 — EXACT sliding-window distinct users ("hourly actives,
    * updated every 15 minutes"): each event belongs to exactly
    * width/slide = 4 overlapping windows, so it explodes into its
    * covering window starts, then a distinct (window, user) collapse
    * counts exactly. This is the batch twin of a sliding event-time
    * stream aggregate, and the one window shape q73/q101's trailing
    * RANGE frames don't express (aligned overlapping buckets, not
    * per-row lookback). Distinct-pair volume is 4× active (window,
    * user) pairs — a hash aggregate, never a per-window sort; at 100 TB
    * the explode factor is the constant width/slide, and the exact
    * count is what the q14-style HLL sketch gets judged against.
    */
  def slidingActiveUsers(spark: SparkSession, dir: String): DataFrame =
    Tables.eventsMicros(spark, dir)
      .select(col("user_id"), expr(s"tsu div $slideUs").as("slide"))
      .select(col("user_id"),
        explode(sequence(lit(0), lit(slidesPerWindow - 1))).as("k"),
        col("slide"))
      .select(col("user_id"),
        ((col("slide") - col("k")) * slideUs).as("window_start_us"))
      .distinct()
      .groupBy("window_start_us")
      .agg(count(lit(1)).as("n_active_users"))
      .orderBy("window_start_us")

  /** q117 — event-type CO-ENGAGEMENT: weighted Jaccard similarity
    * between the user sets of every event-type pair (do the users who
    * error also purchase?), the audience-overlap read none of the
    * per-user ops (q76 funnel, q77 cohorts, q106 transitions) answer —
    * those follow one user through time; this compares populations.
    *
    * All exact integers + one division: |A∩B| from a user-keyed
    * self-join of the DISTINCT (user, type) frame — each user carries
    * at most |types| rows, so the join fans out ≤ |types|² per user
    * (a constant), never a cartesian across users — and |A∪B| by
    * inclusion-exclusion from broadcast per-type totals. Output is
    * |types|²-bounded. The same shape at 100 TB: one user-grained
    * shuffle, vocabulary-sized everything after.
    */
  def typeCoEngagement(spark: SparkSession, dir: String): DataFrame =
    coEngagementCore(Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select("user_id", "event_type"))

  private[graft] def coEngagementCore(ut0: DataFrame): DataFrame = {
    val ut = ut0.distinct()
    val sizes = ut.groupBy("event_type").agg(count(lit(1)).as("n"))
    ut.as("a").join(ut.as("b"),
        col("a.user_id") === col("b.user_id")
          && col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(broadcast(sizes.select(col("event_type").as("type_a"),
        col("n").as("n_a"))), "type_a")
      .join(broadcast(sizes.select(col("event_type").as("type_b"),
        col("n").as("n_b"))), "type_b")
      .withColumn("jaccard", round(col("n_common").cast("double")
        / (col("n_a") + col("n_b") - col("n_common")).cast("double"), 6))
      .select("type_a", "type_b", "n_a", "n_b", "n_common", "jaccard")
      .orderBy(desc("jaccard"), asc("type_a"), asc("type_b"))
  }

  /** q120 — ACTIVITY HEATMAP: the (day-of-week × hour-of-day) event
    * matrix with per-cell distinct users, the load-profile read every
    * ops dashboard opens with. Bucketing is PURE integer epoch
    * arithmetic — dow = (days-since-epoch + 3) mod 7 with 0 = Monday
    * (1970-01-01 was a Thursday → 3), hour = in-day µs div 3600·10⁶ —
    * because engine calendar functions are exactly the cross-engine
    * convention trap the quantile memo records for percentile_disc:
    * Spark dayofweek is 1=Sunday, DuckDB's is 0=Sunday, and both
    * consult session timezones. Integer div/mod consults nothing.
    * One hash aggregate, 168-row output, distinct-user count exact
    * (the q14 HLL twin would replace it at unbounded user cardinality;
    * here the exact count IS the gate, q108's convention).
    */
  def activityHeatmap(spark: SparkSession, dir: String): DataFrame =
    heatmapCore(Tables.eventsMicros(spark, dir))

  private[graft] def heatmapCore(ev: DataFrame): DataFrame =
    ev.select(
        expr("((tsu div 86400000000) + 3) % 7").as("dow"),
        expr("(tsu % 86400000000) div 3600000000").as("hour"),
        col("user_id"))
      .groupBy("dow", "hour")
      .agg(count(lit(1)).as("n_events"),
        countDistinct("user_id").as("n_users"))
      .orderBy("dow", "hour")

  /** q272 — HOUR-OF-DAY SEASONAL PROFILE: the additive-decomposition
    * read under every traffic forecast — per hour-of-day, the seasonal
    * mean daily volume over the observed day RANGE (days with zero
    * events count as zeros — a mean over only-active days overstates
    * quiet hours), the share of total volume, and the residual
    * envelope (peak day vs seasonal mean). q120's heatmap is the
    * (dow × hour) count matrix; this is the normalized seasonal
    * component with explicit zero-day handling — what you subtract to
    * detrend (q145 then flags residual spikes).
    *
    * All integers: day/hour are epoch-µs div/mod (q120's stance on
    * calendar functions), means and shares are truncating ppm
    * divisions, and the missing-cell zeros are algebraic (days_active
    * vs day-range count decides whether the observed min is the true
    * min) — no spine join needed.
    *
    * Scale: one hash agg to the (day × hour) cell frame; the day-range
    * windows and the 24-row hour collapse live on cell grain (the q199
    * cell-frame stance), never on events.
    */
  def hourSeasonality(spark: SparkSession, dir: String): DataFrame =
    hourSeasonalityCore(Tables.eventsMicros(spark, dir))

  private[graft] def hourSeasonalityCore(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val all = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ev.select(
        expr(s"tsu div $dayUs2").as("day"),
        expr(s"(tsu % $dayUs2) div $hourUs").as("hour"))
      .groupBy("day", "hour")
      .agg(count(lit(1)).as("c"))
      .withColumn("n_days", max("day").over(all) - min("day").over(all) + 1)
      .withColumn("total", sum("c").over(all))
      .groupBy("hour")
      .agg(
        sum("c").as("n_events"),
        count(lit(1)).as("days_active"),
        max("n_days").as("n_days"),
        max("total").as("total"),
        max("c").as("max_day_events"),
        min("c").as("min_obs"))
      .select(
        col("hour"), col("n_events"), col("days_active"), col("n_days"),
        // DECIMAL(38,0) before the *10⁶ (r12 ADVICE, the q198/q280
        // discipline): a BIGINT hour bucket past ~9.2e12 events wraps
        // silently in Spark where DuckDB raises — at the 100-TB design
        // point that is an engine/oracle divergence. Same truncating
        // values at any non-wrapping count; cast back keeps the type.
        expr("cast(cast(n_events as decimal(38,0)) * 1000000 div n_days as bigint)")
          .as("mean_ppm"),
        expr("cast(cast(n_events as decimal(38,0)) * 1000000 div total as bigint)")
          .as("share_ppm"),
        col("max_day_events"),
        when(col("days_active") < col("n_days"), 0L).otherwise(col("min_obs"))
          .as("min_day_events"),
        expr("""cast(cast(max_day_events as decimal(38,0)) * 1000000
                - cast(n_events as decimal(38,0)) * 1000000 div n_days
                as bigint)""")
          .as("peak_over_mean_ppm"))
      .orderBy("hour")
  }

  /** q282 lags (days): adjacent days + the weekly echo. */
  private[graft] val acfLags = Seq(1L, 2L, 3L, 7L)

  /** q282 — AUTOCORRELATION PROFILE of the daily event count at fixed
    * lags (1/2/3/7 days) — the seasonality detector behind q272's
    * hour profile and q145's anomaly fences: a big lag-7 value says
    * "weekly cycle", decaying lag-1..3 says "momentum". Pearson r
    * needs a sqrt, which is ulp-unstable across engines, so the
    * emitted statistic is the SIGNED r² — sign(cov)·cov²/(vx·vy),
    * sqrt-free (the q111 ln-dropped stance: a monotone transform of
    * |r| plus the sign loses nothing a gate needs). cov and the two
    * variances are EXACT DECIMAL(38,0) integers; cov² itself would
    * overflow decimal at ~10⁸-event days over decade ranges, so the
    * emission is the q74/q111 discipline — one correctly-rounded cast
    * of each exact integer to double, then the identical
    * 3-multiply-1-divide IEEE expression in both engines: parity by
    * construction, pinned at 6 dp. Zero-event days count as genuine
    * zeros via the same algebraic day spine as q272 (sequence over
    * the observed [min_day, max_day] range).
    *
    * Scale: one hash agg to day grain (bounded — a decade is ~3,653
    * rows), then spine densify, a ≤4-literal explode, and a self
    * equi-join on (day+lag) — ALL on the bounded day frame; nothing
    * after the first agg is row-scaled. Σxy at day grain with
    * day-counts up to 10¹⁰ wraps BIGINT → DECIMAL(38,0).
    */
  def acfDaily(spark: SparkSession, dir: String): DataFrame =
    acfCore(Tables.eventsMicros(spark, dir).select("tsu"))

  private[graft] def acfCore(ev: DataFrame): DataFrame = {
    val byDay = ev.select(expr(s"tsu div $dayUs").as("day"))
      .groupBy("day").agg(count(lit(1)).as("n"))
    val dense = byDay.agg(min("day").as("d0"), max("day").as("d1"))
      .select(explode(expr("sequence(d0, d1)")).as("day"))
      .join(byDay, Seq("day"), "left")
      .na.fill(0L, Seq("n"))
    val pairs = dense
      .withColumn("lag", explode(typedLit(acfLags)))
      .join(dense.select(col("day").as("day_b"), col("n").as("n_b")),
        col("day_b") === col("day") + col("lag"))
    pairs.groupBy("lag")
      .agg(count(lit(1)).as("n_pairs"),
        sum(expr("cast(n as decimal(38,0))")).as("sx"),
        sum(expr("cast(n_b as decimal(38,0))")).as("sy"),
        sum(expr("cast(n as decimal(38,0)) * n_b")).as("sxy"),
        sum(expr("cast(n as decimal(38,0)) * n")).as("sxx"),
        sum(expr("cast(n_b as decimal(38,0)) * n_b")).as("syy"))
      // cov/vx/vy stay exact decimals; ONLY the final 3-multiply-
      // 1-divide runs in double, identically phrased in the oracle
      .select(col("lag"), col("n_pairs"),
        expr("cast(n_pairs * sxy - sx * sy as double)").as("cov_d"),
        expr("cast(n_pairs * sxx - sx * sx as double)").as("vx_d"),
        expr("cast(n_pairs * syy - sy * sy as double)").as("vy_d"))
      .select(col("lag"), col("n_pairs"),
        when(col("vx_d") === 0.0 || col("vy_d") === 0.0, lit(0.0))
          .otherwise(round(
            signum(col("cov_d")) * col("cov_d") * col("cov_d")
              / (col("vx_d") * col("vy_d")), 6)).as("acf_r2"))
      .orderBy("lag")
  }

  /** q298 — MANN–KENDALL TREND TEST on the daily event count: the
    * distribution-free "is this metric drifting?" monitor (Mann 1945,
    * Kendall's τ arithmetic) that pipeline-health dashboards run where
    * a fitted slope would be distorted by outliers — q216's CUSUM
    * localizes WHERE a level shift happened; this answers WHETHER a
    * monotone trend exists, with a significance-ready statistic.
    * S = Σ_{i<j} sgn(xⱼ − xᵢ) over the zero-filled day series (q282's
    * algebraic spine — zero-event days are genuine observations), and
    * the tie-corrected variance identity 18·Var(S) = n(n−1)(2n+5) −
    * Σ_t t(t−1)(2t+5) — both EXACT BIGINTs (n ≤ 3,653 days/decade
    * keeps n³ ≪ 2⁶³). Only the continuity-corrected z =
    * (S − sgn S)/√(Var) runs in double — the q282 discipline: one
    * cast of each exact integer, then the identical IEEE expression
    * in both engines, pinned at 6 dp.
    *
    * Scale: one hash agg to the bounded day grain; the pairwise
    * self-join, tie spectrum and totals are all on that ≤10³-row
    * frame (the q199 cell-frame stance) — nothing after the first
    * agg is row-scaled.
    */
  def mannKendall(spark: SparkSession, dir: String): DataFrame =
    mannKendallCore(Tables.eventsMicros(spark, dir).select("tsu"))

  /** Core over any (tsu) frame — fixture seam for the spec. */
  private[graft] def mannKendallCore(ev: DataFrame): DataFrame = {
    val byDay = ev.select(expr(s"tsu div $dayUs").as("day"))
      .groupBy("day").agg(count(lit(1)).as("n"))
    // three consumers of the bounded spine → eager checkpoint
    val dense = byDay.agg(min("day").as("d0"), max("day").as("d1"))
      .select(explode(expr("sequence(d0, d1)")).as("day"))
      .join(byDay, Seq("day"), "left")
      .na.fill(0L, Seq("n"))
      .localCheckpoint(true)
    val s = dense.as("a")
      .join(dense.as("b"), col("b.day") > col("a.day"))
      .agg(coalesce(sum(signum(col("b.n") - col("a.n")).cast("long")),
        lit(0L)).as("s_stat"))
    val ties = dense.groupBy("n").agg(count(lit(1)).as("t"))
      .agg(coalesce(sum(expr("t * (t - 1) * (2 * t + 5)")), lit(0L))
        .as("tie_term"))
    dense.agg(count(lit(1)).as("n_days"))
      .crossJoin(broadcast(s)).crossJoin(broadcast(ties))
      .select(col("n_days"), col("s_stat"),
        expr("n_days * (n_days - 1) * (2 * n_days + 5) - tie_term")
          .as("var_num18"))
      .select(col("n_days"), col("s_stat"), col("var_num18"),
        when(col("var_num18") <= 0L || col("s_stat") === 0L, lit(0.0))
          .otherwise(round(
            (col("s_stat") - signum(col("s_stat"))).cast("double")
              / sqrt(col("var_num18").cast("double") / lit(18.0)), 6))
          .as("mk_z"))
  }

  /** q301 — THEIL–SEN SLOPE of the daily event count: q298 answers
    * WHETHER a monotone trend exists; this is the robust estimate of
    * HOW STEEP (Theil 1950, Sen 1968 — the median of all pairwise
    * slopes, with breakdown point ~29% where OLS is wrecked by one
    * outlier day). Slopes are exact truncating ppm rationals
    * ((nⱼ−nᵢ)·10⁶ div (dayⱼ−dayᵢ), the numerator in DECIMAL(38,0) —
    * 10¹⁰-event days wrap BIGINT at the ppm scale), over the same
    * zero-filled day spine as q298/q282; truncation-toward-zero on
    * negative slopes is verified identical in Spark's `div` and
    * DuckDB's `//`, and the spec pins a negative non-exact case. The
    * median is the LOWER median (rank (n+1) div 2) in the total
    * (slope_ppm, day_a, day_b) order — deterministic under ties.
    *
    * Scale: the pair frame is day-grain² (≤ 6.7M pairs per decade —
    * calendar-bounded, never data-scaled); its median comes from the
    * q182 two-phase numbering, not a single-partition sort.
    */
  def theilSen(spark: SparkSession, dir: String): DataFrame =
    theilSenCore(Tables.eventsMicros(spark, dir).select("tsu"))

  /** Core over any (tsu) frame — fixture seam for the spec. */
  private[graft] def theilSenCore(ev: DataFrame): DataFrame = {
    val byDay = ev.select(expr(s"tsu div $dayUs").as("day"))
      .groupBy("day").agg(count(lit(1)).as("n"))
    val dense = byDay.agg(min("day").as("d0"), max("day").as("d1"))
      .select(explode(expr("sequence(d0, d1)")).as("day"))
      .join(byDay, Seq("day"), "left")
      .na.fill(0L, Seq("n"))
      .localCheckpoint(true)
    val pairs = dense.as("a")
      .join(dense.as("b"), col("b.day") > col("a.day"))
      .select(col("a.day").as("day_a"), col("b.day").as("day_b"),
        expr("""cast(cast(b.n - a.n as decimal(38,0)) * 1000000
                div (b.day - a.day) as bigint)""").as("slope_ppm"))
    val num = GlobalIndex.numberedBy(pairs,
      Seq("slope_ppm", "day_a", "day_b"))
    val tot = pairs.agg(count(lit(1)).as("n_pairs"))
    val nd = dense.agg(count(lit(1)).as("n_days"))
    num.crossJoin(broadcast(tot)).crossJoin(broadcast(nd))
      .filter(col("rn") === expr("(n_pairs + 1) div 2"))
      .select(col("n_days"), col("n_pairs"),
        col("slope_ppm").as("med_slope_ppm"))
  }

  /** q306 — SEASONAL MANN–KENDALL (Hirsch & Slack 1984): q298's
    * distribution-free trend test made robust to WEEKLY seasonality —
    * the dominant cycle in event traffic (q272 measures it; q298
    * compares Mondays against Saturdays and can read the weekly swing
    * as trend noise). Days are stratified by season = epoch-day mod 7
    * (a pure integer function — no calendar library, identical in
    * both engines); S' = Σ_g S_g sums each weekday's pairwise-sign
    * statistic (pairs never cross strata), Var' = Σ_g Var_g sums the
    * per-stratum tie-corrected variances (18·Var_g = n_g(n_g−1)(2n_g+5)
    * − Σ_t t(t−1)(2t+5), ties counted within the stratum), and the
    * continuity-corrected z is q298's expression verbatim. All exact
    * BIGINTs except the one final double — the q298/q303 discipline.
    *
    * Scale: the pair relation is per-stratum day-grain² (≤ (n/7)²·7 —
    * calendar-bounded); everything else is hash aggs on the bounded
    * spine.
    */
  def seasonalMannKendall(spark: SparkSession, dir: String): DataFrame =
    seasonalMkCore(Tables.eventsMicros(spark, dir).select("tsu"))

  /** Core over any (tsu) frame — fixture seam for the spec. */
  private[graft] def seasonalMkCore(ev: DataFrame): DataFrame = {
    val byDay = ev.select(expr(s"tsu div $dayUs").as("day"))
      .groupBy("day").agg(count(lit(1)).as("n"))
    val dense = byDay.agg(min("day").as("d0"), max("day").as("d1"))
      .select(explode(expr("sequence(d0, d1)")).as("day"))
      .join(byDay, Seq("day"), "left")
      .na.fill(0L, Seq("n"))
      .withColumn("season", pmod(col("day"), lit(7L)))
      .localCheckpoint(true)
    val s = dense.as("a")
      .join(dense.as("b"),
        col("a.season") === col("b.season") && col("b.day") > col("a.day"))
      .agg(coalesce(sum(signum(col("b.n") - col("a.n")).cast("long")),
        lit(0L)).as("s_total"))
    val v = dense.groupBy("season", "n").agg(count(lit(1)).as("t"))
      .groupBy("season").agg(
        coalesce(sum(expr("t * (t - 1) * (2 * t + 5)")), lit(0L))
          .as("tie_g"),
        sum("t").as("ng"))
      .agg(coalesce(sum(
        expr("ng * (ng - 1) * (2 * ng + 5) - tie_g")), lit(0L))
        .as("var_num18"))
    dense.agg(count(lit(1)).as("n_days"))
      .crossJoin(broadcast(s)).crossJoin(broadcast(v))
      .select(col("n_days"), col("s_total"), col("var_num18"),
        when(col("var_num18") <= 0L || col("s_total") === 0L, lit(0.0))
          .otherwise(round(
            (col("s_total") - signum(col("s_total"))).cast("double")
              / sqrt(col("var_num18").cast("double") / lit(18.0)), 6))
          .as("smk_z"))
  }

  /** z_{0.975} to 6 dp — the 95% two-sided normal quantile Gilbert's
    * CI construction uses; a fixed literal so both engines multiply
    * the identical double.
    */
  private[graft] val sensCiZ = "1.959964"

  /** q303 — SEN'S SLOPE CONFIDENCE INTERVAL (Gilbert 1987 §16.5, the
    * standard companion to q301): the rank-based 95% CI over the SAME
    * pairwise-slope relation — Cα = z₀.₉₇₅·√Var(S) with q298's exact
    * tie-corrected Mann–Kendall variance, and the interval endpoints
    * are the slopes at ranks (N − Cα)/2 and (N + Cα)/2 + 1 of the
    * ordered N pairwise slopes. Closes the trend-test family: q298
    * answers WHETHER, q301 HOW STEEP, q303 HOW SURE.
    *
    * Exactness discipline: N, Var-numerator (var_num18) and every
    * slope are exact integers; only Cα and the two rank positions run
    * in double — one cast per exact integer, then the identical IEEE
    * expression (×, √, /, round-half-away, truncate-cast) in both
    * engines. Gilbert leaves fractional ranks to "interpolate or
    * round"; the deterministic convention here is round-half-away to
    * the nearest rank (lower endpoint) and the same + 1 (upper),
    * clamped to [1, N] — pinned by the spec on a hand fixture.
    *
    * Scale: the same calendar-bounded pair frame as q301 (day-grain²,
    * never data-scaled); ranks from the q182 two-phase numbering; the
    * three endpoint picks are one filter over the numbered relation
    * against a broadcast single-row stats frame.
    */
  def sensSlopeCi(spark: SparkSession, dir: String): DataFrame =
    sensSlopeCiCore(Tables.eventsMicros(spark, dir).select("tsu"))

  /** Core over any (tsu) frame — fixture seam for the spec. */
  private[graft] def sensSlopeCiCore(ev: DataFrame): DataFrame = {
    val byDay = ev.select(expr(s"tsu div $dayUs").as("day"))
      .groupBy("day").agg(count(lit(1)).as("n"))
    val dense = byDay.agg(min("day").as("d0"), max("day").as("d1"))
      .select(explode(expr("sequence(d0, d1)")).as("day"))
      .join(byDay, Seq("day"), "left")
      .na.fill(0L, Seq("n"))
      .localCheckpoint(true)
    val pairs = dense.as("a")
      .join(dense.as("b"), col("b.day") > col("a.day"))
      .select(col("a.day").as("day_a"), col("b.day").as("day_b"),
        expr("""cast(cast(b.n - a.n as decimal(38,0)) * 1000000
                div (b.day - a.day) as bigint)""").as("slope_ppm"))
    val num = GlobalIndex.numberedBy(pairs,
      Seq("slope_ppm", "day_a", "day_b"))
    val ties = dense.groupBy("n").agg(count(lit(1)).as("t"))
      .agg(coalesce(sum(expr("t * (t - 1) * (2 * t + 5)")), lit(0L))
        .as("tie_term"))
    val stats = dense.agg(count(lit(1)).as("n_days"))
      .crossJoin(broadcast(pairs.agg(count(lit(1)).as("n_pairs"))))
      .crossJoin(broadcast(ties))
      .select(col("n_days"), col("n_pairs"),
        expr("n_days * (n_days - 1) * (2 * n_days + 5) - tie_term")
          .as("var_num18"))
      .withColumn("c_alpha",
        expr(s"$sensCiZ * sqrt(cast(var_num18 as double) / 18.0D)"))
      .select(col("n_days"), col("n_pairs"), col("var_num18"),
        expr("""greatest(1L, least(n_pairs,
                cast(round((cast(n_pairs as double) - c_alpha) / 2.0D, 0)
                  as bigint)))""").as("lo_rank"),
        expr("(n_pairs + 1) div 2").as("med_rank"),
        expr("""least(n_pairs, greatest(1L,
                cast(round((cast(n_pairs as double) + c_alpha) / 2.0D, 0)
                  as bigint) + 1L))""").as("hi_rank"))
    num.crossJoin(broadcast(stats))
      .filter(col("rn") === col("lo_rank") || col("rn") === col("med_rank")
        || col("rn") === col("hi_rank"))
      .groupBy("n_days", "n_pairs", "var_num18", "lo_rank", "hi_rank")
      .agg(
        max(when(col("rn") === col("lo_rank"), col("slope_ppm")))
          .as("lo_slope_ppm"),
        max(when(col("rn") === col("med_rank"), col("slope_ppm")))
          .as("med_slope_ppm"),
        max(when(col("rn") === col("hi_rank"), col("slope_ppm")))
          .as("hi_slope_ppm"))
      .select("n_days", "n_pairs", "var_num18", "lo_rank", "hi_rank",
        "lo_slope_ppm", "med_slope_ppm", "hi_slope_ppm")
  }

  /** q288 — BURSTINESS (FANO FACTOR) per event type: variance-to-mean
    * ratio of the DAILY count series — the dispersion read behind
    * q145's anomaly fences and q282's lag profile: Fano ≈ 1 is
    * Poisson-like arrivals, ≫ 1 is bursty (campaign/incident traffic),
    * ≪ 1 is regularized (rate-limited bots). Entirely RATIONAL — no
    * sqrt, unlike a coefficient of variation — so it stays in the
    * exact-integer ppm discipline end to end:
    * fano_ppm = (n·Σc² − (Σc)²)·10⁶ div (n·Σc), population variance
    * over mean, zero-event days counted as genuine zeros via the
    * global day-range spine (every type is observed over the same
    * window — a type absent all window scores its true 0 mean and is
    * dropped by the nullif guard as undefined).
    *
    * Scale: one hash agg to the (type × day) cell frame; the spine is
    * a bounded broadcast cross (day range × type vocabulary); sums
    * ride DECIMAL(38,0) (n·Σc² passes 2⁶³ near 10⁸-event days).
    */
  def fanoBurstiness(spark: SparkSession, dir: String): DataFrame =
    fanoCore(Tables.eventsMicros(spark, dir).select("event_type", "tsu"))

  private[graft] def fanoCore(ev: DataFrame): DataFrame = {
    val cells = ev
      .select(col("event_type"), expr(s"tsu div $dayUs").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("c"))
    val spine = cells.agg(min("day").as("d0"), max("day").as("d1"))
      .select(explode(expr("sequence(d0, d1)")).as("day"))
      .crossJoin(broadcast(cells.select("event_type").distinct()))
    spine.join(cells, Seq("event_type", "day"), "left")
      .na.fill(0L, Seq("c"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(expr("cast(c as decimal(38,0))")).as("sc"),
        sum(expr("cast(c as decimal(38,0)) * c")).as("sc2"),
        max("c").as("max_day"))
      .select(col("event_type"), col("n_days"),
        expr("cast(sc as bigint)").as("n_events"), col("max_day"),
        expr("cast(sc * 1000000 div n_days as bigint)").as("mean_ppm"),
        expr("""cast((n_days * sc2 - sc * sc) * 1000000
                div nullif(n_days * sc, 0) as bigint)""").as("fano_ppm"))
      .orderBy("event_type")
  }

  private val hourUs = 3600000000L

  /** q145 trailing-baseline geometry: each hour compares against the
    * mean of the previous `anomalyLookbackH` hours, and spikes when
    * volume exceeds `anomalyFactor`× that mean.
    */
  val anomalyLookbackH = 24L
  val anomalyFactor = 2L

  /** q145 — HOURLY VOLUME ANOMALY against a trailing baseline: the
    * operational monitoring read ("is this hour's traffic a spike?")
    * that needs a time-relative, not population-relative, fence —
    * q119's MAD fences values against the whole distribution; this
    * fences each hour against its own recent past, which is what
    * catches incidents and bot bursts in a diurnal stream.
    *
    * Exact by construction: the spike test n·|lookback| > factor·Σprev
    * is pure BIGINT (no mean is ever divided out), and RANGE — not
    * ROWS — frames make missing hours count as genuinely absent
    * rather than silently shifting the lookback. The window runs over
    * the calendar-bounded hourly table (q136's argument): the
    * full-data pass is one hash agg to (hour) cells.
    */
  def hourlyAnomaly(spark: SparkSession, dir: String): DataFrame =
    hourlyAnomalyCore(Tables.eventsMicros(spark, dir))

  private[graft] def hourlyAnomalyCore(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = ev.select(expr(s"tsu div $hourUs").as("hour"))
      .groupBy("hour").agg(count(lit(1)).as("n"))
    val trail = Window.orderBy("hour")
      .rangeBetween(-anomalyLookbackH, -1)
    hourly
      .withColumn("prev_hours", count(lit(1)).over(trail))
      .withColumn("prev_sum", coalesce(sum("n").over(trail), lit(0L)))
      .withColumn("is_spike",
        col("prev_hours") > 0 &&
          col("n") * col("prev_hours") > lit(anomalyFactor) * col("prev_sum"))
      .orderBy("hour")
  }

  /** q159 — A/B EXPERIMENT READOUT: deterministic 50/50 arm assignment
    * by hashed user_id (the q58/q144 md5-nibble discipline — stable
    * across runs, engines and cluster layouts, which is the property an
    * experiment platform actually needs: a user must land in the same
    * arm on every batch), then the signup→purchase conversion funnel
    * per arm and the treatment/control lift, all as exact integer ppm.
    * One row out: conditional aggregation collapses both arms in a
    * single pass over the per-user frame, which is signup-user-sized
    * (never event-sized) by the time anything aggregates. nullif guards
    * make degenerate arms (empty, zero-conversion) surface as null
    * rather than a division error — at 100 TB a mis-scoped experiment
    * filter WILL eventually produce one.
    */
  def abExperimentLift(spark: SparkSession, dir: String): DataFrame =
    abExperimentCore(Tables.eventsMicros(spark, dir))

  /** Core over any frame with (user_id, event_type, tsu) — fixture-
    * injection seam for the spec.
    */
  private[graft] def abExperimentCore(ev: DataFrame): DataFrame = {
    val signup = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("tsu").as("signup_tsu"))
    // converted = at least one purchase at-or-after first signup (the
    // q76 funnel gate), collapsed to user grain before the join back
    val converted = ev.filter(col("event_type") === "purchase")
      .join(signup, "user_id")
      .filter(col("tsu") >= col("signup_tsu"))
      .select("user_id").distinct()
      .withColumn("converted", lit(1))
    signup.join(converted, Seq("user_id"), "left_outer")
      .withColumn("arm",
        when(Sampling.nibbleOf(col("user_id"), ":arm") < 8, "control")
          .otherwise("treatment"))
      .agg(
        count(when(col("arm") === "control", 1)).as("n_signup_control"),
        count(when(col("arm") === "control", col("converted")))
          .as("n_conv_control"),
        count(when(col("arm") === "treatment", 1)).as("n_signup_treatment"),
        count(when(col("arm") === "treatment", col("converted")))
          .as("n_conv_treatment"))
      .withColumn("conv_control_ppm",
        expr("n_conv_control * 1000000 div nullif(n_signup_control, 0)"))
      .withColumn("conv_treatment_ppm",
        expr("n_conv_treatment * 1000000 div nullif(n_signup_treatment, 0)"))
      // lift from RAW counts, one exact division — dividing the two
      // already-floored ppm ratios would compound floor error (~2 ppm).
      // DECIMAL(38,0) intermediate: the triple product overflows Long
      // once arm counts pass ~1e8, and 100 TB cohorts will.
      .withColumn("lift_ppm",
        expr("""cast(n_conv_treatment as decimal(38,0)) * n_signup_control
                * 1000000
                div nullif(cast(n_conv_control as decimal(38,0))
                           * n_signup_treatment, 0)"""))
  }

  /** q222 — A/B SIGNIFICANCE in pure integers: the two-proportion
    * pooled z-test on q159's experiment, decided WITHOUT a single
    * float. q159 reports the effect (lift); this answers the other
    * half every readout needs — "is it noise?" — via the algebraic
    * identity z² = N·(c₁n₂ − c₂n₁)² / (n₁·n₂·C·(N−C)) (c=conversions,
    * n=arm sizes, C=c₁+c₂, N=n₁+n₂), so the α=0.05 decision is the
    * exact cross-multiplied comparison
    * 10⁴·N·(c₁n₂−c₂n₁)² > 38415·n₁n₂·C·(N−C) — the critical value
    * 3.8415 enters as an integer constant, never as an IEEE ratio.
    * z² itself ships as exact milli (one truncating division) for
    * dashboards that want the magnitude.
    *
    * DECIMAL(38,0) bound, documented AND enforced: (c₁n₂−c₂n₁)² stays
    * under 10³⁸ through ~3·10⁹ users per arm; the ·10⁴·N product
    * tightens that to ~10⁷ per arm. Past the bound the kernel RAISES
    * ([[Exact.orOverflowError]]) rather than saturating — reduce the
    * counts by their gcd or widen to a two-word representation. At any
    * plausible experiment size the arithmetic is exact.
    *
    * Scale: reuses q159's single-pass arm aggregation (user-grain
    * collapse, one row out) — the test adds projections, no new scan.
    */
  def abSignificance(spark: SparkSession, dir: String): DataFrame =
    abSignificanceCore(abExperimentCore(Tables.eventsMicros(spark, dir)))

  /** Over q159's one-row readout — fixture seam. */
  private[graft] def abSignificanceCore(readout: DataFrame): DataFrame =
    readout
      .select(
        col("n_signup_control").as("n1"),
        col("n_conv_control").as("c1"),
        col("n_signup_treatment").as("n2"),
        col("n_conv_treatment").as("c2"))
      .withColumn("d",
        expr("cast(c1 as decimal(38,0)) * n2 - cast(c2 as decimal(38,0)) * n1"))
      .withColumn("den",
        expr("""cast(n1 as decimal(38,0)) * n2
                * (c1 + c2) * (n1 + n2 - c1 - c2)"""))
      // degenerate dens (an empty arm, zero or total conversion) carry
      // 0/false, never NULL (the q104 NaN trap) — d is provably 0 in
      // every such case, so 0 is the honest value, not a sentinel. Each
      // degenerate case is decided by its OWN predicate; a NULL from
      // any other source can only be decimal overflow and RAISES
      // (Exact.orOverflowError) instead of saturating to a plausible
      // 0/false the oracle's HUGEINT would contradict (round-11 ADVICE;
      // the previous blanket coalesce conflated the two meanings).
      .select(col("n1"), col("c1"), col("n2"), col("c2"),
        when(expr("n1 = 0 or n2 = 0"), lit(0L))
          .otherwise(Exact.orOverflowError(
            expr("""cast((cast(c1 as decimal(38,0)) * n2
                      - cast(c2 as decimal(38,0)) * n1) * 1000000
                    div (cast(n1 as decimal(38,0)) * n2) as bigint)"""),
            "q222 diff_ppm")).as("diff_ppm"),
        when(expr("""n1 = 0 or n2 = 0 or c1 + c2 = 0
                     or c1 + c2 = n1 + n2"""), lit(0L))
          .otherwise(Exact.orOverflowError(
            expr("cast(1000 * (n1 + n2) * d * d div den as bigint)"),
            "q222 z2_milli")).as("z2_milli"),
        when(expr("""n1 = 0 or n2 = 0 or c1 + c2 = 0
                     or c1 + c2 = n1 + n2"""), lit(false))
          .otherwise(Exact.orOverflowError(
            expr("10000 * (n1 + n2) * d * d > 38415 * den"),
            "q222 significant_95")).as("significant_95"))

  /** q223 — CUPED-ADJUSTED A/B READOUT: the industry-standard variance
    * reduction (Deng et al., WSDM 2013) — each user's experiment-period
    * spend is adjusted by θ·(pre-period spend − pooled pre-mean),
    * where θ = Cov(X,Y)/Var(X) over the pooled population, removing
    * the between-user variance the pre-period already explains. q159
    * answers "did it move", q222 "is it noise"; this is the pass that
    * makes both SHARPER on the same traffic — the third leg of a real
    * experimentation platform.
    *
    * Exact fixed-point, both engines replicating the same truncation
    * order: spends are floor-milli sums per user; θ comes from the
    * one-pass sufficient statistics (n, Σx, Σy, Σxy, Σx²) — q201's
    * algebraic-aggregation argument — as θ_ppm = (nΣxy − ΣxΣy)·10⁶
    * div (nΣx² − (Σx)²); adjusted arm means apply θ_ppm with one
    * explicit div 10⁶. Zero pre-period variance → θ honest 0 (its
    * covariance is provably 0 too), never NULL. DECIMAL(38,0)
    * everywhere products can pass 2⁶³.
    *
    * Scale: one full-data pass collapses to user grain (the q159
    * discipline); ONE further aggregation row carries the pooled and
    * per-arm sufficient statistics together (conditional sums), so
    * the whole readout is two hash aggregates and a single-row
    * projection. The pre/post split is the q142 midpoint-cutoff
    * broadcast.
    */
  def cupedReadout(spark: SparkSession, dir: String): DataFrame =
    cupedCore(Tables.eventsMicros(spark, dir))

  private[graft] def cupedCore(ev0: DataFrame): DataFrame = {
    val ev = ev0.select(col("user_id"), col("tsu"), col("event_type"),
      col("value"))
    val cutoff = ev.agg(expr("(min(tsu) + max(tsu)) div 2").as("cut_us"))
    val perUser = ev.crossJoin(broadcast(cutoff))
      .groupBy("user_id")
      .agg(
        coalesce(sum(when(col("tsu") < col("cut_us")
            && col("event_type") === "purchase",
          expr("cast(floor(value * 1000.0D) as bigint)"))), lit(0L))
          .as("x"),
        coalesce(sum(when(col("tsu") >= col("cut_us")
            && col("event_type") === "purchase",
          expr("cast(floor(value * 1000.0D) as bigint)"))), lit(0L))
          .as("y"))
      .withColumn("is_t",
        Sampling.nibbleOf(col("user_id"), ":arm") >= 8)
    perUser.agg(
        count(lit(1)).as("n"),
        sum(expr("cast(x as decimal(38,0))")).as("sx"),
        sum(expr("cast(y as decimal(38,0))")).as("sy"),
        sum(expr("cast(x as decimal(38,0)) * y")).as("sxy"),
        sum(expr("cast(x as decimal(38,0)) * x")).as("sxx"),
        count(when(!col("is_t"), 1)).as("n_c"),
        sum(when(!col("is_t"), expr("cast(x as decimal(38,0))")))
          .as("sx_c"),
        sum(when(!col("is_t"), expr("cast(y as decimal(38,0))")))
          .as("sy_c"),
        count(when(col("is_t"), 1)).as("n_t"),
        sum(when(col("is_t"), expr("cast(x as decimal(38,0))")))
          .as("sx_t"),
        sum(when(col("is_t"), expr("cast(y as decimal(38,0))")))
          .as("sy_t"))
      // n=0 (empty frame: sums NULL) and zero pre-period variance are
      // the two honest-0 cases, each decided by its own predicate; any
      // other NULL is decimal overflow and raises (round-11 ADVICE —
      // the blanket coalesce previously mapped overflow to θ=0, a
      // silently un-adjusted readout the oracle would contradict)
      .withColumn("theta_ppm",
        when(expr("n = 0 or n * sxx - sx * sx = 0"), lit(0L))
          .otherwise(graft.ops.Exact.orOverflowError(
            expr("""(n * sxy - sx * sy) * 1000000
                    div (n * sxx - sx * sx)"""), "q223 theta_ppm")))
      .withColumn("mean_x_all_milli", expr("sx div n"))
      .withColumn("mean_y_c_milli", expr("sy_c div nullif(n_c, 0)"))
      .withColumn("mean_y_t_milli", expr("sy_t div nullif(n_t, 0)"))
      .withColumn("adj_y_c_milli",
        expr("""mean_y_c_milli - (theta_ppm
                * (sx_c div nullif(n_c, 0) - mean_x_all_milli)) div 1000000"""))
      .withColumn("adj_y_t_milli",
        expr("""mean_y_t_milli - (theta_ppm
                * (sx_t div nullif(n_t, 0) - mean_x_all_milli)) div 1000000"""))
      .select(
        col("n_c").as("n_control"), col("n_t").as("n_treatment"),
        // theta is non-NULL by the guard above; a NULL from this cast
        // can only be a >2⁶³ quotient — raise, don't ship NULL
        Exact.orOverflowError(expr("cast(theta_ppm as bigint)"),
          "q223 theta_ppm (bigint cast)").as("theta_ppm"),
        expr("cast(mean_y_c_milli as bigint)").as("mean_y_control_milli"),
        expr("cast(mean_y_t_milli as bigint)").as("mean_y_treatment_milli"),
        expr("cast(adj_y_c_milli as bigint)").as("adj_y_control_milli"),
        expr("cast(adj_y_t_milli as bigint)").as("adj_y_treatment_milli"),
        expr("cast(adj_y_t_milli - adj_y_c_milli as bigint)")
          .as("adj_diff_milli"))
  }

  /** q163 — TIME-TO-CONVERT LATENCY DISTRIBUTION per customer segment:
    * exact p50/p90/p99 of the signup→first-purchase delay, the
    * product-health metric behind "how long does activation take".
    * The delay frame collapses to one row per CONVERTED user before
    * anything else touches it (q76's min-agg discipline — never a
    * per-user ordered scan), the segment dimension joins at user grain
    * (dimension-sized → AQE broadcast), and the percentiles are the
    * q102 cume-selection kernel grouped by segment — selected data
    * values, zero float arithmetic, so the gate is exact. At 100 TB the
    * ordered pass runs over DISTINCT delay values per segment, which
    * µs-quantized delays keep far below user count.
    */
  def conversionLatency(spark: SparkSession, dir: String): DataFrame =
    conversionLatencyCore(Tables.eventsMicros(spark, dir),
      Tables.customer(spark, dir))

  /** Core over (user_id, event_type, tsu) events + a customer dim —
    * fixture-injection seam for the spec.
    */
  private[graft] def conversionLatencyCore(ev: DataFrame,
                                           cust: DataFrame): DataFrame = {
    val signup = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("tsu").as("signup_tsu"))
    val delays = ev.filter(col("event_type") === "purchase")
      .join(signup, "user_id")
      .filter(col("tsu") >= col("signup_tsu"))
      .groupBy("user_id")
      .agg(min(col("tsu") - col("signup_tsu")).as("delay_us"))
    val seg = delays.join(
      cust.select(col("c_custkey").as("user_id"), col("c_mktsegment")),
      "user_id")
    Skew.cumeCuts(seg, "delay_us",
      Seq("p50_us" -> 0.5, "p90_us" -> 0.9, "p99_us" -> 0.99),
      extras = Seq(max("n").as("n_converted")),
      groupCol = "c_mktsegment")
      .orderBy("c_mktsegment")
  }

  /** Ordering-key scale for q207's longest-streak argmax: encodes
    * (len DESC, start_day ASC) as the single BIGINT `len·10⁷ −
    * start_day` so both engines pick the same streak with plain
    * max_by/arg_max — no struct-comparator semantics to align.
    * Epoch-days stay < 10⁷ until the year 29379, and len ≤ days, so
    * the product is < 10¹⁴ — no overflow anywhere near 2⁶³.
    */
  private val streakKeyScale = 10000000L

  /** q207 — ACTIVITY STREAKS (gaps-and-islands): per user, the maximal
    * runs of CONSECUTIVE active days — the engagement read behind
    * "7-day streak" product mechanics and the canonical
    * gaps-and-islands pattern (group = day − row_number per user) that
    * no other registered query exercises. Output is user-grain: active
    * days, number of islands, longest island, and the start day of the
    * longest island (earliest start on equal length, made total by the
    * single-BIGINT ordering key above).
    *
    * Scale: the event stream collapses to DISTINCT (user, day) in one
    * hash aggregate (map-side combine kills the per-day fan-in), so
    * the window sort ranks days-per-user rows, not events — bounded by
    * the calendar, not the data. Everything downstream shuffles on
    * user_id exactly once; all-BIGINT output, no floats anywhere.
    */
  def activityStreaks(spark: SparkSession, dir: String): DataFrame =
    streaksCore(Tables.eventsMicros(spark, dir))

  private[graft] def streaksCore(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = ev.select(col("user_id"), expr(s"tsu div $dayUs2").as("day"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    val runs = days
      .withColumn("grp", col("day") - row_number().over(w))
      .groupBy("user_id", "grp")
      .agg(count(lit(1)).as("len"), min("day").as("start_day"))
    runs.groupBy("user_id")
      .agg(sum("len").as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max("len").as("max_streak_days"),
        max_by(col("start_day"),
          col("len") * streakKeyScale - col("start_day"))
          .as("top_streak_start"))
      .orderBy("user_id")
  }

  /** q208's sparse-series selector: a deterministic ~1% slice of the
    * stream (the "sensor with dropped readings" fixture — sparse
    * enough that the daily panel has real interior gaps at every test
    * SF, so the interpolation path is actually exercised, not
    * vacuously green).
    */
  private[graft] val gapFillMod = 101L

  /** q208 — GAP-FILL with LINEAR INTERPOLATION: q192 densifies the
    * calendar and leaves explicit zeros; this is the other standard
    * repair — missing interior days get the linearly interpolated
    * value between the nearest observed neighbors, edge days (before
    * the first / after the last observation of a series) carry 0 and
    * the 'edge' label, observed days pass through. The panel is daily
    * Σ value (milli-units) per event type over the sparse slice.
    *
    * Exact despite "interpolation": values are floor-milli BIGINTs
    * (q190's convention) and the interpolant
    * `prev + (next−prev)·(day−prev_day) div gap` is one truncating
    * integer division — bit-identical cross-engine, no float ever
    * materializes. prev/next arrive via ignore-nulls last/first over
    * (UNBOUNDED,0] and [0,UNBOUNDED) frames; the prev_day/prev_val
    * pair can't desynchronize because both CASE projections null on
    * exactly the same rows.
    *
    * Scale: one full-data hash agg to (type, day) cells; the spine is
    * generated from a single-row bounds broadcast (q192's sanctioned
    * pattern); the windows rank the |types|·|days| panel — calendar-
    * bounded, so per-series sorts never see corpus-scale rows.
    */
  def gapFillInterpolate(spark: SparkSession, dir: String): DataFrame =
    gapFillCore(Tables.eventsMicros(spark, dir)
      .filter(col("value").isNotNull &&
        pmod(col("event_id"), lit(gapFillMod)) === 0))

  private[graft] def gapFillCore(sub0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sub = sub0.select(col("event_type"),
      expr(s"tsu div $dayUs2").as("day"),
      expr("cast(floor(value * 1000.0D) as bigint)").as("vm"))
    val bounds = sub.agg(min("day").as("d0"), max("day").as("d1"))
    val spine = sub.select("event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    val daily = sub.groupBy("event_type", "day")
      .agg(sum("vm").as("m"))
    val panel = spine.join(daily, Seq("event_type", "day"), "left")
    val series = Window.partitionBy("event_type").orderBy("day")
    val back = series.rowsBetween(Window.unboundedPreceding, 0)
    val fwd = series.rowsBetween(0, Window.unboundedFollowing)
    val obs = col("m").isNotNull
    panel
      .withColumn("pm", last(when(obs, col("m")), ignoreNulls = true).over(back))
      .withColumn("pd", last(when(obs, col("day")), ignoreNulls = true).over(back))
      .withColumn("nm", first(when(obs, col("m")), ignoreNulls = true).over(fwd))
      .withColumn("nd", first(when(obs, col("day")), ignoreNulls = true).over(fwd))
      // edge rows carry 0, never NULL: a nullable BIGINT re-hydrates as
      // float64+NaN in the driver's pandas compare (the q104-class
      // trap) — `src` already says the 0 is "no value", and the
      // observed input is recoverable (src='obs' rows ARE the input)
      .select(col("event_type"), col("day"),
        when(obs, col("m"))
          .when(col("pm").isNotNull && col("nm").isNotNull,
            col("pm") + expr("(nm - pm) * (day - pd) div (nd - pd)"))
          .otherwise(lit(0L)).as("m_filled"),
        when(obs, lit("obs"))
          .when(col("pm").isNotNull && col("nm").isNotNull, lit("interp"))
          .otherwise(lit("edge")).as("src"))
      .orderBy("event_type", "day")
  }

  /** q211 — USER GROWTH CURVE: per day, active users, NEW users (first
    * ever seen that day) and the cumulative distinct-user count — the
    * DAU / acquisition / total-reach triple every growth dashboard
    * opens with. The naive formulation (count(DISTINCT user) over an
    * expanding window) re-scans every prefix and is quadratic in days;
    * the identity used here — cumulative distinct ≡ running Σ of
    * first-seen counts — makes it two hash aggregates and one window
    * over the day-grain frame.
    *
    * Scale: the stream collapses to DISTINCT (user, day) map-side
    * first; first-seen day is a min-agg on user_id (the q76/q77
    * user-grain discipline); the only window runs over the
    * calendar-bounded daily frame, so the single-partition Window sort
    * ranks days, never users or events. All-BIGINT output.
    */
  def userGrowthCurve(spark: SparkSession, dir: String): DataFrame =
    growthCore(Tables.eventsMicros(spark, dir))

  private[graft] def growthCore(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = ev.select(col("user_id"), expr(s"tsu div $dayUs2").as("day"))
      .distinct()
    val f = d.groupBy("user_id").agg(min("day").as("first_day"))
    val perDay = d.join(f, "user_id")
      .groupBy("day")
      .agg(count(lit(1)).as("n_active_users"),
        count(when(col("day") === col("first_day"), 1)).as("n_new_users"))
    perDay
      .withColumn("n_cum_users", sum("n_new_users")
        .over(Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .orderBy("day")
  }

  /** q214 — OHLC RESAMPLE BARS: the canonical time-series downsampling
    * (open / high / low / close / count per hour per series) that turns
    * a tick-grain stream into fixed-frequency bars — the read behind
    * every price chart and the standard first step before any bar-level
    * model. Open/close are ORDER statistics (first/last by event time,
    * event_id breaking same-µs ties — the q36 tie discipline), not
    * aggregates, which is what makes this a distinct operator from a
    * plain min/max rollup.
    *
    * Mechanics: one window partitioned by (series, hour) ordered by
    * (tsu, event_id) ranks ascending and descending in the same sorted
    * run (the descending rank is n+1−rank — no second sort, no second
    * exchange); open/close fall out as conditional aggregates on
    * rank 1 / rank n. Values are floor-milli BIGINTs end to end.
    *
    * Scale: ONE exchange on (series, hour); per-partition sort ranks
    * one bar's ticks, bounded by per-series-per-hour volume, never the
    * stream. The bar table is calendar×series-bounded.
    */
  def ohlcBars(spark: SparkSession, dir: String): DataFrame =
    ohlcCore(Tables.eventsMicros(spark, dir)
      .filter(col("value").isNotNull))

  private[graft] def ohlcCore(ev0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = ev0.select(col("event_type"),
      expr(s"tsu div $hourUs").as("hr"),
      col("tsu"), col("event_id"),
      expr("cast(floor(value * 1000.0D) as bigint)").as("vm"))
    val w = Window.partitionBy("event_type", "hr")
      .orderBy(col("tsu").asc, col("event_id").asc)
    ev.withColumn("ra", row_number().over(w))
      .withColumn("nb", count(lit(1)).over(
        Window.partitionBy("event_type", "hr")))
      .groupBy("event_type", "hr")
      .agg(count(lit(1)).as("n_ticks"),
        max(when(col("ra") === 1, col("vm"))).as("open_milli"),
        max("vm").as("high_milli"),
        min("vm").as("low_milli"),
        max(when(col("ra") === col("nb"), col("vm"))).as("close_milli"))
      .orderBy("event_type", "hr")
  }

  /** q216 — CUSUM CHANGE-POINT DETECTION over daily volumes: the
    * sequential drift detector (Page 1954) behind "did this stream's
    * level shift?" — q145 catches single-hour spikes against a trailing
    * mean; CUSUM catches SUSTAINED small shifts a spike fence never
    * trips on, which is how ingestion regressions and slow-ramp
    * incidents actually present.
    *
    * The recurrence S_t = max(0, S_{t−1} + (x_t − μ − k)) looks
    * inherently sequential, but has the closed form
    * S_t = cum_t − min(0, min_{j≤t} cum_j) — a prefix sum and a prefix
    * min, BOTH plain window functions over the gapless daily panel
    * (q192's spine: a missing day is a REAL zero to a drift detector,
    * not an absent row). Everything stays integral by scaling through
    * N (days) and T (total): y_t = N·x_t − T − (T div 10) encodes
    * x_t − μ − 0.1μ times N; the alarm S′_t > 3·T encodes S_t > 3μ.
    * Products stay under 2⁶³ through ~10¹⁶ row-days — documented
    * bound, decimal-widen past it.
    *
    * Scale: one full-data hash agg to (type, day) cells; windows rank
    * the calendar-bounded panel. Same shape as q145/q192.
    */
  def cusumChangepoints(spark: SparkSession, dir: String): DataFrame =
    cusumCore(spineCore(Tables.eventsMicros(spark, dir)))

  /** Over a gapless (event_type, day, n_events) panel. */
  private[graft] def cusumCore(panel: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val series = Window.partitionBy("event_type")
    val run = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    panel
      .withColumn("n_days", count(lit(1)).over(series))
      .withColumn("total", sum("n_events").over(series))
      .withColumn("y",
        col("n_days") * col("n_events") - col("total")
          - expr("total div 10"))
      .withColumn("cum", sum("y").over(run))
      .withColumn("cusum_scaled",
        col("cum") - least(lit(0L), min("cum").over(run)))
      .withColumn("is_alarm", col("cusum_scaled") > lit(3L) * col("total"))
      .select("event_type", "day", "n_events", "cusum_scaled", "is_alarm")
      .orderBy("event_type", "day")
  }

  /** q224 — EVENT-TIME LATENESS AUDIT: per event type, how
    * out-of-order the stream actually arrives — the measurement that
    * CHOOSES a watermark delay (q100 accounts for what a given delay
    * drops; this is the pre-flight that picks it: set the delay at the
    * p99 lateness and you bound both state size and drop rate).
    * Lateness of an event = how far its event time sits behind the
    * high-water mark of everything that arrived BEFORE it in the same
    * user's stream (event_id is arrival order; the per-user scope
    * matches how keyed streaming state actually observes disorder, and
    * is the scale-safe formulation — a GLOBAL arrival ranking is a
    * single-task sort of the corpus).
    *
    * Exact: lateness is a µs BIGINT difference; the p50/p99 picks are
    * the q102 discrete-selection kernel (shared cume rule, so engines
    * can't drift); late_ppm is one truncating division.
    *
    * Scale: the high-water-mark window shares the user_id exchange
    * every behavioral op uses; the percentile pass runs at
    * (type, lateness)-grain after the histogram collapse.
    */
  /** q224's simulated delivery: the synthetic stream is perfectly
    * ordered (ts monotone in event_id), so the registered instance
    * delays every 11th event by 50 arrival slots — the q113
    * redelivery discipline: manufacture the disorder class
    * deterministically so the audit's interesting path is genuinely
    * exercised and gated; production points the same audit at the
    * REAL arrival order (a log offset / kafka offset column).
    */
  private[graft] val lateMod = 11L
  private[graft] val lateSlots = 50L

  def latenessAudit(spark: SparkSession, dir: String): DataFrame =
    latenessCore(Tables.eventsMicros(spark, dir)
      .withColumn("arrival",
        when(pmod(col("event_id"), lit(lateMod)) === 0,
          col("event_id") + lateSlots).otherwise(col("event_id"))))

  /** Over any frame with (user_id, event_id, arrival, event_type,
    * tsu); lateness is measured against the high-water mark in
    * ARRIVAL order.
    */
  private[graft] def latenessCore(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val prior = Window.partitionBy("user_id")
      .orderBy("arrival", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLate = ev
      .withColumn("hwm", max("tsu").over(prior))
      .withColumn("lateness_us",
        greatest(coalesce(col("hwm") - col("tsu"), lit(0L)), lit(0L)))
    Skew.cumeCuts(withLate.select(col("event_type"), col("lateness_us")),
        "lateness_us",
        Seq("p50_lateness_us" -> 0.5, "p99_lateness_us" -> 0.99),
        extras = Seq(
          max("n").as("n_events"),
          expr("sum(case when lateness_us > 0 then c else 0 end)")
            .as("n_late"),
          max(col("lateness_us")).as("max_lateness_us")))
      .withColumn("late_ppm", expr("n_late * 1000000 div n_events"))
      .orderBy("event_type")
  }

  type Q = (SparkSession, String) => DataFrame

  /** q201 — OLS TREND SLOPES as a one-pass aggregation: per customer
    * segment, the least-squares slope of order value (exact cents)
    * against order day, computed from the five sufficient statistics
    * (n, Σx, Σy, Σxy, Σx²) — regression is algebraic, so it
    * map-side-combines like any sum and NEVER materializes the
    * per-point frame twice, which is the only shape that survives a
    * 100 TB fact scan (the textbook two-pass "subtract the mean"
    * formulation reads the data twice and is order-sensitive in
    * doubles).
    *
    * Everything integral until one truncating division: y = floor
    * cents (the q183 convention), x = epoch-day, sums in
    * DECIMAL(38,0) — Σxy passes 2⁶³ near 1e7 rows per segment at
    * these magnitudes, and n·Σxy passes it immediately. Slope is
    * emitted in milli-cents/day (·1000 before the div); both engines
    * truncate toward zero on negatives (verified: DuckDB `//` ==
    * Spark `div`). A segment whose orders all land on one day has a
    * zero denominator → null slope (nullif, both engines).
    */
  def trendSlopes(spark: SparkSession, dir: String): DataFrame =
    trendCore(Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"),
        expr(s"unix_micros(o_orderdate) div ${graft.ops.Changelog.usPerDay}")
          .as("x"),
        expr("floor(o_totalprice * 100.0D)").as("y")))

  /** The sufficient-statistics fold over a (segment, x, y) frame —
    * fixture seam for the spec.
    */
  private[graft] def trendCore(pts: DataFrame): DataFrame =
    pts
      .groupBy("segment")
      .agg(
        count(lit(1)).as("n"),
        sum(expr("cast(x as decimal(38,0))")).as("sx"),
        sum(expr("cast(y as decimal(38,0))")).as("sy"),
        sum(expr("cast(x as decimal(38,0)) * y")).as("sxy"),
        sum(expr("cast(x as decimal(38,0)) * x")).as("sxx"))
      .select(col("segment"), col("n").as("n_orders"),
        expr("""CAST((n * sxy - sx * sy) * 1000
                  div nullif(n * sxx - sx * sx, 0) AS BIGINT)""")
          .as("slope_milli"))
      .orderBy("segment")

  /** q237 — TWO-FACTOR OLS per segment: β for y = β₀ + β₁·day +
    * β₂·balance over the orders×customer frame (q201 fits the
    * single-feature trend; this is the multiple-regression step an
    * analytics engine owes its users — "is the trend real once account
    * balance is controlled for"). One hash aggregate collects the NINE
    * sufficient statistics (n, Σx₁, Σx₂, Σy, Σx₁², Σx₁x₂, Σx₂²,
    * Σx₁y, Σx₂y) in DECIMAL(38,0) — exact, map-side-combined, one
    * exchange on segment (the q201/q213 sufficient-statistics
    * argument); the centered normal-equation solve (Cramer on the 2×2
    * system) runs on the segment-grain frame.
    *
    * Exactness stance: the centered moments S₁₁ = nΣx₁²−(Σx₁)² etc.
    * are EXACT DECIMAL(38,0) (bound ~10³² at 100 TB magnitudes — safe);
    * Cramer's quotients would need ~10⁶⁰ numerators, past any fixed
    * decimal, so the SOLVE casts the exact moments to DOUBLE — both
    * engines correctly-round the same exact integers to the same
    * binary64, then run the identical expression tree → bit-equal
    * results, rounded to 6dp (the q109 convention).
    */
  def olsTwoFactor(spark: SparkSession, dir: String): DataFrame =
    olsTwoFactorCore(Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"),
        expr(s"unix_micros(o_orderdate) div ${graft.ops.Changelog.usPerDay}")
          .as("x1"),
        expr("floor(c_acctbal * 100.0D)").as("x2"),
        expr("floor(o_totalprice * 100.0D)").as("y")))

  /** The sufficient-statistics fold + centered Cramer solve over a
    * (segment, x1, x2, y) frame — fixture seam for the spec.
    */
  private[graft] def olsTwoFactorCore(pts: DataFrame): DataFrame =
    pts
      .groupBy("segment")
      .agg(
        count(lit(1)).as("n"),
        sum(expr("cast(x1 as decimal(38,0))")).as("s1"),
        sum(expr("cast(x2 as decimal(38,0))")).as("s2"),
        sum(expr("cast(y as decimal(38,0))")).as("sy"),
        sum(expr("cast(x1 as decimal(38,0)) * x1")).as("s11"),
        sum(expr("cast(x1 as decimal(38,0)) * x2")).as("s12"),
        sum(expr("cast(x2 as decimal(38,0)) * x2")).as("s22"),
        sum(expr("cast(x1 as decimal(38,0)) * y")).as("s1y"),
        sum(expr("cast(x2 as decimal(38,0)) * y")).as("s2y"))
      .select(col("segment"), col("n").as("n_orders"),
        expr("cast(n * s11 - s1 * s1 as double)").as("c11"),
        expr("cast(n * s12 - s1 * s2 as double)").as("c12"),
        expr("cast(n * s22 - s2 * s2 as double)").as("c22"),
        expr("cast(n * s1y - s1 * sy as double)").as("c1y"),
        expr("cast(n * s2y - s2 * sy as double)").as("c2y"),
        expr("cast(s1 as double)").as("d1"),
        expr("cast(s2 as double)").as("d2"),
        expr("cast(sy as double)").as("dy"),
        expr("cast(n as double)").as("dn"))
      .withColumn("det", expr("c11 * c22 - c12 * c12"))
      .withColumn("beta_day",
        expr("round((c22 * c1y - c12 * c2y) / nullif(det, 0.0D), 6)"))
      .withColumn("beta_bal",
        expr("round((c11 * c2y - c12 * c1y) / nullif(det, 0.0D), 6)"))
      .withColumn("intercept", expr(
        """round((dy - ((c22 * c1y - c12 * c2y) / nullif(det, 0.0D)) * d1
                     - ((c11 * c2y - c12 * c1y) / nullif(det, 0.0D)) * d2)
             / dn, 6)"""))
      .select("segment", "n_orders", "beta_day", "beta_bal", "intercept")
      .orderBy("segment")

  val queries: Map[String, Q] = Map(
    "q237_ols_two_factor" -> (olsTwoFactor(_, _)),
    "q207_activity_streaks" -> (activityStreaks(_, _)),
    "q208_gap_fill_interpolate" -> (gapFillInterpolate(_, _)),
    "q211_user_growth" -> (userGrowthCurve(_, _)),
    "q214_ohlc_bars" -> (ohlcBars(_, _)),
    "q216_cusum_changepoints" -> (cusumChangepoints(_, _)),
    "q201_trend_slopes" -> (trendSlopes(_, _)),
    "q190_twap" -> (twap(_, _)),
    "q192_calendar_spine" -> (calendarSpine(_, _)),
    "q185_ewma_smoothing" -> (ewmaSmoothing(_, _)),
    "q163_conversion_latency" -> (conversionLatency(_, _)),
    "q159_ab_experiment" -> (abExperimentLift(_, _)),
    "q222_ab_significance" -> (abSignificance(_, _)),
    "q223_cuped_readout" -> (cupedReadout(_, _)),
    "q224_lateness_audit" -> (latenessAudit(_, _)),
    "q145_hourly_anomaly" -> (hourlyAnomaly(_, _)),
    "q117_type_coengagement" -> (typeCoEngagement(_, _)),
    "q120_activity_heatmap" -> (activityHeatmap(_, _)),
    "q272_hour_seasonality" -> (hourSeasonality(_, _)),
    "q282_acf_daily" -> (acfDaily(_, _)),
    "q298_mann_kendall" -> (mannKendall(_, _)),
    "q301_theil_sen" -> (theilSen(_, _)),
    "q303_sens_slope_ci" -> (sensSlopeCi(_, _)),
    "q306_seasonal_mann_kendall" -> (seasonalMannKendall(_, _)),
    "q288_fano_burstiness" -> (fanoBurstiness(_, _)),
    "q76_funnel" -> (funnel(_, _)),
    "q278_windowed_funnel" -> (windowedFunnel(_, _)),
    "q289_anyorder_funnel" -> (anyOrderFunnel(_, _)),
    "q77_cohort_retention" -> (cohortRetention(_, _)),
    "q106_event_transitions" -> (eventTransitions(_, _)),
    "q108_sliding_active_users" -> (slidingActiveUsers(_, _)))

  val oracles: Map[String, String] = Map(
    // q288: same cell collapse, same generate_series × type spine,
    // same integral variance-over-mean chain in HUGEINT
    "q288_fano_burstiness" ->
      s"""WITH cells AS (
            SELECT event_type, (epoch_ns(ts) // 1000) // $dayUs2 AS day,
              count(*)::BIGINT AS c
            FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
          spine AS (
            SELECT t.event_type, d.day
            FROM (SELECT DISTINCT event_type FROM cells) t
            CROSS JOIN (SELECT unnest(generate_series(
              (SELECT min(day) FROM cells),
              (SELECT max(day) FROM cells))) AS day) d),
          dense AS (
            SELECT s.event_type, s.day, coalesce(c.c, 0)::BIGINT AS c
            FROM spine s LEFT JOIN cells c
              ON s.event_type = c.event_type AND s.day = c.day),
          agg AS (
            SELECT event_type, count(*)::HUGEINT AS n_days,
              sum(c)::HUGEINT AS sc, sum(c::HUGEINT * c) AS sc2,
              max(c)::BIGINT AS max_day
            FROM dense GROUP BY 1)
          SELECT event_type, n_days::BIGINT AS n_days, sc::BIGINT AS n_events,
            max_day,
            (sc * 1000000 // n_days)::BIGINT AS mean_ppm,
            ((n_days * sc2 - sc * sc) * 1000000
              // nullif(n_days * sc, 0))::BIGINT AS fano_ppm
          FROM agg ORDER BY event_type""",
    // q282: same day-grain collapse and generate_series zero-day
    // spine; sums exact in HUGEINT, the same 3-multiply-1-divide
    // double expression at the end (parity by construction)
    "q282_acf_daily" -> {
      val lagArr = acfLags.mkString("[", ",", "]")
      s"""WITH byday AS (
            SELECT (epoch_ns(ts) // 1000) // $dayUs2 AS day,
              count(*)::BIGINT AS n
            FROM events WHERE ts IS NOT NULL GROUP BY 1),
          dense AS (
            SELECT s.day, coalesce(b.n, 0)::BIGINT AS n
            FROM (SELECT unnest(generate_series(
                    (SELECT min(day) FROM byday),
                    (SELECT max(day) FROM byday))) AS day) s
            LEFT JOIN byday b ON s.day = b.day),
          lags AS (SELECT unnest($lagArr::BIGINT[]) AS lag),
          pairs AS (
            SELECT l.lag, a.n AS x, b.n AS y
            FROM dense a JOIN lags l ON true
            JOIN dense b ON b.day = a.day + l.lag),
          s AS (
            SELECT lag, count(*)::HUGEINT AS np,
              sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
              sum(x::HUGEINT * y) AS sxy, sum(x::HUGEINT * x) AS sxx,
              sum(y::HUGEINT * y) AS syy
            FROM pairs GROUP BY 1),
          d AS (
            SELECT lag, np::BIGINT AS n_pairs,
              (np * sxy - sx * sy)::DOUBLE AS cov_d,
              (np * sxx - sx * sx)::DOUBLE AS vx_d,
              (np * syy - sy * sy)::DOUBLE AS vy_d
            FROM s)
          SELECT lag, n_pairs,
            CASE WHEN vx_d = 0 OR vy_d = 0 THEN 0.0
              ELSE round(sign(cov_d) * cov_d * cov_d / (vx_d * vy_d), 6)
            END AS acf_r2
          FROM d ORDER BY lag""" },
    // q298: same day collapse and zero-day spine as q282; S and the
    // tie-corrected 18·Var identity exact in BIGINT, the identical
    // continuity-corrected double z at the end
    "q298_mann_kendall" ->
      s"""WITH byday AS (
            SELECT (epoch_ns(ts) // 1000) // $dayUs2 AS day,
              count(*)::BIGINT AS n
            FROM events WHERE ts IS NOT NULL GROUP BY 1),
          dense AS (
            SELECT s.day, coalesce(b.n, 0)::BIGINT AS n
            FROM (SELECT unnest(generate_series(
                    (SELECT min(day) FROM byday),
                    (SELECT max(day) FROM byday))) AS day) s
            LEFT JOIN byday b ON s.day = b.day),
          s AS (
            SELECT coalesce(sum(sign(b.n - a.n)), 0)::BIGINT AS s_stat
            FROM dense a JOIN dense b ON b.day > a.day),
          ties AS (
            SELECT coalesce(sum(t * (t - 1) * (2 * t + 5)), 0)::BIGINT
              AS tie_term
            FROM (SELECT count(*)::BIGINT AS t FROM dense GROUP BY n)),
          tot AS (SELECT count(*)::BIGINT AS n_days FROM dense),
          v AS (
            SELECT n_days, s_stat,
              (n_days * (n_days - 1) * (2 * n_days + 5) - tie_term)
                AS var_num18
            FROM tot, s, ties)
          SELECT n_days, s_stat, var_num18,
            CASE WHEN var_num18 <= 0 OR s_stat = 0 THEN 0.0
              ELSE round((s_stat - sign(s_stat))::DOUBLE
                / sqrt(var_num18::DOUBLE / 18.0), 6)
            END AS mk_z
          FROM v""",
    // q301: same day spine as q298; pairwise truncating ppm slopes in
    // HUGEINT (negative truncation verified identical), lower median
    // by the same (slope, day_a, day_b) total order
    "q301_theil_sen" ->
      s"""WITH byday AS (
            SELECT (epoch_ns(ts) // 1000) // $dayUs2 AS day,
              count(*)::BIGINT AS n
            FROM events WHERE ts IS NOT NULL GROUP BY 1),
          dense AS (
            SELECT s.day, coalesce(b.n, 0)::BIGINT AS n
            FROM (SELECT unnest(generate_series(
                    (SELECT min(day) FROM byday),
                    (SELECT max(day) FROM byday))) AS day) s
            LEFT JOIN byday b ON s.day = b.day),
          pairs AS (
            SELECT a.day AS day_a, b.day AS day_b,
              ((b.n::HUGEINT - a.n) * 1000000 // (b.day - a.day))
                ::BIGINT AS slope_ppm
            FROM dense a JOIN dense b ON b.day > a.day),
          r AS (
            SELECT slope_ppm, row_number() OVER (
              ORDER BY slope_ppm, day_a, day_b) AS rn
            FROM pairs),
          t AS (SELECT count(*)::BIGINT AS n_pairs FROM pairs),
          nd AS (SELECT count(*)::BIGINT AS n_days FROM dense)
          SELECT n_days, n_pairs, slope_ppm AS med_slope_ppm
          FROM r, t, nd WHERE rn = (n_pairs + 1) // 2""",
    // q306: q298's replay stratified by season = day % 7 — per-stratum
    // pairwise signs and tie-corrected variances, summed exactly; same
    // one-double z
    "q306_seasonal_mann_kendall" ->
      s"""WITH byday AS (
            SELECT (epoch_ns(ts) // 1000) // $dayUs2 AS day,
              count(*)::BIGINT AS n
            FROM events WHERE ts IS NOT NULL GROUP BY 1),
          dense AS (
            -- ((d%7)+7)%7, not d%7: DuckDB's % keeps the dividend's
            -- sign, Spark's pmod is non-negative — pre-1970 days
            -- (negative epoch-day) would otherwise land in different
            -- strata (r14 ADVICE; latent, the corpus is post-epoch)
            SELECT s.day, ((s.day % 7) + 7) % 7 AS season,
              coalesce(b.n, 0)::BIGINT AS n
            FROM (SELECT unnest(generate_series(
                    (SELECT min(day) FROM byday),
                    (SELECT max(day) FROM byday))) AS day) s
            LEFT JOIN byday b ON s.day = b.day),
          s AS (
            SELECT coalesce(sum(sign(b.n - a.n))::BIGINT, 0) AS s_total
            FROM dense a JOIN dense b
              ON b.season = a.season AND b.day > a.day),
          vg AS (
            SELECT season,
              coalesce(sum(t * (t - 1) * (2 * t + 5)), 0)::BIGINT AS tie_g,
              sum(t)::BIGINT AS ng
            FROM (SELECT season, n, count(*)::BIGINT AS t
                  FROM dense GROUP BY 1, 2)
            GROUP BY 1),
          v AS (
            SELECT coalesce(sum(ng * (ng - 1) * (2 * ng + 5) - tie_g), 0)
              ::BIGINT AS var_num18
            FROM vg),
          nd AS (SELECT count(*)::BIGINT AS n_days FROM dense)
          SELECT n_days, s_total, var_num18,
            CASE WHEN var_num18 <= 0 OR s_total = 0 THEN 0.0
              ELSE round((s_total - sign(s_total))::DOUBLE
                / sqrt(var_num18::DOUBLE / 18.0), 6)
            END AS smk_z
          FROM nd, s, v""",
    // q303: q301's spine/pairs/rank order + q298's exact variance;
    // the identical double chain (one cast per exact integer, same
    // z literal, same round-half-away rank convention) in DuckDB
    "q303_sens_slope_ci" ->
      s"""WITH byday AS (
            SELECT (epoch_ns(ts) // 1000) // $dayUs2 AS day,
              count(*)::BIGINT AS n
            FROM events WHERE ts IS NOT NULL GROUP BY 1),
          dense AS (
            SELECT s.day, coalesce(b.n, 0)::BIGINT AS n
            FROM (SELECT unnest(generate_series(
                    (SELECT min(day) FROM byday),
                    (SELECT max(day) FROM byday))) AS day) s
            LEFT JOIN byday b ON s.day = b.day),
          pairs AS (
            SELECT a.day AS day_a, b.day AS day_b,
              ((b.n::HUGEINT - a.n) * 1000000 // (b.day - a.day))
                ::BIGINT AS slope_ppm
            FROM dense a JOIN dense b ON b.day > a.day),
          r AS (
            SELECT slope_ppm, row_number() OVER (
              ORDER BY slope_ppm, day_a, day_b) AS rn
            FROM pairs),
          t AS (SELECT count(*)::BIGINT AS n_pairs FROM pairs),
          nd AS (SELECT count(*)::BIGINT AS n_days FROM dense),
          ties AS (
            SELECT coalesce(sum(t * (t - 1) * (2 * t + 5)), 0)::BIGINT
              AS tie_term
            FROM (SELECT count(*)::BIGINT AS t FROM dense GROUP BY n)),
          v AS (
            SELECT n_days, n_pairs,
              n_days * (n_days - 1) * (2 * n_days + 5) - tie_term
                AS var_num18
            FROM nd, t, ties),
          s AS (
            SELECT *, ${sensCiZ}::DOUBLE
                * sqrt(var_num18::DOUBLE / 18.0) AS c_alpha
            FROM v),
          rk AS (
            SELECT n_days, n_pairs, var_num18,
              greatest(1, least(n_pairs,
                round((n_pairs::DOUBLE - c_alpha) / 2.0, 0)::BIGINT))
                AS lo_rank,
              (n_pairs + 1) // 2 AS med_rank,
              least(n_pairs, greatest(1,
                round((n_pairs::DOUBLE + c_alpha) / 2.0, 0)::BIGINT + 1))
                AS hi_rank
            FROM s)
          SELECT n_days, n_pairs, var_num18, lo_rank, hi_rank,
            max(CASE WHEN rn = lo_rank THEN slope_ppm END)::BIGINT
              AS lo_slope_ppm,
            max(CASE WHEN rn = med_rank THEN slope_ppm END)::BIGINT
              AS med_slope_ppm,
            max(CASE WHEN rn = hi_rank THEN slope_ppm END)::BIGINT
              AS hi_slope_ppm
          FROM r, rk GROUP BY 1, 2, 3, 4, 5""",
    // q272: same µs div/mod bucketing, same cell-grain day-range
    // windows, same truncating ppm divisions, same zero-day min rule
    "q272_hour_seasonality" ->
      s"""WITH cells AS (
            SELECT (epoch_ns(ts) // 1000) // $dayUs2 AS day,
              ((epoch_ns(ts) // 1000) % $dayUs2) // $hourUs AS hour,
              count(*)::BIGINT AS c
            FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
          w AS (
            SELECT *, max(day) OVER () - min(day) OVER () + 1 AS n_days,
              sum(c) OVER () AS total
            FROM cells),
          h AS (
            SELECT hour, sum(c)::BIGINT AS n_events,
              count(*)::BIGINT AS days_active,
              max(n_days)::BIGINT AS n_days, max(total)::BIGINT AS total,
              max(c)::BIGINT AS max_day_events, min(c)::BIGINT AS min_obs
            FROM w GROUP BY 1)
          SELECT hour, n_events, days_active, n_days,
            (n_events::HUGEINT * 1000000 // n_days)::BIGINT AS mean_ppm,
            (n_events::HUGEINT * 1000000 // total)::BIGINT AS share_ppm,
            max_day_events,
            (CASE WHEN days_active < n_days THEN 0
                  ELSE min_obs END)::BIGINT AS min_day_events,
            (max_day_events::HUGEINT * 1000000
              - n_events::HUGEINT * 1000000 // n_days)::BIGINT
              AS peak_over_mean_ppm
          FROM h ORDER BY hour""",
    // q207: same distinct-day islands, same row_number grouping key,
    // same single-BIGINT (len DESC, start ASC) argmax encoding — every
    // column is BIGINT, nothing to drift
    "q207_activity_streaks" ->
      s"""WITH d AS (
            SELECT DISTINCT user_id,
              (epoch_ns(ts) // 1000) // $dayUs2 AS day
            FROM events WHERE ts IS NOT NULL),
          r AS (
            SELECT user_id, day,
              day - row_number() OVER (PARTITION BY user_id ORDER BY day)
                AS grp
            FROM d),
          s AS (
            SELECT user_id, grp, count(*)::BIGINT AS len,
              min(day) AS start_day
            FROM r GROUP BY 1, 2)
          SELECT user_id, sum(len)::BIGINT AS n_active_days,
            count(*)::BIGINT AS n_streaks,
            max(len)::BIGINT AS max_streak_days,
            arg_max(start_day, len * $streakKeyScale - start_day)
              AS top_streak_start
          FROM s GROUP BY 1 ORDER BY 1""",
    // q208: same sparse slice, same floor-milli sums, same generated
    // spine, same ignore-nulls neighbor windows and the same one
    // truncating integer division — interpolated values compare as
    // exact BIGINTs
    "q208_gap_fill_interpolate" ->
      s"""WITH sub AS (
            SELECT event_type,
              (epoch_ns(ts) // 1000) // $dayUs2 AS day,
              CAST(floor(value * CAST(1000.0 AS DOUBLE)) AS BIGINT) AS vm
            FROM events
            WHERE ts IS NOT NULL AND value IS NOT NULL
              AND event_id % $gapFillMod = 0),
          bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM sub),
          spine AS (
            SELECT t.event_type, s.day
            FROM (SELECT DISTINCT event_type FROM sub) t
            CROSS JOIN (SELECT unnest(generate_series(
              (SELECT d0 FROM bounds), (SELECT d1 FROM bounds))) AS day) s),
          daily AS (
            SELECT event_type, day, sum(vm)::BIGINT AS m
            FROM sub GROUP BY 1, 2),
          panel AS (
            SELECT spine.event_type, spine.day, daily.m
            FROM spine LEFT JOIN daily USING (event_type, day)),
          w AS (
            SELECT event_type, day, m,
              last_value(CASE WHEN m IS NOT NULL THEN m END IGNORE NULLS)
                OVER (PARTITION BY event_type ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS pm,
              last_value(CASE WHEN m IS NOT NULL THEN day END IGNORE NULLS)
                OVER (PARTITION BY event_type ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS pd,
              first_value(CASE WHEN m IS NOT NULL THEN m END IGNORE NULLS)
                OVER (PARTITION BY event_type ORDER BY day
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                AS nm,
              first_value(CASE WHEN m IS NOT NULL THEN day END IGNORE NULLS)
                OVER (PARTITION BY event_type ORDER BY day
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                AS nd
            FROM panel)
          SELECT event_type, day,
            CASE WHEN m IS NOT NULL THEN m
                 WHEN pm IS NOT NULL AND nm IS NOT NULL THEN
                   pm + (nm - pm) * (day - pd) // (nd - pd)
                 ELSE 0 END AS m_filled,
            CASE WHEN m IS NOT NULL THEN 'obs'
                 WHEN pm IS NOT NULL AND nm IS NOT NULL THEN 'interp'
                 ELSE 'edge' END AS src
          FROM w ORDER BY 1, 2""",
    // q211: same first-seen identity — cumulative distinct as the
    // running sum of first-day counts, all BIGINT
    "q211_user_growth" ->
      s"""WITH d AS (
            SELECT DISTINCT user_id,
              (epoch_ns(ts) // 1000) // $dayUs2 AS day
            FROM events WHERE ts IS NOT NULL),
          f AS (
            SELECT user_id, min(day) AS first_day FROM d GROUP BY 1),
          pd AS (
            SELECT d.day, count(*)::BIGINT AS n_active_users,
              count(*) FILTER (WHERE d.day = f.first_day)::BIGINT
                AS n_new_users
            FROM d JOIN f USING (user_id) GROUP BY 1)
          SELECT day, n_active_users, n_new_users,
            (sum(n_new_users) OVER (ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
              AS n_cum_users
          FROM pd ORDER BY day""",
    // q216: same spine, same N/T scaling, same prefix-sum/prefix-min
    // closed form of the CUSUM recurrence — all BIGINT
    "q216_cusum_changepoints" ->
      s"""WITH d AS (
            SELECT event_type, (epoch_ns(ts) // 1000) // $dayUs2 AS day
            FROM events WHERE ts IS NOT NULL),
          bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
          spine AS (
            SELECT t.event_type, s.day
            FROM (SELECT DISTINCT event_type FROM d) t
            CROSS JOIN (SELECT unnest(generate_series(
              (SELECT d0 FROM bounds), (SELECT d1 FROM bounds))) AS day) s),
          daily AS (
            SELECT event_type, day, count(*) AS n FROM d GROUP BY 1, 2),
          panel AS (
            SELECT spine.event_type, spine.day,
              coalesce(daily.n, 0)::BIGINT AS n_events
            FROM spine LEFT JOIN daily USING (event_type, day)),
          scaled AS (
            SELECT event_type, day, n_events,
              count(*) OVER (PARTITION BY event_type) AS n_days,
              sum(n_events) OVER (PARTITION BY event_type) AS total
            FROM panel),
          c AS (
            SELECT event_type, day, n_events, total,
              sum(n_days * n_events - total - (total // 10))
                OVER (PARTITION BY event_type ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS cum
            FROM scaled)
          SELECT event_type, day, n_events,
            (cum - least(0, min(cum) OVER (PARTITION BY event_type
               ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)))::BIGINT
              AS cusum_scaled,
            (cum - least(0, min(cum) OVER (PARTITION BY event_type
               ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)))
              > 3 * total AS is_alarm
          FROM c ORDER BY 1, 2""",
    // q214: same (tsu, event_id) tick order, same milli floors; DuckDB
    // picks open/close with the identical rank rule
    "q214_ohlc_bars" ->
      s"""WITH t AS (
            SELECT event_type,
              (epoch_ns(ts) // 1000) // ${hourUs} AS hr,
              epoch_ns(ts) // 1000 AS tsu, event_id,
              CAST(floor(value * CAST(1000.0 AS DOUBLE)) AS BIGINT) AS vm
            FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
          r AS (
            SELECT event_type, hr, vm,
              row_number() OVER (PARTITION BY event_type, hr
                ORDER BY tsu, event_id) AS ra,
              count(*) OVER (PARTITION BY event_type, hr) AS nb
            FROM t)
          SELECT event_type, hr, count(*)::BIGINT AS n_ticks,
            max(CASE WHEN ra = 1 THEN vm END) AS open_milli,
            max(vm) AS high_milli, min(vm) AS low_milli,
            max(CASE WHEN ra = nb THEN vm END) AS close_milli
          FROM r GROUP BY 1, 2 ORDER BY 1, 2""",
    // q201: same sufficient statistics in HUGEINT, same truncating
    // division (DuckDB // == Spark div toward zero, verified on
    // negatives)
    // q237: same exact HUGEINT centered moments, then the identical
    // DOUBLE Cramer expression tree (both engines correctly-round the
    // same exact integers to binary64, so the solve is bit-equal)
    "q237_ols_two_factor" ->
      """WITH o AS (
           SELECT c_mktsegment AS segment,
             (epoch_ns(o_orderdate) // 1000) // 86400000000 AS x1,
             CAST(floor(c_acctbal * CAST(100.0 AS DOUBLE)) AS BIGINT) AS x2,
             CAST(floor(o_totalprice * CAST(100.0 AS DOUBLE)) AS BIGINT)
               AS y
           FROM orders JOIN customer ON o_custkey = c_custkey),
         a AS (
           SELECT segment, count(*)::HUGEINT AS n,
             sum(x1::HUGEINT) AS s1, sum(x2::HUGEINT) AS s2,
             sum(y::HUGEINT) AS sy,
             sum(x1::HUGEINT * x1) AS s11, sum(x1::HUGEINT * x2) AS s12,
             sum(x2::HUGEINT * x2) AS s22,
             sum(x1::HUGEINT * y) AS s1y, sum(x2::HUGEINT * y) AS s2y
           FROM o GROUP BY 1),
         c AS (
           SELECT segment, n::BIGINT AS n_orders,
             (n * s11 - s1 * s1)::DOUBLE AS c11,
             (n * s12 - s1 * s2)::DOUBLE AS c12,
             (n * s22 - s2 * s2)::DOUBLE AS c22,
             (n * s1y - s1 * sy)::DOUBLE AS c1y,
             (n * s2y - s2 * sy)::DOUBLE AS c2y,
             s1::DOUBLE AS d1, s2::DOUBLE AS d2, sy::DOUBLE AS dy,
             n::DOUBLE AS dn
           FROM a),
         d AS (SELECT *, c11 * c22 - c12 * c12 AS det FROM c)
         SELECT segment, n_orders,
           round((c22 * c1y - c12 * c2y) / nullif(det, 0.0), 6) AS beta_day,
           round((c11 * c2y - c12 * c1y) / nullif(det, 0.0), 6) AS beta_bal,
           round((dy - ((c22 * c1y - c12 * c2y) / nullif(det, 0.0)) * d1
                     - ((c11 * c2y - c12 * c1y) / nullif(det, 0.0)) * d2)
             / dn, 6) AS intercept
         FROM d ORDER BY segment""",
    "q201_trend_slopes" ->
      """WITH o AS (
           SELECT c_mktsegment AS segment,
             (epoch_ns(o_orderdate) // 1000) // 86400000000 AS x,
             CAST(floor(o_totalprice * CAST(100.0 AS DOUBLE)) AS BIGINT)
               AS y
           FROM orders JOIN customer ON o_custkey = c_custkey),
         a AS (
           SELECT segment, count(*)::HUGEINT AS n,
             sum(x::HUGEINT) AS sx, sum(y::HUGEINT) AS sy,
             sum(x::HUGEINT * y) AS sxy, sum(x::HUGEINT * x) AS sxx
           FROM o GROUP BY 1)
         SELECT segment, n::BIGINT AS n_orders,
           ((n * sxy - sx * sy) * 1000
            // nullif(n * sxx - sx * sx, 0))::BIGINT AS slope_milli
         FROM a ORDER BY segment""",
    // q190: same lead-hold weighting, HUGEINT products, one truncating
    // division — the TWAP must match to the milli-unit
    "q190_twap" ->
      """WITH ev AS (
           SELECT user_id, event_id, epoch_ns(ts) // 1000 AS tsu,
             CAST(floor(value * CAST(1000.0 AS DOUBLE)) AS BIGINT) AS vm
           FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
         h AS (
           SELECT user_id, vm,
             lead(tsu) OVER (PARTITION BY user_id
               ORDER BY tsu, event_id) - tsu AS dt
           FROM ev)
         SELECT user_id, count(*) AS n_holds,
           sum(dt)::BIGINT AS span_us,
           (sum(vm::HUGEINT * dt) // sum(dt))::BIGINT AS twap_milli
         FROM h WHERE dt IS NOT NULL
         GROUP BY 1 HAVING sum(dt) > 0 ORDER BY 1""",
    // q192: same bounds, same generated spine (DuckDB generate_series
    // is inclusive like Spark sequence), same zero-fill
    "q192_calendar_spine" ->
      s"""WITH d AS (
            SELECT event_type, epoch_ns(ts) // 1000 // ${dayUs2} AS day
            FROM events WHERE ts IS NOT NULL),
          bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
          spine AS (
            SELECT t.event_type, s.day
            FROM (SELECT DISTINCT event_type FROM d) t
            CROSS JOIN (SELECT unnest(generate_series(
              (SELECT d0 FROM bounds), (SELECT d1 FROM bounds))) AS day) s),
          daily AS (
            SELECT event_type, day, count(*) AS n FROM d GROUP BY 1, 2)
          SELECT spine.event_type, spine.day,
            coalesce(daily.n, 0)::BIGINT AS n_events
          FROM spine LEFT JOIN daily USING (event_type, day)
          ORDER BY 1, 2""",
    // q185: the identical 8-term weighted sum over lag windows, same
    // milli-unit floor, same single truncating division
    "q185_ewma_smoothing" -> {
      val lagCols = (1 until ewmaDepth)
        .map(k => s"lag(vm, $k) OVER w AS vm_$k").mkString(", ")
      val num = (0 until ewmaDepth).map { k =>
        val wgt = 1L << (ewmaDepth - 1 - k)
        val v = if (k == 0) "vm" else s"vm_$k"
        s"coalesce($v * $wgt, 0)"
      }.mkString(" + ")
      val den = (0 until ewmaDepth).map { k =>
        val wgt = 1L << (ewmaDepth - 1 - k)
        val v = if (k == 0) "vm" else s"vm_$k"
        s"CASE WHEN $v IS NOT NULL THEN $wgt ELSE 0 END"
      }.mkString(" + ")
      s"""WITH ev AS (
           SELECT user_id, event_id, epoch_ns(ts) // 1000 AS tsu,
             CAST(floor(value * CAST(1000.0 AS DOUBLE)) AS BIGINT) AS vm
           FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
         l AS (
           SELECT user_id, event_id, vm, row_number() OVER w AS rn,
             $lagCols
           FROM ev
           WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id))
         SELECT user_id, event_id, vm,
           ($num) // ($den) AS ewma_milli
         FROM l WHERE rn % $ewmaStride = 0 ORDER BY user_id, event_id"""
    },
    // q163: same per-user min-delay collapse, same cume-selection rule
    // as q102 — percentiles are stored delay values, no interpolation
    "q163_conversion_latency" ->
      """WITH ev AS (
           SELECT user_id, event_type, epoch_ns(ts) // 1000 AS tsu
           FROM events WHERE ts IS NOT NULL),
         s AS (
           SELECT user_id, min(tsu) AS signup_tsu FROM ev
           WHERE event_type = 'signup' GROUP BY 1),
         d AS (
           SELECT e.user_id, min(e.tsu - s.signup_tsu) AS delay_us
           FROM ev e JOIN s USING (user_id)
           WHERE e.event_type = 'purchase' AND e.tsu >= s.signup_tsu
           GROUP BY 1),
         j AS (
           SELECT c_mktsegment, delay_us
           FROM d JOIN customer ON d.user_id = c_custkey),
         g AS (
           SELECT c_mktsegment, delay_us, count(*) AS c FROM j GROUP BY 1, 2),
         cum AS (
           SELECT c_mktsegment, delay_us,
             sum(c) OVER (PARTITION BY c_mktsegment ORDER BY delay_us) AS cum,
             sum(c) OVER (PARTITION BY c_mktsegment) AS n
           FROM g)
         SELECT c_mktsegment,
           min(delay_us) FILTER (WHERE cum::DOUBLE / n::DOUBLE >= 0.5::DOUBLE)
             AS p50_us,
           min(delay_us) FILTER (WHERE cum::DOUBLE / n::DOUBLE >= 0.9::DOUBLE)
             AS p90_us,
           min(delay_us) FILTER (WHERE cum::DOUBLE / n::DOUBLE >= 0.99::DOUBLE)
             AS p99_us,
           max(n)::BIGINT AS n_converted
         FROM cum GROUP BY 1 ORDER BY 1""",
    // q159: arm re-derived from the same md5 nibble, funnel gate and
    // ppm arithmetic re-formulated with FILTER aggregates — integer
    // division end to end, nulls (not errors) on degenerate arms
    // q224: same per-user arrival high-water mark, same shared cume
    // selection rule, same truncating ppm division
    "q224_lateness_audit" ->
      s"""WITH ev AS (
           SELECT user_id, event_id, event_type,
             epoch_ns(ts) // 1000 AS tsu,
             CASE WHEN event_id % $lateMod = 0
               THEN event_id + $lateSlots ELSE event_id END AS arrival
           FROM events WHERE ts IS NOT NULL),
         l AS (
           SELECT event_type,
             greatest(coalesce(max(tsu) OVER (PARTITION BY user_id
               ORDER BY arrival, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - tsu,
               0), 0) AS v
           FROM ev),
         c AS (SELECT event_type, v, count(*) AS c FROM l GROUP BY 1, 2),
         k AS (
           SELECT event_type, v, c,
             sum(c) OVER (PARTITION BY event_type ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(c) OVER (PARTITION BY event_type) AS n
           FROM c)
         SELECT event_type,
           min(v) FILTER (WHERE cum::DOUBLE / n::DOUBLE >= 0.5::DOUBLE)
             AS p50_lateness_us,
           min(v) FILTER (WHERE cum::DOUBLE / n::DOUBLE >= 0.99::DOUBLE)
             AS p99_lateness_us,
           max(n)::BIGINT AS n_events,
           sum(CASE WHEN v > 0 THEN c ELSE 0 END)::BIGINT AS n_late,
           max(v) AS max_lateness_us,
           (sum(CASE WHEN v > 0 THEN c ELSE 0 END) * 1000000
            // max(n))::BIGINT AS late_ppm
         FROM k GROUP BY 1 ORDER BY 1""",
    // q223: same per-user pre/post spends, same pooled sufficient
    // statistics, same θ and the same explicit truncation order — the
    // adjusted means compare as exact BIGINTs
    "q223_cuped_readout" ->
      """WITH ev AS (
           SELECT user_id, epoch_ns(ts) // 1000 AS tsu, event_type, value
           FROM events WHERE ts IS NOT NULL),
         p AS (SELECT (min(tsu) + max(tsu)) // 2 AS cut FROM ev),
         u AS (
           SELECT user_id,
             coalesce(sum(CASE WHEN tsu < (SELECT cut FROM p)
                 AND event_type = 'purchase'
               THEN CAST(floor(value * CAST(1000.0 AS DOUBLE)) AS BIGINT)
               END), 0) AS x,
             coalesce(sum(CASE WHEN tsu >= (SELECT cut FROM p)
                 AND event_type = 'purchase'
               THEN CAST(floor(value * CAST(1000.0 AS DOUBLE)) AS BIGINT)
               END), 0) AS y
           FROM ev GROUP BY 1),
         a AS (
           SELECT x, y,
             strpos('0123456789abcdef',
               substr(md5(user_id::VARCHAR || ':arm'), 1, 1)) - 1 >= 8
               AS is_t
           FROM u),
         m AS (
           SELECT count(*)::HUGEINT AS n, sum(x::HUGEINT) AS sx,
             sum(y::HUGEINT) AS sy, sum(x::HUGEINT * y) AS sxy,
             sum(x::HUGEINT * x) AS sxx,
             (count(*) FILTER (WHERE NOT is_t))::HUGEINT AS n_c,
             sum(x::HUGEINT) FILTER (WHERE NOT is_t) AS sx_c,
             sum(y::HUGEINT) FILTER (WHERE NOT is_t) AS sy_c,
             (count(*) FILTER (WHERE is_t))::HUGEINT AS n_t,
             sum(x::HUGEINT) FILTER (WHERE is_t) AS sx_t,
             sum(y::HUGEINT) FILTER (WHERE is_t) AS sy_t
           FROM a),
         t AS (
           SELECT *,
             coalesce((n * sxy - sx * sy) * 1000000
               // nullif(n * sxx - sx * sx, 0), 0) AS theta_ppm,
             sx // n AS mxa,
             sy_c // nullif(n_c, 0) AS myc,
             sy_t // nullif(n_t, 0) AS myt
           FROM m)
         SELECT n_c::BIGINT AS n_control, n_t::BIGINT AS n_treatment,
           theta_ppm::BIGINT AS theta_ppm,
           myc::BIGINT AS mean_y_control_milli,
           myt::BIGINT AS mean_y_treatment_milli,
           (myc - (theta_ppm * (sx_c // nullif(n_c, 0) - mxa))
             // 1000000)::BIGINT AS adj_y_control_milli,
           (myt - (theta_ppm * (sx_t // nullif(n_t, 0) - mxa))
             // 1000000)::BIGINT AS adj_y_treatment_milli,
           ((myt - (theta_ppm * (sx_t // nullif(n_t, 0) - mxa)) // 1000000)
            - (myc - (theta_ppm * (sx_c // nullif(n_c, 0) - mxa))
               // 1000000))::BIGINT AS adj_diff_milli
         FROM t""",
    // q222: q159's arm counts verbatim, then the identical z² identity
    // in HUGEINT — the significance boolean is the same cross-
    // multiplied integer comparison, never an IEEE ratio
    "q222_ab_significance" ->
      """WITH ev AS (
           SELECT user_id, event_type, epoch_ns(ts) // 1000 AS tsu
           FROM events WHERE ts IS NOT NULL),
         s AS (
           SELECT user_id, min(tsu) AS signup_tsu FROM ev
           WHERE event_type = 'signup' GROUP BY 1),
         c AS (
           SELECT DISTINCT e.user_id FROM ev e JOIN s USING (user_id)
           WHERE e.event_type = 'purchase' AND e.tsu >= s.signup_tsu),
         a AS (
           SELECT s.user_id,
             CASE WHEN strpos('0123456789abcdef',
                 substr(md5(s.user_id::VARCHAR || ':arm'), 1, 1)) - 1 < 8
               THEN 'control' ELSE 'treatment' END AS arm,
             (c.user_id IS NOT NULL) AS converted
           FROM s LEFT JOIN c ON s.user_id = c.user_id),
         m AS (
           SELECT
             (count(*) FILTER (WHERE arm = 'control'))::BIGINT AS n1,
             (count(*) FILTER (WHERE arm = 'control' AND converted))::BIGINT
               AS c1,
             (count(*) FILTER (WHERE arm = 'treatment'))::BIGINT AS n2,
             (count(*) FILTER (WHERE arm = 'treatment' AND converted))::BIGINT
               AS c2
           FROM a),
         z AS (
           SELECT n1, c1, n2, c2,
             (c1::HUGEINT * n2 - c2::HUGEINT * n1) AS d,
             (n1::HUGEINT * n2 * (c1 + c2) * (n1 + n2 - c1 - c2)) AS den
           FROM m)
         SELECT n1, c1, n2, c2,
           coalesce((d * 1000000 // nullif(n1::HUGEINT * n2, 0))::BIGINT,
             0) AS diff_ppm,
           coalesce((1000 * (n1 + n2)::HUGEINT * d * d
             // nullif(den, 0))::BIGINT, 0) AS z2_milli,
           coalesce(10000 * (n1 + n2)::HUGEINT * d * d > 38415 * den,
             false) AS significant_95
         FROM z""",
    "q159_ab_experiment" ->
      """WITH ev AS (
           SELECT user_id, event_type, epoch_ns(ts) // 1000 AS tsu
           FROM events WHERE ts IS NOT NULL),
         s AS (
           SELECT user_id, min(tsu) AS signup_tsu FROM ev
           WHERE event_type = 'signup' GROUP BY 1),
         c AS (
           SELECT DISTINCT e.user_id FROM ev e JOIN s USING (user_id)
           WHERE e.event_type = 'purchase' AND e.tsu >= s.signup_tsu),
         a AS (
           SELECT s.user_id,
             CASE WHEN strpos('0123456789abcdef',
                 substr(md5(s.user_id::VARCHAR || ':arm'), 1, 1)) - 1 < 8
               THEN 'control' ELSE 'treatment' END AS arm,
             (c.user_id IS NOT NULL) AS converted
           FROM s LEFT JOIN c ON s.user_id = c.user_id),
         m AS (
           SELECT
             (count(*) FILTER (WHERE arm = 'control'))::BIGINT
               AS n_signup_control,
             (count(*) FILTER (WHERE arm = 'control' AND converted))::BIGINT
               AS n_conv_control,
             (count(*) FILTER (WHERE arm = 'treatment'))::BIGINT
               AS n_signup_treatment,
             (count(*) FILTER (WHERE arm = 'treatment' AND converted))::BIGINT
               AS n_conv_treatment
           FROM a)
         SELECT n_signup_control, n_conv_control, n_signup_treatment,
           n_conv_treatment,
           (n_conv_control * 1000000) // nullif(n_signup_control, 0)
             AS conv_control_ppm,
           (n_conv_treatment * 1000000) // nullif(n_signup_treatment, 0)
             AS conv_treatment_ppm,
           ((n_conv_treatment::HUGEINT * n_signup_control * 1000000)
             // nullif(n_conv_control::HUGEINT * n_signup_treatment, 0)
            )::BIGINT AS lift_ppm
         FROM m""",
    // q145: RANGE frame over integer hours; the spike test stays in
    // BIGINT (cross-multiplied, never divided)
    "q145_hourly_anomaly" ->
      s"""WITH hourly AS (
            SELECT epoch_ns(ts) // 1000 // ${hourUs} AS hour,
              count(*) AS n
            FROM events WHERE ts IS NOT NULL GROUP BY 1),
          w AS (
            SELECT hour, n,
              count(*) OVER tr AS prev_hours,
              coalesce(sum(n) OVER tr, 0)::BIGINT AS prev_sum
            FROM hourly
            WINDOW tr AS (ORDER BY hour
              RANGE BETWEEN $anomalyLookbackH PRECEDING AND 1 PRECEDING))
          SELECT hour, n, prev_hours, prev_sum,
            prev_hours > 0 AND n * prev_hours > $anomalyFactor * prev_sum
              AS is_spike
          FROM w ORDER BY hour""",
    // q120: identical integer epoch arithmetic — no calendar function,
    // no timezone, no convention to disagree on
    "q120_activity_heatmap" ->
      """SELECT ((epoch_ns(ts) // 1000 // 86400000000) + 3) % 7 AS dow,
           (epoch_ns(ts) // 1000 % 86400000000) // 3600000000 AS hour,
           count(*) AS n_events,
           count(DISTINCT user_id)::BIGINT AS n_users
         FROM events WHERE ts IS NOT NULL
         GROUP BY 1, 2 ORDER BY 1, 2""",
    // q117: inclusion-exclusion Jaccard — exact BIGINTs, one float
    // division of exact integers
    "q117_type_coengagement" ->
      """WITH ut AS (
           SELECT DISTINCT user_id, event_type FROM events
           WHERE user_id IS NOT NULL),
         s AS (SELECT event_type, count(*)::BIGINT AS n FROM ut GROUP BY 1),
         p AS (
           SELECT a.event_type AS type_a, b.event_type AS type_b,
                  count(*)::BIGINT AS n_common
           FROM ut a JOIN ut b ON a.user_id = b.user_id
             AND a.event_type < b.event_type
           GROUP BY 1, 2)
         SELECT type_a, type_b, sa.n AS n_a, sb.n AS n_b, n_common,
           round(n_common::DOUBLE
             / (sa.n + sb.n - n_common)::DOUBLE, 6) AS jaccard
         FROM p
         JOIN s sa ON type_a = sa.event_type
         JOIN s sb ON type_b = sb.event_type
         ORDER BY jaccard DESC, type_a, type_b""",
    // q289: one conditional-min aggregate, same µs arithmetic, same
    // null-skipping least/greatest (both engines skip NULLs there),
    // completion gated on all stages present
    "q289_anyorder_funnel" ->
      s"""WITH ev AS (
           SELECT user_id, epoch_ns(ts) // 1000 AS tsu, event_type
           FROM events WHERE ts IS NOT NULL
             AND event_type IN ('signup', 'click', 'purchase')),
         m AS (
           SELECT user_id,
             min(tsu) FILTER (WHERE event_type = 'signup') AS s_tsu,
             min(tsu) FILTER (WHERE event_type = 'click') AS c_tsu,
             min(tsu) FILTER (WHERE event_type = 'purchase') AS p_tsu
           FROM ev GROUP BY 1),
         x AS (
           SELECT user_id, s_tsu, c_tsu, p_tsu,
             ((s_tsu IS NOT NULL)::INT + (c_tsu IS NOT NULL)::INT
               + (p_tsu IS NOT NULL)::INT)::BIGINT AS stages_hit,
             least(s_tsu, c_tsu, p_tsu) AS first_touch_tsu,
             greatest(s_tsu, c_tsu, p_tsu) AS last_first_tsu
           FROM m)
         SELECT user_id,
           COALESCE(s_tsu, 0) AS signup_tsu,
           COALESCE(c_tsu, 0) AS click_tsu,
           COALESCE(p_tsu, 0) AS purchase_tsu,
           stages_hit, first_touch_tsu,
           (stages_hit = 3 AND
            last_first_tsu <= first_touch_tsu + $funnelWindowUs)
             AS completed
         FROM x ORDER BY user_id""",
    // q278: q76's chain with the per-step deadline on each join —
    // same first-touch greedy anchors, same µs arithmetic
    "q278_windowed_funnel" ->
      s"""WITH ev AS (
           SELECT user_id, epoch_ns(ts) // 1000 AS tsu, event_type
           FROM events WHERE ts IS NOT NULL),
         s AS (
           SELECT user_id, min(tsu) AS signup_tsu
           FROM ev WHERE event_type = 'signup' GROUP BY 1),
         c AS (
           SELECT e.user_id, min(e.tsu) AS click_tsu
           FROM ev e JOIN s ON e.user_id = s.user_id
             AND e.tsu >= s.signup_tsu
             AND e.tsu <= s.signup_tsu + $funnelWindowUs
           WHERE e.event_type = 'click' GROUP BY 1),
         p AS (
           SELECT e.user_id, min(e.tsu) AS purchase_tsu
           FROM ev e JOIN c ON e.user_id = c.user_id
             AND e.tsu >= c.click_tsu
             AND e.tsu <= c.click_tsu + $funnelWindowUs
           WHERE e.event_type = 'purchase' GROUP BY 1)
         SELECT s.user_id, s.signup_tsu,
           COALESCE(c.click_tsu, 0) AS click_tsu,
           COALESCE(p.purchase_tsu, 0) AS purchase_tsu,
           (1 + CASE WHEN c.click_tsu IS NULL THEN 0 ELSE 1 END
              + CASE WHEN p.purchase_tsu IS NULL THEN 0 ELSE 1 END)::BIGINT
             AS stage
         FROM s
         LEFT JOIN c ON s.user_id = c.user_id
         LEFT JOIN p ON s.user_id = p.user_id
         ORDER BY s.user_id""",
    "q76_funnel" ->
      """WITH ev AS (
           SELECT user_id, epoch_ns(ts) // 1000 AS tsu, event_type
           FROM events WHERE ts IS NOT NULL),
         s AS (
           SELECT user_id, min(tsu) AS signup_tsu
           FROM ev WHERE event_type = 'signup' GROUP BY 1),
         c AS (
           SELECT e.user_id, min(e.tsu) AS click_tsu
           FROM ev e JOIN s ON e.user_id = s.user_id
             AND e.tsu >= s.signup_tsu
           WHERE e.event_type = 'click' GROUP BY 1),
         p AS (
           SELECT e.user_id, min(e.tsu) AS purchase_tsu
           FROM ev e JOIN c ON e.user_id = c.user_id
             AND e.tsu >= c.click_tsu
           WHERE e.event_type = 'purchase' GROUP BY 1)
         SELECT s.user_id, s.signup_tsu, c.click_tsu, p.purchase_tsu,
           (1 + CASE WHEN c.click_tsu IS NULL THEN 0 ELSE 1 END
              + CASE WHEN p.purchase_tsu IS NULL THEN 0 ELSE 1 END)::BIGINT
             AS stage
         FROM s
         LEFT JOIN c ON s.user_id = c.user_id
         LEFT JOIN p ON s.user_id = p.user_id
         ORDER BY s.user_id""",
    "q108_sliding_active_users" ->
      s"""WITH ev AS (
           SELECT user_id, epoch_ns(ts) // 1000 // $slideUs AS slide
           FROM events WHERE ts IS NOT NULL),
         cov AS (
           SELECT DISTINCT user_id, (slide - k.k) * $slideUs AS window_start_us
           FROM ev CROSS JOIN (VALUES ${(0 until slidesPerWindow)
             .map(i => s"($i)").mkString(", ")}) AS k(k))
         SELECT window_start_us, count(*) AS n_active_users
         FROM cov GROUP BY 1 ORDER BY 1""",
    "q106_event_transitions" ->
      """WITH ev AS (
           SELECT user_id, epoch_ns(ts) // 1000 AS tsu, event_id, event_type
           FROM events WHERE ts IS NOT NULL),
         t AS (
           SELECT event_type,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY tsu, event_id) AS prev_type
           FROM ev),
         c AS (
           SELECT prev_type AS from_type, event_type AS to_type,
                  count(*) AS n_transitions
           FROM t WHERE prev_type IS NOT NULL GROUP BY 1, 2)
         SELECT from_type, to_type, n_transitions,
           round(n_transitions::DOUBLE
             / (sum(n_transitions) OVER (PARTITION BY from_type))::DOUBLE, 6)
             AS p
         FROM c ORDER BY 1, 2""",
    "q77_cohort_retention" ->
      """WITH d AS (
           SELECT DISTINCT user_id,
             epoch_ns(ts) // 1000 // 86400000000 AS day
           FROM events WHERE ts IS NOT NULL),
         ch AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY 1)
         SELECT ch.cohort_day, d.day - ch.cohort_day AS day_offset,
           count(*) AS n_users
         FROM d JOIN ch ON d.user_id = ch.user_id
         GROUP BY 1, 2 ORDER BY 1, 2""")
}
