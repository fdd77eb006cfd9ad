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
    labeled(Tables.eventsMicros(spark, dir))
      .groupBy("user_id", "session_id")
      .agg(
        min("tsu").as("session_start_us"),
        max("tsu").as("session_end_us"),
        count(lit(1)).as("n_events"))
      .withColumn("duration_sec",
        expr("(session_end_us - session_start_us) div 1000000"))
      .select("user_id", "session_id", "session_start_us", "session_end_us",
        "n_events", "duration_sec")
      .orderBy("user_id", "session_id")
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

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q27_sessionization" -> (sessions(_, _)),
    "q116_session_paths" -> (sessionPaths(_, _)))

  val oracles: Map[String, String] = Map(
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
          GROUP BY 1 ORDER BY n_sessions DESC, path LIMIT ${pathTopK}""")
}
