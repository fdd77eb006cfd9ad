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

  def sessions(spark: SparkSession, dir: String): DataFrame = {
    // ordering AND gap decisions run at µs — the external precision
    // (DuckDB truncates TIMESTAMP(NANOS) to µs on read, so an oracle
    // can never see ns; a gap within 1 µs of exactly `gapSeconds`
    // would otherwise split sessions differently per engine). Intra-µs
    // ties break on event_id, identically both sides.
    val byTime = Window.partitionBy("user_id").orderBy("tsu", "event_id")
    val running = byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.eventsMicros(spark, dir)
      .withColumn("prev_tsu", lag("tsu", 1).over(byTime))
      .withColumn("opens",
        when(col("prev_tsu").isNull || col("tsu") - col("prev_tsu") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum("opens").over(running))
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

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q27_sessionization" -> (sessions(_, _)))

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
          FROM sess GROUP BY 1, 2 ORDER BY 1, 2""")
}
