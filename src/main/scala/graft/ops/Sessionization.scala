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
  private val gapNs = gapSeconds * 1000000000L

  def sessions(spark: SparkSession, dir: String): DataFrame = {
    val byTime = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val running = byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .filter(col("ts").isNotNull)
      .withColumn("prev_ts", lag("ts", 1).over(byTime))
      .withColumn("opens",
        when(col("prev_ts").isNull || col("ts") - col("prev_ts") > gapNs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum("opens").over(running))
      .groupBy("user_id", "session_id")
      .agg(
        // µs resolution on the emitted bounds: DuckDB (the oracle)
        // truncates parquet TIMESTAMP(NANOS) to µs on read, and µs is
        // the natural external precision; internal ordering/gap logic
        // above stays ns-exact
        expr("min(ts) div 1000").as("session_start_us"),
        expr("max(ts) div 1000").as("session_end_us"),
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
                     OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER w > ${gapNs}
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
