package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Changelog application — the lakehouse MERGE kernel: a base snapshot
  * (latest state per key as of a cutoff) plus a stream of keyed deltas
  * with upsert/tombstone ops, compacted and applied so the output is
  * the post-merge state table. Not in the reference (its pipelines are
  * append-only); first-class here because every production table a
  * 100 TB engine maintains is fed by exactly this operation (CDC from
  * an OLTP source, GDPR deletes, dimension updates).
  *
  * Physically NOT a sort-merge: both the snapshot and the delta
  * compaction are latest-wins HASH aggregations (`max(struct(seq ...))`
  * — one map-side-combining exchange each, no per-key window sort), and
  * the application is a co-partitioned full-outer join on the same key.
  * All three exchanges hash on user_id, so AQE plans them as one
  * partitioning family; a 10⁹-row changelog against a 10¹⁰-row snapshot
  * is three linear passes. Tombstones drop rows BEFORE the output (the
  * merge is the delete path, not a filter the reader must remember).
  */
object Changelog {

  /** q135 — CDC merge over the events timeline. The cutoff (data-derived
    * midpoint, so every scale factor exercises both sides) splits events
    * into a base snapshot (latest pre-cutoff event per user) and a
    * changelog (post-cutoff events; `error` rows act as tombstones —
    * an error voids the user's state). Output: the merged state table,
    * with `src` recording whether the base row survived untouched or a
    * delta won.
    */
  def cdcMerge(spark: SparkSession, dir: String): DataFrame =
    mergeCore(Tables.eventsMicros(spark, dir))

  private[graft] def mergeCore(ev0: DataFrame): DataFrame = {
    val ev = ev0.select(col("user_id"), col("event_id"), col("event_type"),
      col("value"), col("tsu"))
    // data-derived cutoff; single-row frame, broadcast (the sanctioned
    // tiny-crossJoin pattern — q74/q111)
    val cutoff = ev.agg(expr("(min(tsu) + max(tsu)) div 2").as("cut_us"))
    val tagged = ev.crossJoin(broadcast(cutoff))

    // base snapshot: latest-wins hash-agg, no window sort. (tsu,
    // event_id) is a total order (event_id unique), so the struct max
    // is deterministic and every payload field comes from the SAME row
    // (the round-7 asofCore advice, applied from birth here).
    val base = tagged.filter(col("tsu") < col("cut_us"))
      .groupBy("user_id")
      .agg(max(struct(col("tsu"), col("event_id"), col("event_type"),
        col("value"))).as("last"))
      .select(col("user_id"), col("last.event_type").as("state"),
        col("last.value").as("val"), col("last.tsu").as("updated_us"))

    // changelog compaction: same latest-wins shape; op derived per row
    val lastDelta = tagged.filter(col("tsu") >= col("cut_us"))
      .select(col("user_id"), col("tsu"), col("event_id"),
        when(col("event_type") === "error", lit("D")).otherwise(lit("U"))
          .as("op"),
        col("event_type"), col("value"))
      .groupBy("user_id")
      .agg(max(struct(col("tsu"), col("event_id"), col("op"),
        col("event_type"), col("value"))).as("last"))
      .select(col("user_id"), col("last.op").as("op"),
        col("last.event_type").as("d_state"), col("last.value").as("d_val"),
        col("last.tsu").as("d_tsu"))

    // MERGE: delta wins where present; tombstoned keys leave the table
    base.join(lastDelta, Seq("user_id"), "full_outer")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(col("user_id"),
        when(col("op").isNull, col("state")).otherwise(col("d_state"))
          .as("state"),
        when(col("op").isNull, col("val")).otherwise(col("d_val")).as("val"),
        when(col("op").isNull, col("updated_us")).otherwise(col("d_tsu"))
          .as("updated_us"),
        when(col("op").isNull, lit("base")).otherwise(lit("merged"))
          .as("src"))
      .orderBy("user_id")
  }

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q135_cdc_merge" -> (cdcMerge(_, _)))

  val oracles: Map[String, String] = Map(
    // identical latest-wins rule spelled out as row_number DESC; `val`
    // is a carried stored double (no arithmetic), so it hashes exactly
    "q135_cdc_merge" ->
      """WITH ev AS (
           SELECT user_id, event_id, event_type, value,
                  epoch_ns(ts) // 1000 AS tsu
           FROM events WHERE ts IS NOT NULL),
         cut AS (SELECT (min(tsu) + max(tsu)) // 2 AS cut_us FROM ev),
         base AS (
           SELECT user_id, event_type AS state, value AS val,
                  tsu AS updated_us
           FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                   ORDER BY tsu DESC, event_id DESC) AS rn
                 FROM ev WHERE tsu < (SELECT cut_us FROM cut))
           WHERE rn = 1),
         last_delta AS (
           SELECT user_id,
                  CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
                  event_type AS d_state, value AS d_val, tsu AS d_tsu
           FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                   ORDER BY tsu DESC, event_id DESC) AS rn
                 FROM ev WHERE tsu >= (SELECT cut_us FROM cut))
           WHERE rn = 1)
         SELECT coalesce(b.user_id, d.user_id) AS user_id,
                CASE WHEN d.op IS NULL THEN b.state ELSE d.d_state END AS state,
                CASE WHEN d.op IS NULL THEN b.val ELSE d.d_val END AS val,
                CASE WHEN d.op IS NULL THEN b.updated_us ELSE d.d_tsu END
                  AS updated_us,
                CASE WHEN d.op IS NULL THEN 'base' ELSE 'merged' END AS src
         FROM base b FULL OUTER JOIN last_delta d ON b.user_id = d.user_id
         WHERE d.op IS NULL OR d.op <> 'D'
         ORDER BY user_id""")
}
