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

  /** q174 — ROLLUP MAINTENANCE UNDER RETRACTIONS: keep a daily rollup
    * current against a changelog that contains DELETES as well as
    * inserts — the case q130's merge identity cannot handle. The delta
    * is the post-cutoff slice (inserts, q135's midpoint convention)
    * plus a purge list over the base (every 13th event_id — the GDPR
    * shape, q173's row-delete twin on the AGGREGATE side). The algebra
    * splits by measure class:
    *
    *   - count/sum are groups under signed merge: stored + insert
    *     partials − delete partials, exact because the sums are
    *     DECIMAL end to end (float addition would drift under regroup,
    *     and subtraction amplifies it).
    *   - min/max are NOT retractable — deleting the row that held the
    *     minimum leaves no way to derive the new minimum from the old
    *     one. The maintenance recomputes them ONLY for the groups the
    *     purge actually touched (a left-semi group-scoped rescan);
    *     untouched groups keep merged stored/insert extrema. At 100 TB
    *     a purge touches a handful of (type, day) groups, so the
    *     rescan reads a few partitions of one day each, not history.
    *
    * Groups the purge empties entirely disappear (the count/sum frame
    * inner-joins the extrema frame). The oracle recomputes the rollup
    * directly over base∖deletes ∪ inserts in one pass: the maintained
    * result must hash-equal the recompute, sums bit-exactly.
    */
  def retractableRollup(spark: SparkSession, dir: String): DataFrame =
    retractCore(Tables.eventsMicros(spark, dir))

  private[graft] val usPerDay = 86400000000L
  private[graft] val purgeModulus = 13

  private[graft] def retractCore(ev0: DataFrame): DataFrame = {
    val ev = ev0.select(col("event_type"), col("tsu"), col("value"),
        col("event_id"))
      .withColumn("day", expr(s"tsu div $usPerDay"))
    // data-derived cutoff; single-row frame, broadcast (the sanctioned
    // tiny-crossJoin pattern — q135)
    val cutoff = ev.agg(expr("(min(tsu) + max(tsu)) div 2").as("cut_us"))
    val tagged = ev.crossJoin(broadcast(cutoff))
    val base = tagged.filter(col("tsu") < col("cut_us"))
    val inserts = tagged.filter(col("tsu") >= col("cut_us"))
    val deletes = base.filter(col("event_id") % purgeModulus === 0)

    // the mergeable partial-aggregate state, one row per rollup group
    def partials(df: DataFrame, sign: Int): DataFrame =
      df.groupBy("event_type", "day")
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("value").cast("decimal(18,6)")).as("vsum"),
          min("value").as("vmin"),
          max("value").as("vmax"))
        .withColumn("sign", lit(sign))
    val stored = partials(base, 1) // yesterday's materialized state
    val insP = partials(inserts, 1)
    val delP = partials(deletes, -1)

    // signed merge: exact for the group-structured measures
    val counts = stored.unionByName(insP).unionByName(delP)
      .groupBy("event_type", "day")
      .agg(
        sum(expr("sign * cnt")).as("n_events"),
        sum(expr("cast(sign AS decimal(2,0)) * vsum")).as("vsum_total"))

    // extrema: recompute only where a delete landed
    val touched = delP.select("event_type", "day").distinct()
    val untouchedMM = stored.select("event_type", "day", "vmin", "vmax")
      .unionByName(insP.select("event_type", "day", "vmin", "vmax"))
      .join(touched, Seq("event_type", "day"), "left_anti")
      .groupBy("event_type", "day")
      .agg(min("vmin").as("value_min"), max("vmax").as("value_max"))
    val live = base.filter(col("event_id") % purgeModulus =!= 0)
      .unionByName(inserts)
    val touchedMM = live.join(touched, Seq("event_type", "day"), "left_semi")
      .groupBy("event_type", "day")
      .agg(min("value").as("value_min"), max("value").as("value_max"))

    counts.join(untouchedMM.unionByName(touchedMM), Seq("event_type", "day"))
      .select(col("event_type"), col("day"), col("n_events"),
        round(col("vsum_total").cast("double"), 2).as("value_sum"),
        col("value_min"), col("value_max"))
      .orderBy("event_type", "day")
  }

  /** q183 — INCREMENTAL JOIN-VIEW MAINTENANCE: keep a JOIN view current
    * from delta batches alone. The view is order-grain revenue over
    * orders ⋈ lineitem; the delta is the post-cutoff lineitem slice
    * (shipdate midpoint, q135's convention — every scale factor
    * exercises both sides). The maintenance identity for an
    * insert-only delta over a key-partitioned aggregate-join view:
    *
    *   V(base ∪ Δ) = merge(V_stored, agg(orders ⋈ Δ))
    *
    * i.e. yesterday's materialized per-order partials full-outer-merged
    * with the DELTA's partials — the base lineitem slice is NEVER
    * rescanned. At 100 TB that is the difference between touching one
    * day's partitions and touching five years of history; q130 proves
    * the identity for a single-table rollup and q174 for retractions —
    * this is the JOIN-view member of the family. All three exchanges
    * (stored view, delta partials, merge) hash on the same order key,
    * so AQE plans one partitioning family; the final orders attachment
    * is a same-key hash join, no extra shuffle grain.
    *
    * Money is exact integer cents (`floor(extprice·(1−disc)·100)` —
    * floor, not cast: DuckDB's double→int cast ROUNDS while Spark's
    * truncates, the one silent cross-engine divergence in this
    * expression class). The oracle recomputes the view from the FULL
    * lineitem in one pass; the maintained result must hash-equal it,
    * including the base/delta/both provenance column.
    */
  def incrementalJoinView(spark: SparkSession, dir: String): DataFrame =
    joinViewCore(Tables.orders(spark, dir), Tables.lineitem(spark, dir))

  private[graft] val viewStride = 20

  private[graft] def joinViewCore(orders: DataFrame,
                                  lineitem: DataFrame): DataFrame = {
    val li = lineitem.select(col("l_orderkey"),
      expr("floor(l_extendedprice * (1.0D - l_discount) * 100.0D)")
        .as("cents"),
      unix_micros(col("l_shipdate")).as("su"))
    val cutoff = li.agg(expr("(min(su) + max(su)) div 2").as("cut_us"))
    val tagged = li.crossJoin(broadcast(cutoff))

    def partials(df: DataFrame): DataFrame =
      df.groupBy("l_orderkey")
        .agg(count(lit(1)).as("n"), sum("cents").as("rev"))
    val stored = partials(tagged.filter(col("su") < col("cut_us")))
    val deltaV = partials(tagged.filter(col("su") >= col("cut_us")))

    val merged = stored.as("b")
      .join(deltaV.as("d"), Seq("l_orderkey"), "full_outer")
      .select(col("l_orderkey"),
        (coalesce(col("b.n"), lit(0L)) + coalesce(col("d.n"), lit(0L)))
          .as("n_items"),
        (coalesce(col("b.rev"), lit(0L)) + coalesce(col("d.rev"), lit(0L)))
          .as("revenue_cents"),
        when(col("b.n").isNotNull && col("d.n").isNotNull, "both")
          .when(col("b.n").isNotNull, "base").otherwise("delta").as("src"))

    merged.join(orders.select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderkey"), col("o_orderpriority"), col("n_items"),
        col("revenue_cents"), col("src"))
      .filter(col("o_orderkey") % viewStride === 0)
      .orderBy("o_orderkey")
  }

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q135_cdc_merge" -> (cdcMerge(_, _)),
    "q174_retractable_rollup" -> (retractableRollup(_, _)),
    "q183_incremental_join_view" -> (incrementalJoinView(_, _)))

  val oracles: Map[String, String] = Map(
    // q183: the view recomputed from the FULL lineitem in one pass —
    // the engine's stored+delta merge must hash-equal it; provenance
    // re-derived from the same midpoint cutoff via FILTER counts
    "q183_incremental_join_view" ->
      s"""WITH li AS (
           SELECT l_orderkey,
             CAST(floor(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)
                        * CAST(100.0 AS DOUBLE)) AS BIGINT) AS cents,
             epoch_ns(l_shipdate) // 1000 AS su
           FROM lineitem),
         cut AS (SELECT (min(su) + max(su)) // 2 AS cut_us FROM li),
         v AS (
           SELECT l_orderkey, count(*) AS n_items,
             sum(cents)::BIGINT AS revenue_cents,
             CASE
               WHEN count(*) FILTER (WHERE su < (SELECT cut_us FROM cut)) > 0
                AND count(*) FILTER (WHERE su >= (SELECT cut_us FROM cut)) > 0
               THEN 'both'
               WHEN count(*) FILTER (WHERE su < (SELECT cut_us FROM cut)) > 0
               THEN 'base' ELSE 'delta' END AS src
           FROM li GROUP BY 1)
         SELECT o_orderkey, o_orderpriority, n_items, revenue_cents, src
         FROM v JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderkey % $viewStride = 0 ORDER BY o_orderkey""",
    // q174: the post-changelog table (base∖deletes ∪ inserts)
    // aggregated directly in ONE pass — the engine's signed-merge +
    // group-scoped-rescan result must hash-equal it, sums bit-exactly
    "q174_retractable_rollup" ->
      s"""WITH ev AS (
           SELECT event_type, epoch_ns(ts) // 1000 AS tsu, value, event_id
           FROM events WHERE ts IS NOT NULL),
         cut AS (SELECT (min(tsu) + max(tsu)) // 2 AS cut_us FROM ev),
         live AS (
           SELECT * FROM ev
           WHERE (tsu < (SELECT cut_us FROM cut)
                    AND event_id % $purgeModulus <> 0)
              OR tsu >= (SELECT cut_us FROM cut))
         SELECT event_type, tsu // $usPerDay AS day,
           count(*) AS n_events,
           round(sum(CAST(value AS DECIMAL(18,6)))::DOUBLE, 2) AS value_sum,
           min(value) AS value_min,
           max(value) AS value_max
         FROM live GROUP BY 1, 2 ORDER BY 1, 2""",
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
