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

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q137_rfm_segments" -> (rfmSegments(_, _)),
    "q141_decile_lift" -> (decileLift(_, _)))

  /** Shared SQL fragment: the discrete-selection boundary rule (must
    * stay textually in sync with q102's oracle — same rule).
    */
  private def cutSql(ps: Seq[(String, Double)]): String =
    ps.map { case (name, p) =>
      s"min(v) FILTER (WHERE cum::DOUBLE / n::DOUBLE >= ${p}::DOUBLE) AS $name"
    }.mkString(",\n             ")

  val oracles: Map[String, String] = Map(
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
