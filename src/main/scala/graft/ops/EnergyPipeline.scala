package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.expr.Lexicon

/** The reference's flagship "high-energy moment" pipeline
  * (hot/spark_energy.py:26-116), re-expressed Spark-first on the driver's
  * `events` table (`user_id` ≈ episode/bvid, `ts` ≈ comment time):
  *
  *   scan → lexicon score (native when-chain, not a UDF)
  *        → time bucketize (floor arithmetic)
  *        → groupBy(user, bucket): density + sentiment (partial+final agg)
  *        → energy = 0.37·sentiment + 0.63·density  (spark_energy.py:72)
  *        → percent_rank over per-user window        (spark_energy.py:76)
  *        → highlight = pct ≥ 0.9                    (spark_energy.py:79)
  *        → ordered nested timeline via sort_array(collect_list(struct))
  *
  * Scale notes: one exchange for the group-by, one for the window (both
  * on user_id — the second reuses nothing from the first because the
  * grouping key is wider; at 100 TB the window partition key bounds
  * memory per partition to a user's bucket count, which is capped by the
  * time range / bucket width, not by data volume). The timeline is
  * emitted executor-side (`write.json`-able), never `collect()`ed — the
  * reference's driver-side JSON loop (spark_energy.py:98-116) is the
  * anti-pattern this replaces.
  */
object EnergyPipeline {

  /** 10-minute buckets (the reference uses 10 s on 24-min episodes,
    * spark_energy.py:15; events span a month, so scale the bucket).
    */
  val bucketSeconds = 600L

  /** `ts` arrives as epoch nanoseconds (Tables.eventsSchema); integer
    * `div` keeps full precision (ns magnitudes exceed double's 2^53).
    */
  private def bucketCol(ts: Column): Column =
    expr(s"((ts div 1000000000) div $bucketSeconds) * $bucketSeconds")

  /** Per-(user, bucket) density + sentiment + energy. Sentiment weights
    * are exact binary fractions of 0.5 → sums are order-independent and
    * bit-stable across engines; no rounding needed.
    */
  def buckets(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("ts").isNotNull)
      .withColumn("bucket", bucketCol(col("ts")))
      .withColumn("score", Lexicon.score(col("event_type")))
      .groupBy("user_id", "bucket")
      .agg(
        count(lit(1)).as("density"),
        sum("score").as("sentiment"))
      .withColumn("energy",
        col("sentiment") * lit(0.37) + col("density") * lit(0.63))

  /** + per-user percent_rank and highlight flag. */
  def ranked(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("energy")
    buckets(spark, dir)
      .withColumn("rank_pct", percent_rank().over(w))
      .withColumn("is_high", col("rank_pct") >= 0.9)
  }

  /** Highlight summary per user (the "top moments" egress). */
  def highlights(spark: SparkSession, dir: String): DataFrame =
    ranked(spark, dir)
      .filter(col("is_high"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_high"),
        round(max("energy"), 6).as("peak_energy"),
        min("bucket").as("first_high_bucket"))
      .orderBy("user_id")

  /** Nested per-user timeline: array<struct<bucket,energy,high>>, ordered
    * explicitly via sort_array (struct sorts by first field) — the
    * reference relies on fragile pre-groupBy ordering
    * (spark_energy.py:86-94); after a shuffle that ordering is not
    * guaranteed, so the rebuild makes it structural.
    */
  def timeline(spark: SparkSession, dir: String): DataFrame =
    ranked(spark, dir)
      .groupBy("user_id")
      .agg(sort_array(collect_list(struct(
        col("bucket"), col("energy"), col("is_high").as("high")))).as("timeline"))
      .orderBy("user_id")

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q20_energy_buckets" -> ((s, d) => buckets(s, d).orderBy("user_id", "bucket")),
    "q21_energy_ranked" -> ((s, d) =>
      ranked(s, d)
        .select("user_id", "bucket", "energy", "rank_pct", "is_high")
        .orderBy("user_id", "bucket")),
    "q22_energy_highlights" -> (highlights(_, _)),
    // Registered surface serializes the nested timeline (the driver's
    // pandas compare can't hash numpy arrays — CORRECTNESS_r02); the
    // library API (`timeline`) keeps the native array<struct>. Energy is
    // scaled to an integer micro-unit so no float-to-string formatting
    // divergence between engines can leak into the hash.
    "q23_energy_timeline" -> ((s, d) =>
      timeline(s, d).select(
        col("user_id"),
        array_join(
          transform(col("timeline"), e =>
            concat_ws(":",
              e("bucket"),
              round(e("energy") * 1e6).cast("long"),
              e("high"))),
          "|").as("timeline_str"))))

  /** Shared oracle CTE: the bucket/score/energy core in DuckDB SQL.
    * Sentiment weights match Lexicon.eventTypeTiers (first-hit-wins
    * substring semantics → CASE with contains()). All numeric literals
    * cast ::DOUBLE — DuckDB types bare literals DECIMAL, which computes
    * 1.74 where double math gives 1.7399999999999998.
    */
  private val bucketsCte =
    """WITH buckets AS (
         SELECT user_id,
           (epoch_ns(ts) // 1000000000 // 600) * 600 AS bucket,
           count(*) AS density,
           sum(CASE
                 WHEN event_type IS NULL OR event_type = '' THEN 1.0::DOUBLE
                 WHEN contains(lower(event_type), 'purchase') THEN 5.0::DOUBLE
                 WHEN contains(lower(event_type), 'signup') THEN 3.0::DOUBLE
                 WHEN contains(lower(event_type), 'click') THEN 2.0::DOUBLE
                 WHEN contains(lower(event_type), 'error') THEN 0.5::DOUBLE
                 ELSE 1.0::DOUBLE END) AS sentiment
         FROM events WHERE ts IS NOT NULL
         GROUP BY 1, 2
       ), scored AS (
         SELECT user_id, bucket, density, sentiment,
           sentiment * 0.37::DOUBLE + density * 0.63::DOUBLE AS energy
         FROM buckets
       )"""

  val oracles: Map[String, String] = Map(
    "q20_energy_buckets" -> (bucketsCte +
      """ SELECT user_id, bucket, density, sentiment, energy
          FROM scored ORDER BY user_id, bucket"""),
    "q21_energy_ranked" -> (bucketsCte +
      """, ranked AS (
            SELECT user_id, bucket, energy,
              percent_rank() OVER (PARTITION BY user_id ORDER BY energy) AS rank_pct
            FROM scored)
          SELECT user_id, bucket, energy, rank_pct, rank_pct >= 0.9 AS is_high
          FROM ranked ORDER BY user_id, bucket"""),
    "q22_energy_highlights" -> (bucketsCte +
      """, ranked AS (
            SELECT user_id, bucket, energy,
              percent_rank() OVER (PARTITION BY user_id ORDER BY energy) AS rank_pct
            FROM scored)
          SELECT user_id, count(*) AS n_high, round(max(energy),6) AS peak_energy,
            min(bucket) AS first_high_bucket
          FROM ranked WHERE rank_pct >= 0.9
          GROUP BY user_id ORDER BY user_id"""),
    // Serialized-timeline twin: string_agg ORDER BY bucket matches
    // sort_array on struct<bucket,...> because buckets are unique per
    // user. round() tie behavior matches (both round the same double;
    // exact .5 ties need a terminating binary fraction at 1e-6 — the
    // 0.37/0.63 weights make that unreachable).
    "q23_energy_timeline" -> (bucketsCte +
      """, ranked AS (
            SELECT user_id, bucket, energy,
              percent_rank() OVER (PARTITION BY user_id ORDER BY energy) AS rank_pct
            FROM scored)
          SELECT user_id,
            string_agg(
              bucket::VARCHAR || ':' ||
              round(energy * 1000000)::BIGINT::VARCHAR || ':' ||
              (rank_pct >= 0.9)::VARCHAR,
              '|' ORDER BY bucket) AS timeline_str
          FROM ranked GROUP BY user_id ORDER BY user_id"""))
  // The native array<struct> timeline (library API) has no SQL oracle;
  // ordering + content pinned in EnergySpec.
}
