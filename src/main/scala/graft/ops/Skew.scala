package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Skew-safe aggregation patterns + the statistics aggregates the
  * reference computes pandas-side (tag/main.py:140,163 — mean and
  * correlation), done engine-side.
  *
  * The reference's data has >10× key skew (BASELINE.md: top entity
  * 331,867 mentions vs 30,435 for #2). For associative aggregates Spark
  * already combines map-side, so a hot GROUP BY key is usually fine;
  * the salting pattern below is for the residual cases (huge per-key
  * state, or AQE disabled) and is oracle-checked to produce results
  * identical to the direct aggregation.
  */
object Skew {

  val saltBuckets = 16

  /** Two-phase salted aggregation over a skewed key: phase 1 aggregates
    * (key, salt) — spreading one hot key over `saltBuckets` reducers —
    * phase 2 merges the partials per key. Identical result to a direct
    * groupBy (sum/count are associative; avg is re-derived from the
    * merged sums, never averaged-of-averages).
    */
  def saltedTypeStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("salt", pmod(xxhash64(col("event_id")), lit(saltBuckets)))
      // per-row DECIMAL quantization (the repo's money-sum discipline):
      // double sums over full per-type groups are order-dependent and
      // would drift from the oracle at larger scale factors
      .withColumn("value_q",
        col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
      .groupBy("event_type", "salt")
      .agg(
        count(lit(1)).as("n_part"),
        sum("value_q").as("sum_part"))
      .groupBy("event_type")
      .agg(
        sum("n_part").as("n"),
        round(sum("sum_part").cast("double"), 2).as("value_sum"),
        // divide in double (exact decimal sum → deterministic cast →
        // one fp division), avoiding engine-specific decimal-division
        // scale rules
        round(sum("sum_part").cast("double") / sum("n_part").cast("double"), 6)
          .as("value_avg"))
      .orderBy("event_type")

  /** Pearson correlation + sample stddev per group (A7's corr matrix,
    * engine-side). Spark and DuckDB both use the numerically-stable
    * one-pass co-moment formulation.
    */
  def corrStats(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        round(corr("l_quantity", "l_extendedprice"), 6).as("corr_qty_price"),
        round(stddev_samp("l_quantity"), 6).as("sd_qty"),
        round(avg("l_quantity"), 6).as("avg_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q24_salted_type_stats" -> (saltedTypeStats(_, _)),
    "q25_corr_stats" -> (corrStats(_, _)))

  val oracles: Map[String, String] = Map(
    // the oracle is the DIRECT aggregation — proving salt+merge is
    // semantically invisible
    "q24_salted_type_stats" ->
      """SELECT event_type, count(*) AS n,
         round(sum(CAST(value AS DECIMAL(18,6)))::DOUBLE, 2) AS value_sum,
         round(sum(CAST(value AS DECIMAL(18,6)))::DOUBLE / count(*), 6) AS value_avg
         FROM events GROUP BY 1 ORDER BY 1""",
    "q25_corr_stats" ->
      """SELECT l_returnflag, round(corr(l_quantity, l_extendedprice),6) AS corr_qty_price,
         round(stddev_samp(l_quantity),6) AS sd_qty,
         round(avg(l_quantity),6) AS avg_qty, count(*) AS n
         FROM lineitem GROUP BY 1 ORDER BY 1""")
}
