package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.expr.Lexicon

/** Structured-Streaming variant of the energy pipeline — the incremental
  * processing the reference approximates by re-running batch jobs over
  * accumulating CSVs (SURVEY.md §2.9; its "Spark-Streaming" badge,
  * hot/readme.md:2, is aspirational).
  *
  * Shape: event-time tumbling window + watermark → per-(user, window)
  * density/sentiment/energy. The same scoring expression (native
  * when-chain) serves batch and streaming — one definition, two
  * execution modes. Highlight ranking (percent_rank) is intentionally
  * NOT in the streaming leg: a global rank over an unbounded stream is
  * not incrementally computable; the engine ranks on the materialized
  * bucket table downstream (the lambda seam, documented here).
  */
object StreamingEnergy {

  val windowDuration = "10 minutes"
  val watermarkDelay = "30 minutes"

  /** Transform a (possibly streaming) events DataFrame with schema
    * (ts timestamp, user_id long, event_type string) into per-window
    * energy buckets. Works identically on a batch frame (tests pin
    * batch/stream parity).
    */
  def energyBuckets(events: DataFrame): DataFrame =
    events
      .filter(col("ts").isNotNull)
      .withWatermark("ts", watermarkDelay)
      .withColumn("score", Lexicon.score(col("event_type")))
      .groupBy(col("user_id"), window(col("ts"), windowDuration).as("win"))
      .agg(
        count(lit(1)).as("density"),
        sum("score").as("sentiment"))
      .select(
        col("user_id"),
        col("win.start").cast("long").as("bucket"),
        col("density"),
        col("sentiment"),
        (col("sentiment") * lit(0.37) + col("density") * lit(0.63)).as("energy"))
}
