package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming ingestion with exactly-once-per-id semantics — the
  * Structured-Streaming form of the reference's crawl-append-dedup loop
  * (spider_worker.py:73-113; SURVEY.md §2.1 S11/S12 suggested
  * `foreachBatch` + dedup for the streaming rebuild).
  *
  * Two layers:
  *  - `dedupedStream`: drop duplicate record ids inside the engine's
  *    state, bounded by the event-time watermark
  *    (`dropDuplicatesWithinWatermark` — state is purged as the
  *    watermark advances, so it does not grow with stream length).
  *  - `appendSink`: per-micro-batch idempotent append into a parquet
  *    directory via `foreachBatch` — the batch dedups against itself;
  *    cross-restart duplicates are bounded by the watermark layer above.
  */
object StreamingIngest {

  /** Watermark-bounded streaming dedup on a record id column. */
  def dedupedStream(events: DataFrame, idCol: String, tsCol: String,
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCol)

  /** Idempotent micro-batch sink. foreachBatch is at-least-once: after a
    * crash between the data commit and the checkpoint commit, the same
    * batchId is REPLAYED — a blind append would duplicate it. Keying the
    * output by batch_id with dynamic partition overwrite makes the
    * replay overwrite its own partition: exactly-once at rest.
    *
    * LIFECYCLE CONTRACT: `outDir` and `checkpoint` must live and die
    * together. Restarting with a fresh/cleared checkpoint against an
    * existing outDir restarts batchIds at 0 and the new batch 0
    * OVERWRITES the old batch_id=0 partition (the same mechanism that
    * makes legitimate replay idempotent cannot distinguish this) —
    * clear both or keep both.
    */
  def appendSink(deduped: DataFrame, outDir: String, idCol: String,
      checkpoint: String): StreamingQuery =
    deduped.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.dropDuplicates(idCol)
          .withColumn("batch_id", lit(batchId))
          .write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(outDir)
      }
      .start()
}
