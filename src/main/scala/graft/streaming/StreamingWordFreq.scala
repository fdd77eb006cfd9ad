package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Fidelity

/** Streaming twin of the preprocess word-frequency job
  * (hot/preprocess_high_energy.py:39-78, batch form = q96): a live
  * danmaku stream → CJK segmentation → the reference's exact
  * stopword/len/numeric filters → incrementally-maintained counts.
  * Stage logic is SHARED with the batch query
  * ([[Fidelity.segmentedWords]]) so the two can never drift.
  *
  * Output mode is the caller's choice: `complete` for a live top-N
  * leaderboard (state = one row per distinct surviving word — bounded
  * by vocabulary, not stream length), `update` for a changelog sink.
  * The batch job's `limit(500)` belongs at the sink (sorting is only
  * legal in complete mode).
  */
object StreamingWordFreq {

  def wordCounts(danmaku: DataFrame): DataFrame =
    Fidelity.segmentedWords(danmaku)
      .groupBy("word").agg(count(lit(1)).as("frequency"))
}
