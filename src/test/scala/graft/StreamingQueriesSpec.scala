package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Sessionization, TextAnalysis}
import graft.streaming.StreamingQueries

/** The registered streaming surface (q98/q99): exact batch parity —
  * result sets equal the batch twins' row-for-row — plus proof the runs
  * genuinely spanned multiple micro-batches (state folded across
  * triggers, not a single-batch degenerate).
  */
class StreamingQueriesSpec extends AnyFunSuite with SparkTestBase {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("q98: streaming word-freq == batch q40 over the same documents, multi-batch") {
    val streamed = rows(StreamingQueries.streamingWordFreq(spark, sf))
    val batch = rows(TextAnalysis.wordFreqTopK(spark, sf))
    assert(streamed == batch)
    assert(StreamingQueries.lastWordFreqBatches >= 2,
      s"expected >=2 micro-batches, got ${StreamingQueries.lastWordFreqBatches}")
  }

  test("q78: stream-static enrichment join == batch join+agg, multi-batch") {
    import org.apache.spark.sql.functions._
    val streamed = rows(StreamingQueries.streamingEnrichedRevenue(spark, sf))
    val batch = rows(Tables.events(spark, sf)
      .filter(col("ts").isNotNull)
      .join(Tables.customer(spark, sf), col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,6)")).cast("double"), 2)
          .as("value_sum"))
      .orderBy("c_mktsegment"))
    assert(streamed == batch)
    assert(StreamingQueries.lastEnrichBatches >= 2,
      s"expected >=2 micro-batches, got ${StreamingQueries.lastEnrichBatches}")
  }

  test("q99: streaming sessionization == batch q27 over the same events, multi-batch") {
    val streamed = rows(StreamingQueries.streamingSessions(spark, sf))
    val batch = rows(Sessionization.sessions(spark, sf))
    assert(streamed.size == batch.size)
    assert(streamed == batch)
    // 2 time-split files + 1 sentinel file, one per trigger
    assert(StreamingQueries.lastSessionBatches >= 3,
      s"expected >=3 micro-batches, got ${StreamingQueries.lastSessionBatches}")
  }
}
