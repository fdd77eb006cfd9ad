package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Fidelity
import graft.streaming.StreamingWordFreq

/** Streaming word-frequency twin: counts maintained incrementally over
  * triggers must equal the batch query (q96 logic) over the union of
  * all input seen — same segmentation, same filters, shared stage code.
  */
class StreamingWordFreqSpec extends AnyFunSuite with SparkTestBase {

  test("streaming counts after N triggers == batch counts over the same lines") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val lines1 = Seq("前方高能 前方高能", "的 了 123 哈哈哈")
    val lines2 = Seq("哈哈哈 泪目", "7 x 泪目")

    val stream = MemoryStream[String]
    val counts = StreamingWordFreq.wordCounts(
      stream.toDF().select(col("value").as("text")))
    val q = counts.writeStream
      .format("memory").queryName("wf_out")
      .outputMode("complete")
      .start()
    try {
      stream.addData(lines1: _*)
      q.processAllAvailable()
      stream.addData(lines2: _*)
      q.processAllAvailable()

      val streamed = s.table("wf_out").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val batch = Fidelity
        .wordFreqFrom((lines1 ++ lines2).toDF("text"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      // and the filters actually fired on the stream side
      assert(!streamed.contains("的") && !streamed.contains("123"))
      assert(streamed("前方高能") == 2L && streamed("泪目") == 2L)
    } finally q.stop()
  }
}
