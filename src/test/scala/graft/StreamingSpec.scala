package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingEnergy

/** Batch/stream parity of the energy-bucket transform: the same
  * declarative pipeline must produce identical per-window aggregates
  * whether fed as a bounded frame or incrementally through Structured
  * Streaming (SURVEY.md §2.9 — the capability the reference's
  * "Spark-Streaming" badge promises but never implements).
  */
/** Top-level so Spark can generate its encoder (inner classes need the
  * enclosing instance's scope, which executors don't have).
  */
case class Ev(ts: Timestamp, user_id: Long, event_type: String)

class StreamingSpec extends AnyFunSuite with SparkTestBase {

  private val sample = Seq(
    Ev(Timestamp.valueOf("2024-01-01 00:01:00"), 1L, "click_x"),
    Ev(Timestamp.valueOf("2024-01-01 00:02:00"), 1L, "purchase_y"),
    Ev(Timestamp.valueOf("2024-01-01 00:14:00"), 1L, "view"),
    Ev(Timestamp.valueOf("2024-01-01 00:03:00"), 2L, "error_z"),
    Ev(Timestamp.valueOf("2024-01-01 00:22:00"), 2L, "signup_w"))

  test("streaming windowed aggregation matches the batch result") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val batch = StreamingEnergy.energyBuckets(sample.toDF())
      .orderBy("user_id", "bucket").collect().toSeq

    val stream = MemoryStream[Ev]
    val q = StreamingEnergy.energyBuckets(stream.toDF())
      .writeStream.format("memory").queryName("energy_stream")
      .outputMode("complete").start()
    try {
      stream.addData(sample.take(2))
      q.processAllAvailable()
      stream.addData(sample.drop(2))
      q.processAllAvailable()
      val streamed = s.table("energy_stream")
        .orderBy("user_id", "bucket").collect().toSeq
      assert(streamed == batch)
    } finally q.stop()
  }

  test("windows are 10-minute tumbling buckets with correct density/energy") {
    val s = spark
    import s.implicits._
    val rows = StreamingEnergy.energyBuckets(sample.toDF())
      .orderBy("user_id", "bucket").collect()
    // user 1: window [00:00,00:10) has click(2.0)+purchase(5.0) → density 2,
    // sentiment 7.0, energy = 7*0.37 + 2*0.63
    val u1w0 = rows.find(r => r.getLong(0) == 1L && r.getLong(1) == Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000).get
    assert(u1w0.getLong(2) == 2L)
    assert(u1w0.getDouble(3) == 7.0)
    assert(math.abs(u1w0.getDouble(4) - (7.0 * 0.37 + 2 * 0.63)) < 1e-12)
    // 5 events over 4 distinct (user, window) pairs
    assert(rows.length == 4)
    assert(rows.map(_.getLong(2)).sum == 5L)
  }
}
