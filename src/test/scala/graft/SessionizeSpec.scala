package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Sessionization
import graft.streaming.Sessionize

/** Sessionization semantics, batch and streaming: gap splitting,
  * single-event sessions, count preservation, and the keyed-state
  * streaming path closing sessions via gaps and event-time timeouts.
  */
class SessionizeSpec extends AnyFunSuite with SparkTestBase {

  test("batch: session count preserved, durations non-negative, gaps respected") {
    val s = Sessionization.sessions(spark, sf)
    val total = s.agg(sum("n_events")).collect()(0).getLong(0)
    val events = Tables.events(spark, sf).filter(col("ts").isNotNull).count()
    assert(total == events)
    assert(s.filter(col("duration_sec") < 0).count() == 0)
    // consecutive in-session gaps are <= gap, so duration <= (n-1)*gap
    assert(s.filter(
      col("duration_sec") > (col("n_events") - 1) * Sessionization.gapSeconds).count() == 0)
  }

  test("batch: session ids are contiguous from 1 per user") {
    val s = Sessionization.sessions(spark, sf)
    val bad = s.groupBy("user_id")
      .agg(min("session_id").as("lo"), max("session_id").as("hi"),
        count(lit(1)).as("n"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("n"))
    assert(bad.count() == 0)
  }

  test("session paths: ordered journeys, gap split, maxLen cut, frequency rank") {
    val s = spark
    import s.implicits._
    val g = Sessionization.gapSeconds * 1000000L
    // user 1: a>b>c then (past gap) a>b ; user 2: a>b ; user 3: one
    // 10-event session — its path cuts at pathMaxLen=8 types
    val ev = (Seq(
      (1L, 1L, 0L, "a"), (2L, 1L, 10L, "b"), (3L, 1L, 20L, "c"),
      (4L, 1L, 20L + g + 1L, "a"), (5L, 1L, 20L + g + 2L, "b"),
      (6L, 2L, 0L, "a"), (7L, 2L, 5L, "b")) ++
      (0 until 10).map(i => (100L + i, 3L, i.toLong, s"t$i")))
      .toDF("event_id", "user_id", "tsu", "event_type")
    val got = Sessionization.sessionPathsCore(ev)
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(
      ("a>b", 2L),
      ("a>b>c", 1L),
      ("t0>t1>t2>t3>t4>t5>t6>t7", 1L)))
  }

  test("streaming: consecutive stragglers gap-chain into one historical session") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val stream = MemoryStream[Sessionize.In]
    // generous allowed lateness: stragglers must survive the pre-state
    // watermark filter to reach the keyed-state logic at all
    val q = Sessionize.sessions(stream.toDS().withWatermark("ts", "24 hours"))
      .writeStream.format("memory").queryName("straggler_out")
      .outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
      // trigger 1 opens a session at +4h
      stream.addData(Sessionize.In(1L, new Timestamp(t0 + 4 * 3600 * 1000), "click"))
      q.processAllAvailable()
      // trigger 2 delivers two stragglers 10 min apart, both > gap older
      // than the open session but inside allowed lateness — they must
      // form ONE 2-event session, not two singletons
      stream.addData(
        Sessionize.In(1L, new Timestamp(t0), "view"),
        Sessionize.In(1L, new Timestamp(t0 + 600 * 1000), "view"))
      q.processAllAvailable()
      val out = s.table("straggler_out").collect()
      // session bounds are epoch-µs (Sessionize runs at µs precision)
      assert(out.exists(r => r.getLong(0) == 1L && r.getLong(1) == t0 * 1000
        && r.getLong(2) == (t0 + 600 * 1000) * 1000 && r.getLong(3) == 2L),
        s"expected one chained 2-event historical session, got ${out.toSeq}")
      assert(!out.exists(r => r.getLong(3) == 1L && r.getLong(1) == t0 * 1000),
        s"straggler singletons leaked: ${out.toSeq}")
    } finally q.stop()
  }

  test("streaming: straggler chain within gap of the open session folds into it (batch parity)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val stream = MemoryStream[Sessionize.In]
    val q = Sessionize.sessions(stream.toDS().withWatermark("ts", "24 hours"))
      .writeStream.format("memory").queryName("straggler_merge_out")
      .outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2024-02-01 00:00:00").getTime
      val hour = 3600 * 1000L
      // trigger 1 opens a session at +3h
      stream.addData(Sessionize.In(2L, new Timestamp(t0 + 3 * hour), "click"))
      q.processAllAvailable()
      // trigger 2: late events at +95min and +125min. +95 is > gap (1h)
      // older than the open start (+3h) so it enters the straggler
      // chain; +125 is within the gap of the open start so it extends
      // the open session downward to +125, leaving the chain's last
      // event (+95) only 30min from the open start. The batch twin over
      // {95,125,180} has gaps {30,55} min, all <= 1h: ONE session
      // [t0+95m, t0+3h] with 3 events; so must streaming.
      val min = 60 * 1000L
      stream.addData(
        Sessionize.In(2L, new Timestamp(t0 + 95 * min), "view"),
        Sessionize.In(2L, new Timestamp(t0 + 125 * min), "view"))
      q.processAllAvailable()
      // nothing may close yet: the merged session is still open
      assert(s.table("straggler_merge_out").filter(col("user_id") === 2L).isEmpty,
        "merged session must stay open, not emit a split historical session")
      // an event > gap later closes it — verify the merged extent
      stream.addData(Sessionize.In(2L, new Timestamp(t0 + 10 * hour), "click"))
      q.processAllAvailable()
      val out = s.table("straggler_merge_out")
        .filter(col("user_id") === 2L).collect()
      assert(out.exists(r => r.getLong(1) == (t0 + 95 * min) * 1000
        && r.getLong(2) == (t0 + 3 * hour) * 1000 && r.getLong(3) == 3L),
        s"expected one merged session spanning the chain + open, got ${out.toSeq}")
    } finally q.stop()
  }

  test("streaming: gap closes a session in-batch; timeout closes the tail session") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val stream = MemoryStream[Sessionize.In]
    val withWm = stream.toDS().withWatermark("ts", "0 seconds")
    val q = Sessionize.sessions(withWm)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
      // burst 1: two events 10 min apart; then a >1h gap; burst 2 at +2h
      stream.addData(
        Sessionize.In(1L, new Timestamp(t0), "click"),
        Sessionize.In(1L, new Timestamp(t0 + 600 * 1000), "view"))
      q.processAllAvailable()
      stream.addData(Sessionize.In(1L, new Timestamp(t0 + 7200 * 1000), "purchase"))
      q.processAllAvailable()
      // the in-batch gap closed session 1 (2 events)
      val afterGap = s.table("sessions_out").collect()
      assert(afterGap.exists(r => r.getLong(0) == 1L && r.getLong(3) == 2L),
        s"expected closed 2-event session, got ${afterGap.toSeq}")
      // advance watermark far past the open session's timeout → flush
      stream.addData(Sessionize.In(2L, new Timestamp(t0 + 30L * 3600 * 1000), "click"))
      q.processAllAvailable()
      val afterTimeout = s.table("sessions_out").collect()
      assert(afterTimeout.exists(r => r.getLong(0) == 1L && r.getLong(3) == 1L),
        s"expected timeout-flushed 1-event session, got ${afterTimeout.toSeq}")
    } finally q.stop()
  }

  private val hourUs = 3600000000L

  private def evFixture(rows: (Long, Long)*) = {
    val s = spark
    import s.implicits._
    rows.zipWithIndex
      .map { case ((u, t), i) => (i.toLong, u, t, "click") }
      .toDF("event_id", "user_id", "tsu", "event_type")
  }

  test("peak concurrency: overlap counting, closed intervals, hour carry") {
    val out = Sessionization.peakConcurrencyCore(evFixture(
      (1L, 0L), (1L, 1000L),            // S[0,1000]
      (2L, 500L),                       // S[500,500] — overlaps u1 → peak 2
      (4L, 2000L), (4L, 3000L),         // S[2000,3000]
      (5L, 3000L),                      // S[3000,3000] — closed-interval touch
      (6L, hourUs - 100), (6L, hourUs + 100), // spans the hour boundary
      (7L, 3 * hourUs + 5)              // isolated, after an empty hour
    )).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (0L, 5L, 4L, 2L),  // five starts, peak 2 (u1+u2 at t=500, u4+u5 at 3000)
      (1L, 0L, 1L, 1L),  // no deltas but u6 still open → carry-in peak 1
      (2L, 0L, 0L, 0L),  // truly empty hour, spine-emitted
      (3L, 1L, 1L, 1L)))
  }

  test("session conversion: any-purchase flag, start-hour attribution, exact rate") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, 0L, "click"), (1L, 1000L, "purchase"),      // hour 0, converts
      (2L, 500L, "view"),                              // hour 0, no
      (3L, hourUs + 5, "purchase"),                    // hour 1, converts
      // straddles the boundary but STARTS in hour 0 → attributed there
      (4L, hourUs - 100, "click"), (4L, hourUs + 100, "purchase")
    ).zipWithIndex.map { case ((u, t, tp), i) => (i.toLong, u, t, tp) }
      .toDF("event_id", "user_id", "tsu", "event_type")
    val out = Sessionization.sessionConversionCore(rows)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((0L, 3L, 2L, 666666L), (1L, 1L, 1L, 1000000L)))
  }

  test("q188 attribution: U-shaped shares, middle-split truncation, " +
    "no credit without purchase or clicks") {
    val s = spark
    import s.implicits._
    val g = Sessionization.gapSeconds * 1000000L
    // all tsu inside hour 0 unless offset; purchase value 10.0 →
    // purchase_milli 10000 per purchasing session
    val rows = Seq(
      // user 1, one session: 1 click + purchase → 100% = 10000
      (1L, 1L, 10L, "click", 0.5),
      (2L, 1L, 20L, "purchase", 10.0),
      // user 2, one session: 5 clicks + purchase → shares
      // 400000, 66666, 66666, 66666, 400000 (middle pool 200000 div 3;
      // dust 2 ppm dropped) → credits 4000+666+666+666+4000 = 9998
      (3L, 2L, 10L, "click", 0.1), (4L, 2L, 20L, "click", 0.1),
      (5L, 2L, 30L, "click", 0.1), (6L, 2L, 40L, "click", 0.1),
      (7L, 2L, 50L, "click", 0.1),
      (8L, 2L, 60L, "purchase", 10.0),
      // user 3: clicks but NO purchase → zero credit rows
      (9L, 3L, 10L, "click", 0.1), (10L, 3L, 20L, "click", 0.1),
      // user 4: purchase with no clicks → drops out (no click rows)
      (11L, 4L, 10L, "purchase", 10.0),
      // user 2, SECOND session past the gap (lands in a later hour):
      // 2 clicks + purchase → 50/50 of 10000
      (12L, 2L, 2 * g + 10L, "click", 0.1),
      (13L, 2L, 2 * g + 20L, "click", 0.1),
      (14L, 2L, 2 * g + 30L, "purchase", 10.0))
    val out = Sessionization.attributionCore(
      rows.toDF("event_id", "user_id", "tsu", "event_type", "value"))
      .as[(Long, Long, Long)].collect().toSeq
    // hour 0: 1 + 5 credited clicks, 10000 + 9998; hour 2: the 50/50
    assert(out === Seq((0L, 6L, 19998L), (2L, 2L, 10000L)))
  }

  test("peak concurrency matches a brute-force sweep on real data") {
    val sess = Sessionization.sessions(spark, sf)
      .select("session_start_us", "session_end_us")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // brute force: global step function over ±1 deltas collapsed per
    // instant; per-hour peak includes the hour-start value
    val deltas = (sess.map(s0 => (s0._1, 1L)) ++ sess.map(s0 => (s0._2 + 1, -1L)))
      .groupBy(_._1).map { case (t, ds) => (t, ds.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    val h0 = deltas.map(_._1 / hourUs).min
    val h1 = deltas.map(_._1 / hourUs).max
    var cur = 0L
    val peaks = scala.collection.mutable.Map[Long, Long]()
    for (h <- h0 to h1) peaks(h) = 0L // will be raised by carry below
    var i = 0
    for (h <- h0 to h1) {
      var peak = cur // hour-start value
      while (i < deltas.length && deltas(i)._1 / hourUs == h) {
        cur += deltas(i)._2; if (cur > peak) peak = cur; i += 1
      }
      peaks(h) = peak
    }
    val got = Sessionization.peakConcurrency(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(got.keySet === (h0 to h1).toSet)
    for (h <- h0 to h1)
      assert(got(h) === peaks(h), s"hour $h: got ${got(h)} want ${peaks(h)}")
  }

  test("q274 interval union: overlap and abutment merge, gaps split, " +
    "coverage is union length not summed lengths") {
    import spark.implicits._
    val iv = Seq(
      // user 1: [0,10) ∪ [5,20) ∪ [20,30) merge (overlap, then
      // abutment); [40,50) is its own island
      (1L, 1L, 0L, 10L), (1L, 2L, 5L, 20L), (1L, 3L, 20L, 30L),
      (1L, 4L, 40L, 50L),
      // user 2: one interval
      (2L, 5L, 7L, 9L))
      .toDF("user_id", "event_id", "s", "e")
    val out = Sessionization.intervalUnionCore(iv).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq === Seq(
      (1L, 4L, 2L, 40L, 30L),
      (2L, 1L, 1L, 2L, 2L)))
  }

  test("q235: native session_window reproduces q27's sessions exactly " +
    "(bounds, counts, durations)") {
    val viaLag = Sessionization.sessions(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq.sorted
    val viaNative = Sessionization.sessionWindowNative(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq.sorted
    assert(viaNative === viaLag)
    assert(viaNative.nonEmpty)
  }
}
