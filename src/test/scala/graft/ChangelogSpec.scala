package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Changelog

/** Semantics pins for the CDC merge (q135): all four MERGE paths —
  * untouched base row, delta update, delta insert (key unknown to the
  * snapshot), tombstone delete — plus the latest-wins compaction rule
  * on a hand-computed fixture. The cutoff is the data-derived midpoint
  * (min+max)/2, so fixtures place timestamps symmetrically around it.
  */
class ChangelogSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // tsu range 0..1000 → cutoff 500
  private def ev(rows: (Long, Long, Long, String, Double)*) =
    rows.map { case (id, u, t, tp, v) => (id, u, t, tp, v) }
      .toDF("event_id", "user_id", "tsu", "event_type", "value")

  test("merge covers base-passthrough, update, insert and delete paths") {
    val out = Changelog.mergeCore(ev(
      (0L, 0L, 0L, "view", 1.0),       // pins cutoff low end
      (99L, 99L, 1000L, "view", 9.0),  // pins cutoff high end (insert)
      // user 1: base only → passes through untouched
      (1L, 1L, 100L, "click", 2.0),
      // user 2: base then an upsert delta → delta wins
      (2L, 2L, 200L, "view", 3.0), (3L, 2L, 600L, "purchase", 4.0),
      // user 3: base then a tombstone → key leaves the table
      (4L, 3L, 300L, "click", 5.0), (5L, 3L, 700L, "error", 6.0),
      // user 4: delta-only tombstone → delete of unknown key is a no-op
      (6L, 4L, 800L, "error", 7.0)
    )).select("user_id", "state", "val", "src")
      .as[(Long, String, Double, String)].collect().sortBy(_._1)
    assert(out.toSeq === Seq(
      (0L, "view", 1.0, "base"),
      (1L, "click", 2.0, "base"),
      (2L, "purchase", 4.0, "merged"),
      (99L, "view", 9.0, "merged")))
  }

  test("latest-wins compaction: only the last delta per key applies") {
    val out = Changelog.mergeCore(ev(
      (0L, 0L, 0L, "view", 1.0),
      (9L, 9L, 1000L, "view", 1.0),
      // user 1: tombstone then a LATER re-insert → key survives with
      // the re-inserted state (the delete must not shadow it)
      (1L, 1L, 600L, "error", 2.0), (2L, 1L, 700L, "click", 3.0),
      // user 2: upsert then a LATER tombstone → key deleted
      (3L, 2L, 600L, "click", 4.0), (4L, 2L, 800L, "error", 5.0),
      // user 3: two upserts same tsu → higher event_id wins
      (5L, 3L, 600L, "click", 6.0), (6L, 3L, 600L, "view", 7.0)
    )).select("user_id", "state", "val", "updated_us")
      .as[(Long, String, Double, Long)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2, r._3)).toSeq === Seq(
      (0L, "view", 1.0), (1L, "click", 3.0), (3L, "view", 7.0),
      (9L, "view", 1.0)))
    assert(out.find(_._1 == 3L).get._4 === 600L)
  }

  // q174 fixture: tsu placed on day boundaries (U = µs/day); min tsu 0
  // and max 4U pin the cutoff to exactly 2U, so days 0-1 are base and
  // days 2+ are inserts. Deleted base rows are event_id ≡ 0 (mod 13).
  private val U = Changelog.usPerDay

  test("retractable rollup: deletes retract sums, force min recompute, " +
    "empty a group, and never touch inserts") {
    val out = Changelog.retractCore(Seq(
      // (view, day0): id 13 deleted — it held the group MIN, so the
      // maintained extrema must come from the group-scoped rescan
      (1L, "view", 0L, 5.0),
      (13L, "view", 20L, 1.0),
      (2L, "view", 30L, 9.0),
      // (view, day1): untouched base group → stored extrema survive
      (3L, "view", U + 10L, 2.0),
      // (click, day0): its only row deleted → the group disappears
      (26L, "click", 40L, 3.0),
      // inserts (day2): id 39 ≡ 0 (mod 13) but the purge targets the
      // BASE only — inserts must survive regardless of id
      (4L, "view", 2 * U + 5L, 7.0),
      (39L, "view", 2 * U + 10L, 6.0),
      // (purchase, day4): insert-only group; pins the cutoff high end
      (5L, "purchase", 4 * U, 8.0)
    ).toDF("event_id", "event_type", "tsu", "value"))
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq
    assert(out === Seq(
      ("purchase", 4L, 1L, 8.0, 8.0, 8.0),
      ("view", 0L, 2L, 14.0, 5.0, 9.0),
      ("view", 1L, 1L, 2.0, 2.0, 2.0),
      ("view", 2L, 2L, 13.0, 6.0, 7.0)))
  }

  // q183 fixture: shipdate micros 0..1000 → cutoff 500. Order keys are
  // multiples of viewStride (20) so they pass the audit filter; key 7
  // pins that non-stride orders are excluded from the dump (not the
  // view).
  test("join-view maintenance: stored+delta merge covers base-only, " +
    "delta-only and straddling orders with exact cents") {
    val orders = Seq((20L, "1-URGENT"), (40L, "2-HIGH"), (60L, "3-MEDIUM"),
      (7L, "4-LOW")).toDF("o_orderkey", "o_orderpriority")
    val li = Seq(
      // order 20: base only (su 0 pins the cutoff low end); cents =
      // floor(10.00·(1−0.1)·100) = 900 and floor(19.99·100) = 1998 —
      // double(19.99)·100 is 1998.999…, and floor is the point: both
      // engines truncate the SAME double, so the value is portable
      // even where the decimal intuition (1999) is not
      (20L, 10.0, 0.1, 0L),
      (20L, 19.99, 0.0, 100L),
      // order 40: one base + one delta row → 'both'
      (40L, 5.0, 0.0, 200L), (40L, 7.5, 0.2, 900L),
      // order 60: delta only (su 1000 pins the high end)
      (60L, 1.0, 0.0, 1000L),
      // order 7: in the view but filtered from the audit dump
      (7L, 2.0, 0.0, 300L)
    ).toDF("l_orderkey", "l_extendedprice", "l_discount", "su")
      .withColumn("l_shipdate", org.apache.spark.sql.functions
        .timestamp_micros(org.apache.spark.sql.functions.col("su")))
    val out = Changelog.joinViewCore(orders, li)
      .as[(Long, String, Long, Long, String)].collect().toSeq
    assert(out === Seq(
      (20L, "1-URGENT", 2L, 900L + 1998L, "base"),
      (40L, "2-HIGH", 2L, 500L + 600L, "both"),
      (60L, "3-MEDIUM", 1L, 100L, "delta")))
  }
}
