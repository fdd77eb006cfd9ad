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
}
