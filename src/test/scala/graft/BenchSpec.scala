package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's self-defense inputs. The baseline-compare trigger
  * and the end-of-run revisit are only as real as the parsed baseline
  * table — r13 shipped an anchored-regex parser that silently read the
  * repo's actual four-column table as EMPTY, leaving both defenses
  * inert for a full round record. This spec runs the parser against
  * the real BASELINE.md, so a table-format drift (or a parser
  * regression) fails the build instead of quietly disarming the gate.
  */
class BenchSpec extends AnyFunSuite {

  test("baseline parser: four-column rows, header/separator noise, " +
    "non-query rows skipped") {
    val lines = Seq(
      "| query | warm s | cold s | load |",
      "|---|---|---|---|",
      "| q01_pricing_summary | 1.18 | 4.52 | 0.5 |",
      "| q194_streaming_sliding_counts | 3.97 | 15.46 | 1.2 |",
      "prose mentioning q42 outside a table",
      "| not_a_query | 9.99 | 9.99 | 9.99 |").iterator
    val m = Bench.parseBaselineFrom(lines)
    assert(m === Map(
      "q01_pricing_summary" -> 1.18,
      "q194_streaming_sliding_counts" -> 3.97))
  }

  test("queries-map parser: scoped to the queries object, not the " +
    "loadavg/cold/rep maps; failed entries dropped") {
    val rec = """{"metric":"total","load_1m":{"q01_a":0.03,"q02_b":8.10},""" +
      """"rep_times":{"q01_a":[1.2,1.1],"q02_b":[2.0]},""" +
      """"cold":{"q01_a":4.0,"q02_b":9.0},""" +
      """"queries":{"q01_a":1.10,"q02_b":-1.0},"failed":1,"value":1.1}"""
    assert(Bench.parseQueriesMap(rec) === Map("q01_a" -> 1.10))
  }

  test("cross-history provisional flag: replaying the r14 re-record " +
    "against the other committed records flags exactly the image band") {
    // the history the re-record SHOULD have been checked against: the
    // records that EXISTED at r14 time (r14 verdict task 2). Stated as
    // an include-list, not an exclude-list: every later round commits
    // new records that legitimately lower some query's all-time best,
    // which would anachronistically widen the r14-era flag set this
    // spec pins (first q100/q194 via r15final, then q100 via r15full —
    // an exclude-list breaks on every such commit)
    val r14Era = Set(
      "BENCH.local.20260815-164344.json",
      "BENCH.local.20260815-223120.json",
      "BENCH.local.20260816-060558.json",
      "BENCH.local.r12contended.json",
      "BENCH.local.r13final.json",
      "BENCH.local.r13quiet.json")
    val allRecords = Option(new java.io.File(".").listFiles())
      .getOrElse(Array.empty[java.io.File]).map(_.getName)
      .filter(n => n.startsWith("BENCH.local") && n.endsWith(".json"))
      .toSet
    val hist = Bench.historicalBest(new java.io.File("."),
      exclude = allRecords -- r14Era)
    assert(hist.size >= 290, s"historical best covers only ${hist.size}")
    // the contaminated record under test
    val src = scala.io.Source.fromFile("BENCH.local.r14rerecord.json")
    val rerecord = try Bench.parseQueriesMap(src.mkString) finally src.close()
    assert(rerecord.size >= 290)
    val flagged = Bench.provisionalRows(rerecord, hist)
    // exactly the four rows the r14 verdict adjudicated as re-measured
    // inside the bench's own streaming wake — and NOT the 2.0–2.2x
    // jitter tail (q06/q14/q20/q136), which the 2.5x threshold exists
    // to spare (rationale at Bench.histRatio)
    assert(flagged === Seq("q206_image_phash_dups", "q82_frame_samples",
      "q84_image_decode", "q86_image_resize"))
  }

  test("provisional flag: sub-0.3s jitter and history-less new queries " +
    "are exempt; the boundary bites just past 2.5x") {
    val hist = Map("q1_x" -> 0.05, "q2_y" -> 1.0)
    // 0.29 s is 5.8x its best but under the jitter floor; q3 has no
    // committed history to compare against; 2.4 < 2.5x
    assert(Bench.provisionalRows(
      Map("q1_x" -> 0.29, "q2_y" -> 2.4, "q3_new" -> 50.0), hist).isEmpty)
    assert(Bench.provisionalRows(Map("q2_y" -> 2.6), hist) === Seq("q2_y"))
  }

  test("the repo's actual BASELINE.md parses into a near-full per-query map") {
    val src = scala.io.Source.fromFile("BASELINE.md")
    val m = try Bench.parseBaselineFrom(src.getLines()) finally src.close()
    // 291 entries at the r12 re-record; the floor guards against the
    // silent-empty failure mode without pinning the exact count as the
    // surface grows
    assert(m.size >= 290, s"parsed only ${m.size} baseline entries")
    assert(m.get("q01_pricing_summary").exists(_ > 0.0))
    // every parsed entry must cover a registered query (catches table
    // rows drifting out of sync with renames)
    val registered = SparkEntry.queries.keySet
    val stale = m.keySet.diff(registered)
    assert(stale.isEmpty, s"baseline rows for unregistered queries: $stale")
  }
}
