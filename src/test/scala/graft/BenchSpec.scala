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
