package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.GlobalIndex

/** Pins for the two-phase global row numbering (q182): the assigned
  * ordinals must equal the rank in the total (l_orderkey, l_linenumber)
  * order for an adversarially shuffled, skewed fixture, and the plan
  * must contain NO global sort — the whole reason the two-phase shape
  * exists is that `row_number() OVER (ORDER BY …)` would collapse the
  * table into one task.
  */
class GlobalIndexSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // 1..997 as (orderkey = v/4, linenumber = v%4) in a hash-scrambled
  // order: many duplicate orderkeys (4 lines each), no natural input
  // ordering for the range partitioner to get lucky with.
  private val n = 997
  private val fixture = (1 to n)
    .sortBy(v => (v * 2654435761L) % 1000003)
    .map(v => (v.toLong / 4, v % 4))
    .toDF("l_orderkey", "l_linenumber")
    .repartition(7)

  test("ordinals equal the rank in the total order, 1..n consecutive") {
    val got = GlobalIndex.numberedAll(fixture)
      .as[(Long, Int, Long)].collect().sortBy(_._3)
    assert(got.length === n)
    assert(got.map(_._3).toSeq === (1L to n.toLong))
    val expected = (1 to n).map(v => (v.toLong / 4, v % 4))
      .sortBy(identity)
    assert(got.map(r => (r._1, r._2)).toSeq === expected)
  }

  test("q246 percentile_cont equals a driver-side sort-and-interpolate " +
      "replica at the small sf") {
    val got = GlobalIndex.percentileCont(spark, sf).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val vs = graft.Tables.lineitem(spark, sf)
      .select(org.apache.spark.sql.functions.col("l_extendedprice")
        .cast("double")).collect().map(_.getDouble(0)).sorted
    val want = GlobalIndex.pcontPs.map { p =>
      val pos = p * (vs.length - 1) // 0-indexed
      val lo = vs(math.floor(pos).toInt)
      val hi = vs(math.ceil(pos).toInt)
      p -> BigDecimal(lo + (pos - math.floor(pos)) * (hi - lo))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (p, w) =>
      assert(math.abs(got(p) - w) < 1e-9, s"p=$p: got ${got(p)}, want $w")
    }
  }

  test("the plan has no global sort of the data path") {
    val plan = GlobalIndex.numberedAll(fixture)
      .queryExecution.executedPlan.toString
    // a rendered global sort is `Sort [keys], true, 0`; the only one
    // permitted is the offsets prefix-sum window over the
    // one-row-per-partition side frame (which never carries the data
    // columns). Any global sort mentioning the key columns means the
    // numbering degenerated into the single-task window shape.
    val dataGlobalSort = "Sort \\[[^\\]]*l_orderkey[^\\]]*\\], true".r
    assert(dataGlobalSort.findFirstIn(plan).isEmpty,
      s"two-phase numbering must not globally sort the data path:\n$plan")
  }

  // ── prefixSummedBy (the q218 cumulative-sum sibling) ──────────────

  // unique sort key (v), two summed columns with different shapes:
  // a constant-ish count and a signed value, scrambled like above
  private val psFixture = (1 to n)
    .sortBy(v => (v * 2654435761L) % 1000003)
    .map(v => (v.toLong, (v % 5).toLong, (v % 7).toLong - 3L))
    .toDF("v", "c1", "c2")
    .repartition(7)

  test("prefixSummedBy: cumulative and total sums equal a driver-side " +
    "scan over the sorted fixture") {
    val got = GlobalIndex.prefixSummedBy(psFixture, Seq("v"), Seq("c1", "c2"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.length === n)
    var (r1, r2) = (0L, 0L)
    val want = (1 to n).map { v =>
      val (c1, c2) = ((v % 5).toLong, (v % 7).toLong - 3L)
      r1 += c1; r2 += c2
      (v.toLong, c1, c2, r1, r2)
    }
    assert(got.map(r => (r._1, r._2, r._3, r._4, r._6)).toSeq === want)
    // grand totals identical on every row, equal to the final running sum
    assert(got.map(_._5).distinct.toSeq === Seq(r1))
    assert(got.map(_._7).distinct.toSeq === Seq(r2))
  }

  test("prefixSummedBy: no global sort of the data path (the ADVICE " +
    "single-partition-window fix this helper exists for)") {
    val plan = GlobalIndex.prefixSummedBy(psFixture, Seq("v"), Seq("c1", "c2"))
      .queryExecution.executedPlan.toString
    val dataGlobalSort = "Sort \\[[^\\]]*\\bv#[^\\]]*\\], true".r
    assert(dataGlobalSort.findFirstIn(plan).isEmpty,
      s"two-phase prefix sum must not globally sort the data path:\n$plan")
  }

  test("two-phase kernels are deterministic on AGG-FED inputs (the " +
    "round-11 q238 regression: pid from a sampled range exchange read " +
    "by two non-reusable consumers gave a different wrong rank sum " +
    "per run)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // an agg output's row order is execution-dependent — exactly the
    // input class that exposed the bug (five runs, five wrong totals)
    val grain = spark.range(4001)
      .select((pmod(xxhash64(col("id")), lit(977)).cast("double") / 10)
        .as("value"))
      .groupBy("value").agg(count(lit(1)).as("cnt"))
    val ref = grain
      .withColumn("cum", sum("cnt").over(Window.orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)))
      .agg(sum(expr("cum * cnt"))).head.getLong(0)
    val runs = (1 to 3).map { _ =>
      GlobalIndex.prefixSummedBy(grain, Seq("value"), Seq("cnt"))
        .agg(sum(expr("cum_cnt * cnt"))).head.getLong(0)
    }
    assert(runs.distinct === Seq(ref),
      s"nondeterministic or wrong prefix sums: $runs vs ref $ref")
    val rnRuns = (1 to 3).map { _ =>
      GlobalIndex.numberedBy(grain, Seq("value"))
        .agg(sum(expr("rn * rn"))).head.getLong(0)
    }
    assert(rnRuns.distinct.length === 1 && rnRuns.head > 0,
      s"nondeterministic numbering: $rnRuns")
  }
}
