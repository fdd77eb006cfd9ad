package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.EnergyPipeline

/** Energy-pipeline semantics (hot/spark_energy.py:60-94):
  * count preservation through bucketization, the 0.37/0.63 formula,
  * percent_rank edge cases, timeline ordering.
  */
class EnergySpec extends AnyFunSuite with SparkTestBase {

  test("bucketization preserves total event count (Σ density = rows)") {
    val events = Tables.events(spark, sf).filter(col("ts").isNotNull).count()
    val sumDensity = EnergyPipeline.buckets(spark, sf)
      .agg(sum("density")).collect()(0).getLong(0)
    assert(sumDensity == events)
  }

  test("energy = 0.37*sentiment + 0.63*density for every bucket") {
    val bad = EnergyPipeline.buckets(spark, sf)
      .filter(abs(col("energy") - (col("sentiment") * 0.37 + col("density") * 0.63)) > 1e-12)
      .count()
    assert(bad == 0)
  }

  test("percent_rank: min 0.0 per user, range [0,1], ties share a rank") {
    val r = EnergyPipeline.ranked(spark, sf)
    val perUser = r.groupBy("user_id")
      .agg(min("rank_pct").as("lo"), max("rank_pct").as("hi"))
      .collect()
    perUser.foreach { row =>
      assert(row.getDouble(1) == 0.0, s"min rank_pct must be 0.0: $row")
      // max is 1.0 only when the top energy is untied — (rank-1)/(n-1)
      // gives the whole tie group the same, lower value
      assert(row.getDouble(2) >= 0.0 && row.getDouble(2) <= 1.0)
    }
    // equal energy within a user ⇒ equal rank_pct (ANSI tie semantics)
    val tieViolations = r.groupBy("user_id", "energy")
      .agg(countDistinct("rank_pct").as("nr"))
      .filter(col("nr") > 1).count()
    assert(tieViolations == 0)
  }

  test("highlights are exactly the rank_pct >= 0.9 buckets") {
    val r = EnergyPipeline.ranked(spark, sf)
    val mismatched = r.filter(col("is_high") =!= (col("rank_pct") >= 0.9)).count()
    assert(mismatched == 0)
    // and some exist at this sf
    assert(r.filter(col("is_high")).count() > 0)
  }

  test("timeline arrays are bucket-ordered (explicit sort_array, not shuffle luck)") {
    val rows = EnergyPipeline.timeline(spark, sf).collect()
    rows.foreach { row =>
      val buckets = row.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(0))
      assert(buckets == buckets.sorted, s"unsorted timeline for user ${row.get(0)}")
    }
  }

  test("timeline covers every user exactly once with all its buckets") {
    val nUsers = EnergyPipeline.buckets(spark, sf).select("user_id").distinct().count()
    val t = EnergyPipeline.timeline(spark, sf)
    assert(t.count() == nUsers)
    val totalPoints = t.select(sum(size(col("timeline")))).collect()(0).getLong(0)
    assert(totalPoints == EnergyPipeline.buckets(spark, sf).count())
  }
}
