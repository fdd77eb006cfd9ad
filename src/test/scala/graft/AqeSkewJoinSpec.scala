package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join handling — the runtime half of the engine's skew story
  * (the static half, salting, is ops.Skew / q24). A hot join key that
  * would pin one reducer at 100 TB must be split at runtime by
  * OptimizeSkewedJoin; this pins that the engine's session config
  * actually lets AQE do it (thresholds here are lowered so a local-size
  * dataset trips the same code path a 100 TB key would).
  */
class AqeSkewJoinSpec extends AnyFunSuite with SparkTestBase {

  test("a hot key's sort-merge join partitions are split by OptimizeSkewedJoin") {
    val s = spark
    import s.implicits._
    val conf = s.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // key 0 carries 100k rows with a fat payload; 49 cold keys don't
      val hot = s.range(100000).select(lit(0L).as("k"),
        concat(lit("x" * 64), col("id").cast("string")).as("payload"))
      val cold = s.range(1, 50).select(col("id").as("k"),
        lit("c").as("payload"))
      val left = hot.unionByName(cold)
      val right = s.range(0, 50).select(col("id").as("k"), col("id").as("v"))

      val joined = left.join(right, "k")
      // collect() drives THIS dataset's own QueryExecution, so the
      // adaptive plan below is the final, post-execution one (count()
      // would plan and finalize a separate aggregate query)
      assert(joined.collect().length == 100000 + 49) // correctness first
      // AQE's FINAL plan must have split the hot partition: the SMJ
      // prints with `skew=true`
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"OptimizeSkewedJoin did not fire:\n${finalPlan.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
