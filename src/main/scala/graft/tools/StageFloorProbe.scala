package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: measure the per-exchange-stage machinery floor in local
  * mode (job scheduling + AQE stage re-planning + shuffle setup) by
  * timing a chain of K forced shuffles over a trivially small frame.
  * The data volume is ~constant and tiny, so wall(K) is ≈ intercept +
  * K * per-stage-constant — the number that bounds every multi-stage
  * query at sf0.1 regardless of plan quality. Run twice (rep 1 pays
  * codegen); read rep 2+.
  *
  * Usage: runMain graft.tools.StageFloorProbe [maxK] [reps]
  */
object StageFloorProbe {
  def main(args: Array[String]): Unit = {
    val maxK = if (args.nonEmpty) args(0).toInt else 10
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def chain(k: Int) = {
      // each round regroups under a different derived key → k genuine
      // exchanges, none elidable; 10k rows so task compute is ~nil
      var df = spark.range(10000).select((col("id") % 97).as("k0"))
      for (i <- 1 to k)
        df = df.groupBy((col(s"k${i - 1}") % 89 + i).as(s"k$i"))
          .agg(count(lit(1)).as(s"c$i"))
          .select(s"k$i")
      df
    }
    for (r <- 1 to reps; k <- 1 to maxK) {
      val t0 = System.nanoTime()
      chain(k).write.format("noop").mode("overwrite").save()
      println(f"[floor] rep$r k=$k%2d ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
