package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time a subset of registered queries by name.
  * Usage: runMain graft.TimeQueries <sfDir> <reps> q52_jaccard_pairs ...
  * Prints per-query seconds for each rep (first rep includes codegen/JIT
  * warmup — compare later reps).
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (r <- 1 to reps; name <- names) {
      val t0 = System.nanoTime()
      // noop sink — same rule as graft.Bench (count() lets Catalyst
      // prune projection-only compute and drop presentation sorts)
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[time] rep$r $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // same hygiene as graft.Bench: a query's leaked cache/checkpoint
      // blocks must not bill (or subsidize) later measurements
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
