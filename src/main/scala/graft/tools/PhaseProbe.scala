package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: split a registered query's wall into Catalyst phases —
  * build (DataFrame construction incl. any eager work in the builder),
  * optimize (analysis + logical optimization), plan (physical
  * planning), exec (the noop write, which re-runs planning only if the
  * builder returned a fresh df). Repeats `reps` times; rep 1 pays
  * codegen + JIT.
  *
  * Usage: runMain graft.tools.PhaseProbe <sfDir> <reps> q... q...
  */
object PhaseProbe {
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
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](body: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = body
      ((System.nanoTime() - t0) / 1e9, a)
    }
    for (r <- 1 to reps; name <- names) {
      val (tb, df) = t(graft.SparkEntry.queries(name)(spark, sfDir))
      val (to, _) = t(df.queryExecution.optimizedPlan)
      val (tp, _) = t(df.queryExecution.executedPlan)
      val (te, _) = t(df.write.format("noop").mode("overwrite").save())
      println(f"[phase] rep$r $name build=$tb%.2f opt=$to%.2f plan=$tp%.2f exec=$te%.2f total=${tb + to + tp + te}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
