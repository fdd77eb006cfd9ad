package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev harness: time registered queries by name at a given sf dir, with
  * per-stage wall/task breakdown (set STAGES=1) to spot single-task
  * stages and runaway task time.
  * Usage: runMain graft.tools.TimeQuery <sfDir> <reps> <name> [name...]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val showStages = sys.env.get("STAGES").contains("1")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        val taskSec = si.taskMetrics.executorRunTime / 1e3
        stages.add(
          f"[stage] ${si.stageId}%4d tasks=${si.numTasks}%4d wall=$wall%6.2f s " +
            f"taskTime=$taskSec%7.2f s  ${si.name.take(80)}")
      }
    })
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      for (r <- 1 to reps) {
        stages.clear()
        val t0 = System.nanoTime()
        // noop sink — same rule as graft.Bench (count() lets Catalyst
        // prune projection-only compute and drop presentation sorts)
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        println(f"[time] $n rep$r ${(System.nanoTime() - t0) / 1e9}%.2f s")
        if (showStages && r == reps) {
          Thread.sleep(200) // let listener drain
          stages.forEach(s => println(s))
        }
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
