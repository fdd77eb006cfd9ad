package graft.tools
import org.apache.spark.sql.SparkSession
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(1))(spark, args(0))
    // materialize THIS frame's own QueryExecution (count() would spawn
    // a separate one and leave the printed plan isFinalPlan=false)
    df.collect()
    println("=== FINAL PLAN ===")
    println(df.queryExecution.executedPlan.toString.linesIterator
      .map(_.take(160)).mkString("\n"))
    spark.stop()
  }
}
