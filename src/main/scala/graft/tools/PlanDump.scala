package graft.tools
import org.apache.spark.sql.SparkSession
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(1))(spark, args(0))
    df.count()  // materialize so AQE finalizes
    println("=== FINAL PLAN ===")
    println(df.queryExecution.executedPlan.toString.linesIterator
      .map(_.take(160)).mkString("\n"))
    spark.stop()
  }
}
