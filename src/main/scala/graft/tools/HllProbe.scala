package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: where do q14's seconds go — HLL precision, the distinct
  * rewrite, or the combination?
  */
object HllProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.Tables.events(spark, dir)
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    for (rep <- 1 to 2) {
      println(s"[probe] === rep $rep")
      t("exact only") {
        ev.groupBy("event_type").agg(countDistinct("user_id").as("n"))
          .write.format("noop").mode("overwrite").save() }
      t("hll 0.05 only") {
        ev.groupBy("event_type").agg(approx_count_distinct("user_id").as("n"))
          .write.format("noop").mode("overwrite").save() }
      t("hll 0.01 only") {
        ev.groupBy("event_type").agg(approx_count_distinct("user_id", 0.01).as("n"))
          .write.format("noop").mode("overwrite").save() }
      t("exact + hll 0.01") {
        ev.groupBy("event_type").agg(countDistinct("user_id").as("n"),
            approx_count_distinct("user_id", 0.01).as("a"))
          .write.format("noop").mode("overwrite").save() }
      t("exact + hll 0.02") {
        ev.groupBy("event_type").agg(countDistinct("user_id").as("n"),
            approx_count_distinct("user_id", 0.02).as("a"))
          .write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
