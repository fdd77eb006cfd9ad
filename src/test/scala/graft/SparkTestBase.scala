package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite (JVM startup is ~5 s;
  * per-suite sessions would dominate test wall time).
  */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // static conf — must be set before session creation; keeps
      // saveAsTable fixtures (BucketingSpec) out of the repo tree
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_warehouse_").toString)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkTestBase {
  lazy val spark: SparkSession = SparkTestBase.spark
  /** Smallest driver-generated scale factor — correctness fixtures. */
  val sf = "/root/testdata/sf0.001"
}
