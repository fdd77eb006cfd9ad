package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only phase timer for the HITS pair: edge build vs iteration. */
object HitsProbe {
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
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (rep <- 1 to 2) {
      println(s"[probe] === rep $rep")
      val eb = t("edge build+checkpoint") {
        graft.Tables.lineitem(spark, dir)
          .join(graft.Tables.orders(spark, dir),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("src"), col("l_partkey").as("dst"))
          .distinct().localCheckpoint(true)
      }
      println(s"[probe] edges=${eb.count()}")
      val nParts = spark.sessionState.conf.numShufflePartitions
      val bySrc = t("bySrc repart+ckpt") {
        eb.repartition(nParts, col("src")).localCheckpoint(true) }
      val byDst = t("byDst repart+ckpt") {
        eb.repartition(nParts, col("dst")).localCheckpoint(true) }
      var hub = t("hub init") {
        eb.select(col("src")).distinct()
          .withColumn("h", lit(1.0)).localCheckpoint(true) }
      var auth = hub.limit(0).select(col("src").as("dst"), col("h").as("a"))
      for (i <- 1 to 4) {
        auth = t(s"round$i auth") {
          bySrc.join(hub.hint("SHUFFLE_HASH"), "src").groupBy("dst")
            .agg(sum("h").as("a")).localCheckpoint(true) }
        hub = t(s"round$i hub") {
          byDst.join(auth.hint("SHUFFLE_HASH"), "dst").groupBy("src")
            .agg(sum("a").as("h")).localCheckpoint(true) }
      }
      // lazy-checkpoint variant: rounds fuse into the final count
      var hub2 = eb.select(col("src")).distinct()
        .withColumn("h", lit(1.0)).localCheckpoint(true)
      var auth2 = hub2.limit(0).select(col("src").as("dst"), col("h").as("a"))
      t("8 lazy rounds + count") {
        for (_ <- 1 to 4) {
          auth2 = bySrc.join(hub2.hint("SHUFFLE_HASH"), "src").groupBy("dst")
            .agg(sum("h").as("a")).localCheckpoint(false)
          hub2 = byDst.join(auth2.hint("SHUFFLE_HASH"), "dst").groupBy("src")
            .agg(sum("a").as("h")).localCheckpoint(false)
        }
        println(s"[probe] hub2=${hub2.count()}")
      }
      // plain SMJ per-round variant (the pre-r17 shape)
      var hub3 = eb.select(col("src")).distinct()
        .withColumn("h", lit(1.0)).localCheckpoint(true)
      var auth3 = hub3.limit(0).select(col("src").as("dst"), col("h").as("a"))
      t("4 orig rounds (edges smj, eager ckpt)") {
        for (_ <- 1 to 4) {
          auth3 = eb.join(hub3, "src").groupBy("dst")
            .agg(sum("h").as("a")).localCheckpoint(true)
          hub3 = eb.join(auth3, "dst").groupBy("src")
            .agg(sum("a").as("h")).localCheckpoint(true)
        }
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
