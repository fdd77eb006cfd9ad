package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage timing of the q257 PPJoin pipeline at a
  * given SF dir — identifies which phase carries the wall clock.
  * Usage: runMain graft.tools.PpjoinProbe /root/testdata/sf0.1
  */
object PpjoinProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    for (rep <- 1 to 2) {
      println(s"[probe] --- rep $rep ---")
      val thetaPpm = 500000L
      val shRows = t("shingles") {
        graft.ops.Dedup.ppjoinShingleProbe(spark, dir).localCheckpoint(true)
      }
      val rows = shRows.repartition(col("sh"))
      val df = rows.groupBy("sh").agg(count(lit(1)).as("df"))
      val docs = t("docs(sort+prefix)") {
        rows.join(df, "sh")
          .groupBy("doc_id")
          .agg(expr("transform(sort_array(collect_list(struct(df, sh))), x -> x.sh)")
            .as("shs"))
          .withColumn("n", size(col("shs")).cast("long"))
          .withColumn("prefix",
            expr(s"slice(shs, 1, cast(n - ((n * $thetaPpm + 999999) div 1000000) + 1 as int))"))
          .repartition(col("doc_id"))
          .localCheckpoint(true)
      }
      val pref = docs.select(col("doc_id"), col("n"),
          posexplode(col("prefix")).as(Seq("i0", "sh")))
        .withColumn("i", (col("i0") + 1).cast("long")).drop("i0")
        .repartition(col("sh"))
      val alpha = expr(s"($thetaPpm * (a.n + b.n) + ${1000000L + thetaPpm} - 1) " +
        s"div ${1000000L + thetaPpm}")
      val cand = t("candidates") {
        pref.as("a").join(pref.as("b"),
            col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id")
              && least(col("a.n"), col("b.n")) * 1000000L
                 >= lit(thetaPpm) * greatest(col("a.n"), col("b.n"))
              && (lit(1L) + least(col("a.n") - col("a.i"), col("b.n") - col("b.i")))
                 >= alpha)
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct().localCheckpoint(true)
      }
      println(s"[probe] n_cand = ${cand.count()}")
      val out = t("verify") {
        cand
          .join(docs.select(col("doc_id").as("doc_a"), col("shs").as("a_shs"),
            col("n").as("n_a")), "doc_a")
          .join(docs.select(col("doc_id").as("doc_b"), col("shs").as("b_shs"),
            col("n").as("n_b")), "doc_b")
          .withColumn("n_common",
            size(array_intersect(col("a_shs"), col("b_shs"))).cast("long"))
          .withColumn("jac_ppm",
            expr("n_common * 1000000 div (n_a + n_b - n_common)"))
          .filter(col("jac_ppm") >= thetaPpm)
          .count()
      }
      println(s"[probe] n_out = $out")
    }
    spark.stop()
  }
}
