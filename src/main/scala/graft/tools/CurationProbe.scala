package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only phase timer for the q311 curation chain. */
object CurationProbe {
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
      val docs = t("docs checkpoint") {
        graft.Tables.spread(graft.Tables.documents(spark, dir))
          .filter(col("text").isNotNull)
          .select("doc_id", "lang", "text")
          .localCheckpoint(true) }
      val nonReps = t("clusterAssignments (exact+jaccard+CC)") {
        val x = graft.ops.Dedup.clusterAssignmentsCore(docs)
          .filter(col("doc_id") =!= col("cluster")).select("doc_id")
        x.write.format("noop").mode("overwrite").save(); x }
      val gopherKeep = t("gopherRules") {
        val x = graft.ops.TextAnalysis.gopherRulesCore(docs)
          .filter(col("keep")).select("doc_id")
        x.write.format("noop").mode("overwrite").save(); x }
      val contaminated = t("ngramContamination") {
        val x = graft.ops.Dedup.ngramContaminationCore(docs).select("doc_id")
        x.write.format("noop").mode("overwrite").save(); x }
      val pre = t("pre join+checkpoint") {
        docs.join(nonReps, Seq("doc_id"), "left_anti")
          .join(gopherKeep, Seq("doc_id"), "left_semi")
          .filter(col("doc_id") % graft.ops.Dedup.benchMod =!= 0)
          .join(contaminated, Seq("doc_id"), "left_anti")
          .localCheckpoint(true) }
      t("gopherRepetition on pre") {
        graft.ops.TextAnalysis.gopherRepetitionCore(pre)
          .filter(col("keep")).select("doc_id")
          .write.format("noop").mode("overwrite").save() }
      t("dsirImportance on docs") {
        graft.ops.Quality.dsirImportanceCore(docs)
          .select("doc_id", "n_tok", "lr_mean_ppm")
          .write.format("noop").mode("overwrite").save() }
      t("full q311") {
        graft.SparkEntry.queries("q311_curation_scored")(spark, dir)
          .write.format("noop").mode("overwrite").save() }
      t("full q332") {
        graft.SparkEntry.queries("q332_manifest_sample")(spark, dir)
          .write.format("noop").mode("overwrite").save() }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
