package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic corpus sampling — the curation ops a training-data
  * pipeline runs before every mix change: stratified downsampling to a
  * per-language rate and a reproducible train/eval split.
  *
  * Randomness is CONTENT-FREE and SEED-STABLE: the decision for a doc is
  * a pure function of (doc_id, salt) via an md5 hex prefix, so the same
  * doc lands on the same side of every split on every run, on any
  * cluster layout — `df.sample()` (partition-RNG) cannot promise that,
  * and a promotion/re-partition would silently reshuffle the sample.
  * Rates quantize to 1/16ths (first hex nibble): coarse but portable —
  * the identical expression runs in any engine with md5, which is what
  * makes the result oracle-able bit-for-bit.
  *
  * 100 TB: one codegen'd projection + filter, no shuffle, no state; the
  * filter pushes nothing to the scan (the hash is computed per row) but
  * prunes to the projected columns only.
  */
object Sampling {

  /** First hex nibble of md5(doc_id || salt) as 0-15. */
  private def nibble(salt: String): Column =
    conv(substring(md5(concat(col("doc_id").cast("string"), lit(salt))
      .cast("binary")), 1, 1), 16, 10).cast("int")

  /** Per-language keep-rates in 16ths: en is the bulk language (downsample
    * hardest), zh is scarce (keep half), long-tail languages keep 2/16.
    */
  val rateSixteenths: Map[String, Int] = Map("en" -> 4, "zh" -> 8)
  val defaultSixteenths = 2

  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val threshold = rateSixteenths.foldLeft(lit(defaultSixteenths)) {
      case (acc, (lang, r)) => when(col("lang") === lang, r).otherwise(acc)
    }
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), nibble(":strat").as("h"))
      .filter(col("h") < threshold)
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  /** The 14/16-train / 2/16-eval assignment as a column over any frame
    * with `doc_id` — the single definition q59 and the q87
    * decontamination consumer both evaluate, so the two can never
    * disagree about which side a doc landed on.
    */
  private[graft] def splitExpr: Column =
    when(nibble(":split") < 14, "train").otherwise("eval")

  /** Deterministic 14/16 train, 2/16 eval assignment (salted separately
    * from the sampler so the two decisions are independent).
    */
  def trainEvalSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), splitExpr.as("split"))
      .orderBy("doc_id")

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q58_stratified_sample" -> (stratifiedSample(_, _)),
    "q59_train_eval_split" -> (trainEvalSplit(_, _)))

  val oracles: Map[String, String] = Map(
    // the identical md5-nibble rule re-evaluated by DuckDB (nibble value
    // via hex-alphabet strpos — no hex-literal cast dialect dependence)
    "q58_stratified_sample" ->
      """SELECT doc_id, lang FROM (
           SELECT doc_id, lang,
             strpos('0123456789abcdef',
               substr(md5(doc_id::VARCHAR || ':strat'), 1, 1)) - 1 AS h
           FROM documents)
         WHERE h < (CASE lang WHEN 'zh' THEN 8 WHEN 'en' THEN 4 ELSE 2 END)
         ORDER BY doc_id""",
    "q59_train_eval_split" ->
      """SELECT doc_id, lang,
           CASE WHEN strpos('0123456789abcdef',
             substr(md5(doc_id::VARCHAR || ':split'), 1, 1)) - 1 < 14
           THEN 'train' ELSE 'eval' END AS split
         FROM documents ORDER BY doc_id""")
}
