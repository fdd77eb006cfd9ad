package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.ml.fpm.FPGrowth
import graft.Tables
import graft.expr.Lexicon

/** Frequent-itemset / association-rule mining — the reference's tag
  * pipeline (tag/main.py:187-194: pyspark.ml.fpm.FPGrowth,
  * minSupport=0.05, minConfidence=0.3), Scala-native via
  * org.apache.spark.ml.fpm.FPGrowth. Transactions are the per-document
  * entity sets (the `tags_arr` analog; tag/main.py:55 builds its
  * transactions the same way: split → array column).
  *
  * FP-Growth is inherently multi-job (item frequency count → per-
  * partition FP-tree → conditional-tree mining, shuffled by suffix);
  * that structure is the library's, and it parallelizes by transaction
  * partition — no driver materialization of the transaction set.
  */
object TagMining {

  val minSupport = 0.05
  val minConfidence = 0.3

  /** Per-doc transaction: deduped, sorted entity array (non-empty). */
  def transactions(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        sort_array(Lexicon.extractEntities(col("text"))).as("items"))
      .filter(size(col("items")) > 0)

  private def fit(spark: SparkSession, dir: String) =
    new FPGrowth()
      .setItemsCol("items")
      .setMinSupport(minSupport)
      .setMinConfidence(minConfidence)
      .fit(transactions(spark, dir))

  /** Frequent itemsets (items sorted for canonical form, rows totally
    * ordered for determinism).
    */
  def freqItemsets(spark: SparkSession, dir: String): DataFrame =
    fit(spark, dir).freqItemsets
      .select(sort_array(col("items")).as("items"), col("freq"))
      .orderBy(desc("freq"), asc("items"))

  /** Association rules with confidence / lift / support
    * (tag/main.py:191-194 sorts by lift).
    */
  def associationRules(spark: SparkSession, dir: String): DataFrame =
    fit(spark, dir).associationRules
      .select(
        sort_array(col("antecedent")).as("antecedent"),
        sort_array(col("consequent")).as("consequent"),
        round(col("confidence"), 6).as("confidence"),
        round(col("lift"), 6).as("lift"),
        round(col("support"), 6).as("support"))
      .orderBy(desc("lift"), asc("antecedent"), asc("consequent"))

  type Q = (SparkSession, String) => DataFrame

  // Registered surface serializes the itemset arrays (the driver's pandas
  // compare can't hash numpy arrays — CORRECTNESS_r02); the library API
  // (`freqItemsets` / `associationRules`) keeps native arrays.
  val queries: Map[String, Q] = Map(
    "q70_freq_itemsets" -> ((s, d) =>
      freqItemsets(s, d).withColumn("items", array_join(col("items"), ","))),
    "q71_assoc_rules" -> ((s, d) =>
      associationRules(s, d)
        .withColumn("antecedent", array_join(col("antecedent"), ","))
        .withColumn("consequent", array_join(col("consequent"), ","))))

  /** FP-Growth output is not SQL-expressible for arbitrary itemset size —
    * no DuckDB oracle (driver records rows-only). Correctness is pinned
    * in TagMiningSpec: hand-computed itemsets on a fixed corpus plus the
    * support-monotonicity property (freq(superset) ≤ freq(subset)).
    */
  val oracles: Map[String, String] = Map.empty
}
