package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Record linkage / entity resolution with BLOCKING — the fuzzy-match
  * kernel (dedupe candidate generation, master-data reconciliation)
  * that no exact-key join expresses. Not in the reference.
  *
  * The all-pairs edit-distance join is quadratic in the table; the
  * classic fix is a blocking key: only records sharing the key are
  * compared, so the pair space is Σ|block|² — bounded by the largest
  * block, not the table. Here the key is the name minus its last two
  * characters (for near-identical identifiers this catches exactly the
  * single-trailing-edit family a typo produces), the within-block join
  * is an equi-join Spark shuffles on the key like any other, and the
  * distance check uses the THRESHOLDED levenshtein (banded O(d·n) DP
  * with early exit, not the full O(n²) matrix — the threshold form is
  * what makes a 100 TB candidate pass affordable). At production scale
  * the one extra guard is a block-size cap (a degenerate key — empty
  * names — would resurrect the quadratic blowup); the summary output
  * makes exactly that observable: n_cand_pairs IS Σ|block|² per block.
  */
object Linkage {

  /** Edit-distance threshold for a candidate duplicate pair. */
  val linkMaxDist = 1

  /** q140 — per-block linkage summary over customer names: members,
    * candidate pairs actually compared (the blocking-cost audit), and
    * pairs within the edit-distance threshold. Pair order is
    * normalized (n1 < n2) so each unordered pair counts once.
    */
  def nameLinkage(spark: SparkSession, dir: String): DataFrame =
    linkageCore(Tables.customer(spark, dir))

  private[graft] def linkageCore(cust0: DataFrame): DataFrame = {
    val cust = cust0.select(col("c_custkey"), col("c_name"),
      expr("substring(c_name, 1, length(c_name) - 2)").as("blk"))
    val a = cust.select(col("blk"), col("c_name").as("n1"))
    val b = cust.select(col("blk"), col("c_name").as("n2"))
    val dup = a.join(b, Seq("blk"))
      .filter(col("n1") < col("n2"))
      .filter(levenshtein(col("n1"), col("n2"), linkMaxDist) >= 0)
      .groupBy("blk").agg(count(lit(1)).as("n_dup_pairs"))
    cust.groupBy("blk").agg(count(lit(1)).as("n_members"))
      .withColumn("n_cand_pairs",
        expr("n_members * (n_members - 1) div 2"))
      .join(dup, Seq("blk"), "left_outer")
      .select(col("blk"), col("n_members"), col("n_cand_pairs"),
        coalesce(col("n_dup_pairs"), lit(0L)).as("n_dup_pairs"))
      .orderBy("blk")
  }

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q140_name_linkage" -> (nameLinkage(_, _)))

  val oracles: Map[String, String] = Map(
    // same blocking + normalized pair order; DuckDB's levenshtein is
    // the same classic edit distance (no threshold form — semantics
    // identical, only the early-exit differs)
    "q140_name_linkage" ->
      s"""WITH c AS (
            SELECT c_custkey, c_name,
              substr(c_name, 1, length(c_name) - 2) AS blk
            FROM customer),
          dup AS (
            SELECT a.blk, count(*) AS n_dup_pairs
            FROM c a JOIN c b ON a.blk = b.blk AND a.c_name < b.c_name
            WHERE levenshtein(a.c_name, b.c_name) <= ${linkMaxDist}
            GROUP BY 1),
          m AS (
            SELECT blk, count(*) AS n_members,
              count(*) * (count(*) - 1) // 2 AS n_cand_pairs
            FROM c GROUP BY 1)
          SELECT m.blk, m.n_members, m.n_cand_pairs,
            coalesce(d.n_dup_pairs, 0) AS n_dup_pairs
          FROM m LEFT JOIN dup d ON m.blk = d.blk
          ORDER BY m.blk""")
}
