package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.expr.Vectors

/** Similarity search over the `embeddings` table (`array<float>` column).
  * Vector math is native higher-order expressions (graft.expr.Vectors) —
  * no UDF, no ml.linalg conversion.
  *
  * Scale path: brute-force cosine against ONE broadcast query vector is
  * linear and embarrassingly parallel — fine at any corpus size. For
  * all-pairs / many-query workloads the hyperplane-LSH variant buckets
  * vectors by sign pattern so candidates per query ≈ n / 2^planes, never
  * a cartesian product.
  */
object Similarity {

  val queryVecId = 0L
  val topK = 10
  val numTables = 4
  val planesPerTable = 4
  val embeddingDim = 64

  /** Brute-force cosine top-k against the embedding of `queryVecId`.
    * The one-row query side is broadcast; the scan side is a single
    * codegen'd projection + TakeOrderedAndProject.
    */
  def knnBruteForce(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qvec"))
    emb.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(Vectors.cosine(col("embedding"), col("qvec")), 6).as("cos"))
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(topK)
  }

  /** Per-label centroids, flattened to (label, pos, value) — posexplode +
    * partial/final avg; the flat shape keeps the result oracle-able and
    * merge-friendly (no driver-side vector assembly).
    */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "component")))
      .withColumn("pos", col("pos").cast("long"))
      .groupBy("label", "pos")
      .agg(round(avg(col("component").cast("double")), 6).as("centroid"))
      .orderBy("label", "pos")

  /** Vector hygiene stats: dimension + L2 norm per vector. */
  def vectorNorms(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        round(Vectors.norm2(col("embedding")), 6).as("l2_norm"))
      .orderBy("vec_id")

  /** ANN via multi-table random-hyperplane LSH: `numTables` independent
    * hash tables of `planesPerTable` sign bits each; a vector is a
    * candidate if it collides with the query in ANY table (standard
    * OR-amplification — one table alone is too selective: at 4+ planes
    * the query's single bucket often holds no true neighbor). Candidates
    * per table ≈ n / 2^planesPerTable, deduped across tables — never a
    * cartesian product. Recall vs brute force is pinned in
    * SimilaritySpec.
    */
  def annHyperplaneLsh(spark: SparkSession, dir: String): DataFrame = {
    val tables = (0 until numTables).map(t =>
      Vectors.randomPlanes(planesPerTable, embeddingDim, seed = 42L + t))
    val withBuckets = Tables.embeddings(spark, dir)
      .withColumn("buckets", array(tables.zipWithIndex.map { case (planes, t) =>
        struct(lit(t).as("table"),
          Vectors.hyperplaneBucket(col("embedding"), planes).as("bucket"))
      }: _*))
    val exploded = withBuckets
      .select(col("vec_id"), col("label"), col("embedding"),
        explode(col("buckets")).as("tb"))
    val q = exploded.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qvec"), col("tb").as("qtb"))
    exploded.filter(col("vec_id") =!= queryVecId)
      .join(broadcast(q), col("tb") === col("qtb"))
      .select(col("vec_id"), col("label"),
        round(Vectors.cosine(col("embedding"), col("qvec")), 6).as("cos"))
      .dropDuplicates("vec_id")
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(topK)
  }

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q60_knn_bruteforce" -> (knnBruteForce(_, _)),
    "q61_label_centroids" -> (labelCentroids(_, _)),
    "q62_vector_norms" -> (vectorNorms(_, _)),
    "q63_ann_hyperplane_lsh" -> (annHyperplaneLsh(_, _)))

  /** DuckDB cosine via explicit double math (list_cosine_similarity may
    * accumulate in float32; the manual fold matches Spark's sequential
    * double accumulation).
    */
  private def cosSql(a: String, b: String): String =
    s"""(list_sum(list_transform(list_zip($a, $b),
          p -> p[1]::DOUBLE * p[2]::DOUBLE))
        / (sqrt(list_sum(list_transform($a, x -> x::DOUBLE * x::DOUBLE)))
           * sqrt(list_sum(list_transform($b, x -> x::DOUBLE * x::DOUBLE)))))"""

  val oracles: Map[String, String] = Map(
    "q60_knn_bruteforce" ->
      s"""WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0)
          SELECT vec_id, label,
            round(${cosSql("e.embedding", "qvec")}, 6) AS cos
          FROM embeddings e, q WHERE vec_id <> 0
          ORDER BY cos DESC, vec_id LIMIT 10""",
    "q61_label_centroids" ->
      """SELECT label, i AS pos, round(avg(embedding[i+1]::DOUBLE), 6) AS centroid
         FROM embeddings, range(0, 64) t(i)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q62_vector_norms" ->
      """SELECT vec_id, len(embedding)::BIGINT AS dim,
         round(sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))), 6)
           AS l2_norm
         FROM embeddings ORDER BY vec_id""")
  // q63: bucket membership depends on the engine's seeded hyperplanes —
  // no SQL twin; recall vs q60 pinned in SimilaritySpec.
}
