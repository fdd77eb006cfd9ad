package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Spatial neighbor search by grid-cell blocking — the geohash-style
  * radius join a pipeline runs to pair nearby records without an n²/2
  * cross product. Spark has no native spatial join; the scalable shape
  * is the standard one: bucket points into cells the size of the search
  * radius, equi-join each point's cell against the 3×3 cell
  * neighborhood, verify the exact distance inside the bounded candidate
  * set.
  *
  * The testdata carries no coordinates, so q250 PLANTS them — integer
  * positions on a bounded plane derived from md5(custkey) (the q67
  * honest-fake discipline: deterministic, engine-replayable, and the
  * Spark-side machinery — cell exchange, neighborhood explode, exact
  * verify — is exactly what real coordinates would exercise). All
  * distance math is INTEGER (squared distance in plane units²), so the
  * oracle comparison can never drift on trig/fp rounding the way a
  * haversine formulation would (libm sin/cos differ across engines in
  * the last ulp, which flips threshold cases).
  */
object SpatialGrid {

  /** Plane edge length (units), search radius, grid cell = radius. */
  val planeUnits = 1000000L
  val radiusUnits = 2000L

  /** q250 — GRID NEIGHBOR JOIN: all unordered customer pairs within
    * `radiusUnits` (squared-distance ≤ r²), discovered via cell
    * blocking, never an all-pairs compare.
    *
    * Scale shape: candidate volume is Σ_cell |cell|·|3×3 neighborhood|
    * — linear in points for bounded density (the plane/radius choice
    * fixes expected occupancy), versus n²/2 brute force. Each pair is
    * found EXACTLY once: the left side sits in its home cell, the
    * right side explodes to its 9-cell neighborhood, so the unordered
    * pair (a < b) matches on precisely one (home, gathered) cell
    * combination. One hash exchange on the cell key; a skewed hot
    * cell (urban density) would salt like q168.
    */
  def gridNeighborJoin(spark: SparkSession, dir: String): DataFrame =
    gridNeighborCore(plantedPoints(Tables.customer(spark, dir)))

  /** Deterministic planted coordinates: two independent md5-derived
    * integers per custkey on the [0, planeUnits) plane.
    */
  private[graft] def plantedPoints(cust: DataFrame): DataFrame = {
    def coord(salt: String) =
      expr("cast(conv(substring(md5(cast(concat(cast(c_custkey as string), " +
        s"'$salt') as binary)), 1, 12), 16, 10) as bigint) % $planeUnits")
    cust.select(col("c_custkey").as("id"),
      coord(":gx").as("x"), coord(":gy").as("y"))
  }

  private[graft] def gridNeighborCore(pts: DataFrame): DataFrame = {
    val cellOf = (c: String) => expr(s"$c div $radiusUnits")
    val home = pts
      .withColumn("cx", cellOf("x")).withColumn("cy", cellOf("y"))
    val gathered = home
      .withColumn("dx", explode(sequence(lit(-1), lit(1))))
      .withColumn("dy", explode(sequence(lit(-1), lit(1))))
      .select(col("id").as("id_b"), col("x").as("xb"), col("y").as("yb"),
        (col("cx") + col("dx")).as("cx"), (col("cy") + col("dy")).as("cy"))
    home.join(gathered, Seq("cx", "cy"))
      .filter(col("id") < col("id_b"))
      .withColumn("d2",
        (col("x") - col("xb")) * (col("x") - col("xb"))
          + (col("y") - col("yb")) * (col("y") - col("yb")))
      .filter(col("d2") <= radiusUnits * radiusUnits)
      .select(col("id").as("cust_a"), col("id_b").as("cust_b"), col("d2"))
      .orderBy("cust_a", "cust_b")
  }

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q250_grid_neighbor_join" -> (gridNeighborJoin(_, _)))

  val oracles: Map[String, String] = Map(
    // brute-force n²/2 with the same planted integer coordinates — the
    // oracle proves the cell blocking finds exactly the true pair set
    "q250_grid_neighbor_join" ->
      s"""WITH p AS (
            SELECT c_custkey AS id,
              ('0x' || substr(md5(c_custkey::VARCHAR || ':gx'), 1, 12))::BIGINT
                % $planeUnits AS x,
              ('0x' || substr(md5(c_custkey::VARCHAR || ':gy'), 1, 12))::BIGINT
                % $planeUnits AS y
            FROM customer)
          SELECT a.id AS cust_a, b.id AS cust_b,
            ((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y))::BIGINT
              AS d2
          FROM p a JOIN p b ON a.id < b.id
          WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
                <= ${radiusUnits * radiusUnits}
          ORDER BY cust_a, cust_b""")
}
