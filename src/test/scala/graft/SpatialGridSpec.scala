package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SpatialGrid

/** q250 pins: the cell-blocked neighbor join must equal an in-JVM
  * brute-force n²/2 over the same planted coordinates — including
  * boundary pairs whose cells differ (the 3×3 gather is what makes
  * those reachable).
  */
class SpatialGridSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("grid neighbor join equals brute force on a dense planted corpus") {
    // 3000 hash-planted points (the tiny-sf customer table is too
    // sparse to pair at the prod radius — expected pairs ≈ n²πr²/2A)
    val planted = SpatialGrid.plantedPoints(
      spark.range(1L, 3001L).select(col("id").as("c_custkey")))
    val pts = planted.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val r2 = SpatialGrid.radiusUnits * SpatialGrid.radiusUnits
    val want = (for {
      (a, xa, ya) <- pts; (b, xb, yb) <- pts if a < b
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) if d2 <= r2
    } yield (a, b, d2)).toSet
    val got = SpatialGrid.gridNeighborCore(planted).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.nonEmpty, "fixture must exercise the match path")
  }

  test("cross-cell boundary pair is found (the 3x3 gather exists for it)") {
    // two points radius-1 apart straddling a cell boundary, one far one
    val r = SpatialGrid.radiusUnits
    val pts = Seq((1L, r - 1L, 10L), (2L, r + 1L, 10L), (3L, 10L * r, 10L))
      .toDF("id", "x", "y")
    val got = SpatialGrid.gridNeighborCore(pts).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    assert(got == Seq((1L, 2L, 4L)))
  }
}
