package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float|double>` columns. The dot-product
  * family routes through the codegen'd DotProduct kernel (higher-order
  * functions are CodegenFallback in Spark — their lambdas evaluate
  * interpreted per element, which breaks whole-stage codegen around any
  * projection that uses them); `dotHof` keeps the HOF formulation for
  * parity testing. No UDF, no ml.linalg conversion on the hot path.
  * Accumulation is in double for numeric stability regardless of the
  * storage element type.
  */
object Vectors {

  /** Σ aᵢ·bᵢ, sequential double accumulation — codegen'd kernel. */
  def dot(a: Column, b: Column): Column = DotProduct(a, b)

  /** Higher-order-function twin of `dot` (interpreted lambda) — kept for
    * the kernel-parity spec; identical arithmetic by construction.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂ */
  def norm2(a: Column): Column = sqrt(DotProduct(a, a))

  /** cos(a,b) with 0 for zero-norm vectors (null-division guard). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm2(a) * norm2(b)
    when(n === 0.0, 0.0).otherwise(d / n)
  }

  /** v / ‖v‖₂ (zero vector passes through unchanged). */
  def normalize(a: Column): Column = {
    val n = norm2(a)
    when(n === 0.0, a.cast("array<double>"))
      .otherwise(transform(a, x => x.cast("double") / n))
  }

  /** Squared L2 distance. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val diff = x.cast("double") - y.cast("double")
        diff * diff
      }),
      lit(0.0), (acc, v) => acc + v)

  /** Sign bits against a fixed hyperplane matrix → an LSH bucket id.
    * `planes` is a small deterministic matrix (seeded off-line), shipped
    * as a literal — at scale it would be a broadcast. The bucket id is
    * Σ 2^i·[dot(v, plane_i) > 0]: vectors in the same halfspace
    * arrangement collide, giving candidate sets ≪ n for ANN.
    */
  def hyperplaneBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(v, typedLit(p)) > 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Deterministic pseudo-random hyperplanes (fixed seed — reproducible
    * across runs and engines).
    */
  def randomPlanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }
}
