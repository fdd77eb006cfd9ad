package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Loud-failure guards for the exact-integer kernels (q213/q222/q223
  * and any future DECIMAL(38,0) arithmetic).
  *
  * Spark's non-ANSI decimal overflow yields NULL, and a kernel that
  * coalesces that NULL into 0/false turns an out-of-bounds input into
  * a PLAUSIBLE-LOOKING answer — while the DuckDB oracle's HUGEINT
  * (128-bit) either still holds or errors, so past the documented
  * bounds the two engines diverge silently (round-11 ADVICE). The fix
  * is to separate the two meanings a NULL can carry:
  *
  *   - a provably-degenerate case (empty arm, zero variance) is
  *     decided by ITS OWN explicit predicate and mapped to the honest
  *     0/false/NULL *before* this guard is consulted;
  *   - any OTHER NULL reaching the guard can only be overflow — and
  *     raises, so a 100 TB cohort that exceeds the documented exact-
  *     arithmetic range fails the job loudly instead of shipping a 0.
  *
  * `raise_error` is non-foldable and CASE WHEN is lazy, so the guard
  * costs nothing on the in-bounds path and stays inside codegen.
  *
  * Under ANSI mode (the Spark 4 session default this repo runs with)
  * the engine already raises SparkArithmeticException at the
  * overflowing product/sum, so this guard is the belt for NON-ANSI
  * deployments (`spark.sql.ansi.enabled=false` is a one-line cluster
  * config away): the kernels fail loudly under EITHER setting —
  * ExactKernelPropertySpec pins that contract.
  */
object Exact {

  /** `c` unless it is NULL, in which case raise with a kernel-tagged
    * message. Apply only after every legitimate NULL/degenerate source
    * has been handled by an explicit predicate.
    */
  private[graft] def orOverflowError(c: Column, kernel: String): Column =
    when(c.isNotNull, c).otherwise(raise_error(lit(
      s"$kernel: DECIMAL(38,0) overflow — input exceeds the documented " +
        "exact-arithmetic bound (see kernel scaladoc); shard or " +
        "gcd-reduce the counts rather than trusting a saturated result")))
}
