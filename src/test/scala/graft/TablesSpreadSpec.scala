package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins both directions of the work-gated source spread (Tables.spread):
  * a source too small to amortize the exchange must pass through
  * untouched (round 5's unconditional spread regressed q55/q53 by
  * paying a full text shuffle before microsecond kernels), while a
  * low-parallelism source that clears the work gate must fan out to
  * every core before a CPU-heavy kernel.
  */
class TablesSpreadSpec extends AnyFunSuite with SparkTestBase {

  test("no-op on a source too small to amortize the exchange") {
    val df = Tables.documents(spark, sf)
    // reference equality: the gate must return the input plan itself,
    // not an equivalent one — no exchange is even constructed
    assert(Tables.spread(df) eq df)
  }

  test("a single-partition source above the work gate fans out to all cores") {
    val df = Tables.documents(spark, sf)
    val target = spark.sparkContext.defaultParallelism
    assume(df.rdd.getNumPartitions < target)
    val out = Tables.spread(df, minBytesPerCore = 1L)
    assert(out.rdd.getNumPartitions == target)
  }

  test("a source already as parallel as the cluster is untouched above the gate") {
    val target = spark.sparkContext.defaultParallelism
    val df = Tables.documents(spark, sf).repartition(target)
    assert(Tables.spread(df, minBytesPerCore = 1L) eq df)
  }
}
