package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Integrity

/** Pinning specs for the integrity audits: the fingerprint must flag
  * exactly the buckets owning simulated-loss rows (and clear the rest),
  * and the pre-flight estimator must be exact when the key sample is the
  * whole population.
  */
class IntegritySpec extends AnyFunSuite with SparkTestBase {

  test("q195: drift flags exactly the buckets that lost a row") {
    val out = Integrity.replicationFingerprint(spark, sf).collect()
    assert(out.length === Integrity.fpBuckets)
    // buckets owning a dropped event (event_id % 997 == 0) must drift
    val droppedBuckets = Tables.eventsMicros(spark, sf)
      .filter(col("event_id") % 997 === 0)
      .select(pmod(col("event_id"), lit(Integrity.fpBuckets)))
      .collect().map(_.getLong(0)).toSet
    assert(droppedBuckets.nonEmpty, "fixture must contain simulated loss")
    out.foreach { r =>
      val bucket = r.getLong(0)
      val drifted = r.getBoolean(5)
      assert(drifted === droppedBuckets.contains(bucket),
        s"bucket $bucket: drift=$drifted but dropped=${droppedBuckets.contains(bucket)}")
      // count delta explains the drift: n_primary - n_replica = drops
      val delta = r.getLong(1) - r.getLong(2)
      assert((delta > 0) === droppedBuckets.contains(bucket))
    }
  }

  test("q195: identical sides produce identical fingerprints") {
    val fpA = Integrity.fingerprint(Tables.eventsMicros(spark, sf), "a")
    val fpB = Integrity.fingerprint(
      // different partitioning, same rows: the XOR fold must not care
      Tables.eventsMicros(spark, sf).repartition(7), "b")
    val joined = fpA.join(fpB, "bucket")
    assert(joined.filter(col("n_a") =!= col("n_b")
      || col("fp_a") =!= col("fp_b")).count() === 0)
  }

  test("q197: estimator is exact on a full sample and unbiased in form") {
    val r = Integrity.joinCardinalityPreflight(spark, sf).collect().head
    val (nKeys, nSampled) = (r.getLong(0), r.getLong(1))
    val (actual, est, errPpm) = (r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nKeys > 0 && nSampled > 0 && nSampled < nKeys)
    // actual == sum of per-key count^2, recomputed independently
    val expected = Tables.events(spark, sf)
      .groupBy("user_id").count().collect()
      .map(x => x.getLong(1) * x.getLong(1)).sum
    assert(actual === expected)
    assert(errPpm === math.abs(est - actual) * 1000000L / actual)
  }
}
