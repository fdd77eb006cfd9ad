package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Cross-copy and pre-flight integrity audits: the checks a 100 TB
  * deployment runs BEFORE trusting a replica or executing a join, both
  * built so their cost is a scan-plus-tiny-aggregate rather than a data
  * move.
  *
  * Not in the reference (its pipelines write once and never reconcile);
  * first-class warehouse capability: cross-region replication is
  * verified by comparing fingerprints, never by shipping rows, and a
  * self-join blowup is caught by an estimator, never by OOM.
  */
object Integrity {

  type Q = (SparkSession, String) => DataFrame

  /** Order-independent per-row digest over the REPLICATED columns: a
    * 60-bit integer from the md5 hex prefix (15 nibbles keeps the
    * conv product under 2^63; the q58 cross-engine md5 idiom). Only
    * exactly-rendered columns participate (longs + the type string) —
    * a double's string render is engine-defined, so `value` is
    * deliberately excluded from the digest and verified by the
    * decimal-sum discipline elsewhere (q103's money sums).
    */
  private[graft] def rowDigest: Column =
    conv(substring(md5(concat_ws(":",
      col("event_id"), col("user_id"), col("tsu"), col("event_type"))
      .cast("binary")), 1, 15), 16, 10).cast("long")

  private[graft] val fpBuckets = 16

  /** One side's fingerprint table: 16 rows of (bucket, row count,
    * XOR-folded digest). XOR is commutative/associative with identity 0,
    * so the fold is order- and partitioning-independent — a map-side
    * partial combine all the way down, one shuffle of 16×#partitions
    * partial rows. count rides along because XOR alone is blind to a
    * row appearing twice AND missing once in the same bucket.
    */
  private[graft] def fingerprint(side: DataFrame, tag: String): DataFrame =
    side.select(pmod(col("event_id"), lit(fpBuckets)).as("bucket"),
        rowDigest.as("digest"))
      .groupBy("bucket")
      .agg(count(lit(1)).as(s"n_$tag"),
        expr("bit_xor(digest)").as(s"fp_$tag"))

  /** q195 — REPLICATION FINGERPRINT (anti-entropy audit): verify a
    * replica of events against the primary by comparing per-bucket
    * (count, XOR-of-row-digests) fingerprints — the relational form of
    * the Merkle-tree reconciliation Dynamo-style stores run between
    * regions. Each side costs ONE scan collapsing to 16 rows; the
    * comparison joins 16 rows against 16. At 100 TB this is the only
    * affordable shape: the alternative — a full-outer join of two
    * copies — shuffles both tables across the wire; the fingerprint
    * ships 256 bytes. Drift localizes to a bucket, so the repair
    * re-reads 1/16 of the table, not all of it (deeper Merkle levels
    * = more buckets, same query). The staged replica drops every
    * 997th event — cross-engine-deterministic simulated loss — so the
    * audit must flag exactly the buckets owning a dropped row and
    * clear the rest; the oracle recomputes both sides' fingerprints
    * from the flat table.
    */
  def replicationFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val primary = Tables.eventsMicros(spark, dir)
    // simulated replication loss: every 997th event missing downstream
    val replica = primary.filter(!(col("event_id") % 997 === 0))
    fingerprint(primary, "primary")
      .join(fingerprint(replica, "replica"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_primary"), lit(0L)).as("n_primary"),
        coalesce(col("n_replica"), lit(0L)).as("n_replica"),
        col("fp_primary"), col("fp_replica"),
        (coalesce(col("n_primary"), lit(0L)) =!=
            coalesce(col("n_replica"), lit(0L)) ||
          not(col("fp_primary") <=> col("fp_replica"))).as("drift"))
      .orderBy("bucket")
  }

  /** q197 — JOIN-CARDINALITY PRE-FLIGHT: estimate the output size of a
    * self-join on user_id from a deterministic 1-in-16 KEY sample,
    * before running it — the check that catches a pairwise blowup
    * (q31's pair generation, q140's linkage blocks) while it is still
    * one aggregate, not an OOM. Sampling KEYS (not rows) is what makes
    * Σn² estimable: a row sample biases per-key counts quadratically,
    * a key sample keeps each sampled key's full count, so
    * 16·Σ_{sampled} n² is unbiased for Σn². Cost: the key-grain count
    * the join needed anyway, collapsed to ONE row. The estimate,
    * the exact value and their gap (sampling error, reported in ppm —
    * an audit of the estimator itself) are all integer-exact;
    * DECIMAL(38,0) intermediates because Σn² overflows a Long once a
    * key passes ~3e9 rows, and 100 TB hot keys will.
    */
  def joinCardinalityPreflight(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .withColumn("h", Sampling.nibbleOf(col("user_id"), ":jcard"))
      .agg(
        count(lit(1)).as("n_keys"),
        count(when(col("h") === 0, 1)).as("n_keys_sampled"),
        sum(expr("cast(n as decimal(38,0)) * n")).as("ap"),
        sum(when(col("h") === 0, expr("cast(n as decimal(38,0)) * n")))
          .as("sp"))
      .select(col("n_keys"), col("n_keys_sampled"),
        col("ap").cast("long").as("actual_pairs"),
        (coalesce(col("sp"), lit(0)) * 16).cast("long").as("est_pairs"),
        expr("abs(coalesce(sp, 0) * 16 - ap) * 1000000 div ap")
          .cast("long").as("err_ppm"))

  val queries: Map[String, Q] = Map(
    "q195_replication_fingerprint" -> (replicationFingerprint(_, _)),
    "q197_join_cardinality_preflight" -> (joinCardinalityPreflight(_, _)))

  val oracles: Map[String, String] = Map(
    // identical digest (15-nibble md5 prefix as BIGINT), identical
    // bucket rule and XOR fold, both sides re-derived from the flat
    // table with the same simulated-loss predicate
    "q195_replication_fingerprint" ->
      s"""WITH d AS (
            SELECT event_id % $fpBuckets AS bucket,
              ('0x' || substr(md5(
                 event_id::VARCHAR || ':' || user_id::VARCHAR || ':'
                 || (epoch_ns(ts) // 1000)::VARCHAR || ':' || event_type),
                 1, 15))::BIGINT AS digest,
              event_id % 997 = 0 AS dropped
            FROM events),
          p AS (SELECT bucket, count(*) AS n_primary,
                  bit_xor(digest) AS fp_primary
                FROM d GROUP BY 1),
          r AS (SELECT bucket, count(*) AS n_replica,
                  bit_xor(digest) AS fp_replica
                FROM d WHERE NOT dropped GROUP BY 1)
          SELECT bucket,
            coalesce(n_primary, 0) AS n_primary,
            coalesce(n_replica, 0) AS n_replica,
            fp_primary, fp_replica,
            (coalesce(n_primary, 0) <> coalesce(n_replica, 0)
             OR fp_primary IS DISTINCT FROM fp_replica) AS drift
          FROM p FULL OUTER JOIN r USING (bucket)
          ORDER BY bucket""",
    "q197_join_cardinality_preflight" ->
      """WITH k AS (
           SELECT user_id, count(*)::BIGINT AS n,
             strpos('0123456789abcdef',
               substr(md5(user_id::VARCHAR || ':jcard'), 1, 1)) - 1 AS h
           FROM events GROUP BY 1)
         SELECT count(*) AS n_keys,
           count(*) FILTER (WHERE h = 0) AS n_keys_sampled,
           (sum(n::HUGEINT * n))::BIGINT AS actual_pairs,
           (coalesce(sum(n::HUGEINT * n) FILTER (WHERE h = 0), 0) * 16)::BIGINT
             AS est_pairs,
           (abs(coalesce(sum(n::HUGEINT * n) FILTER (WHERE h = 0), 0) * 16
                - sum(n::HUGEINT * n))
            * 1000000 // sum(n::HUGEINT * n))::BIGINT AS err_ppm
         FROM k""")
}
