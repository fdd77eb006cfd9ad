package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Global consecutive row numbering at scale — the "zipWithIndex"
  * problem. A naive `row_number() OVER (ORDER BY key)` collapses the
  * whole table into ONE task (Spark plans an empty-partition window as
  * a single-partition sort), which is the canonical 100 TB
  * scale-killer: the job runs, slowly, until the one executor holding
  * 100 TB of sorted rows dies. The scalable shape is the classic
  * two-phase numbering every distributed engine uses internally:
  *
  *   1. range-partition by the sort key (`repartitionByRange`) so
  *      partition i holds keys strictly below partition i+1;
  *   2. number rows LOCALLY within each partition (a window keyed on
  *      the partition id — each partition sorts independently);
  *   3. count rows per partition (a #partitions-row side table),
  *      prefix-sum those counts into per-partition offsets, and
  *      broadcast-join the offsets back: global_rn = offset + local_rn.
  *
  * Only the offsets frame (one row per partition) is ever sequential;
  * the data path is two slim exchanges and a local sort, all linear.
  * The emitted mapping is engine-independent — the global rank in the
  * total order (l_orderkey, l_linenumber), which is unique — so the
  * oracle can verify it with a plain `row_number()` even though the
  * physical plans are completely different.
  *
  * Reference analog: none (its pipelines never need a global ordinal);
  * first-class here because training-data sharding, deterministic
  * example ids, and resumable exports all start with "assign every row
  * a stable consecutive number".
  */
object GlobalIndex {

  /** Audit stride: the verified output is every `stride`-th numbered
    * row — enough to pin the whole numbering (any insertion/deletion/
    * swap shifts every later ordinal) without dumping the full table.
    */
  private[graft] val stride = 100

  /** q182 — global row numbers over lineitem in (l_orderkey,
    * l_linenumber) order, two-phase, no single-partition sort.
    */
  def globalRowNumbers(spark: SparkSession, dir: String): DataFrame =
    numberedAll(Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber")))
      .filter(col("rn") % stride === 0)
      .orderBy("rn")

  /** Full numbering over any frame with (l_orderkey, l_linenumber);
    * fixture seam for the spec (which replays a shuffled fixture,
    * compares to a driver-side sort, and asserts the plan contains no
    * global sort of the data path).
    */
  private[graft] def numberedAll(li: DataFrame): DataFrame = {
    val nParts = li.sparkSession.sessionState.conf.numShufflePartitions
    // phase 1: range partition — partition ids are ordered by key range
    val ranged = li
      .repartitionByRange(nParts, col("l_orderkey"), col("l_linenumber"))
      .withColumn("pid", spark_partition_id())
    // phase 2: local numbering (each pid sorts only its own slice)
    val local = ranged.withColumn("local_rn",
      row_number().over(
        Window.partitionBy("pid").orderBy("l_orderkey", "l_linenumber"))
        .cast("long"))
    // phase 3: per-partition counts → exclusive prefix sums. One row
    // per partition, so the single-partition window is O(#partitions),
    // not O(#rows) — the whole point of the design.
    val offsets = local.groupBy("pid").agg(count(lit(1)).as("n"))
      .withColumn("offset",
        coalesce(sum("n").over(Window.orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("pid", "offset")
    local.join(broadcast(offsets), Seq("pid"))
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("offset") + col("local_rn")).as("rn"))
  }

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q182_global_row_numbers" -> (globalRowNumbers(_, _)))

  val oracles: Map[String, String] = Map(
    // the logical contract — rank in the total order — stated directly;
    // the engine must reproduce it from the partitioned two-phase plan
    "q182_global_row_numbers" ->
      s"""SELECT l_orderkey, l_linenumber, rn FROM (
            SELECT l_orderkey, l_linenumber,
              row_number() OVER (ORDER BY l_orderkey, l_linenumber) AS rn
            FROM lineitem)
          WHERE rn % $stride = 0 ORDER BY rn""")
}
