package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.ParquetLayout

/** Partitioned-layout pins (q103): the routing filter must resolve as
  * PARTITION pruning (directory-level, planning-time) — not as a
  * post-scan row filter — and the layout round-trip must be lossless.
  */
class ParquetLayoutSpec extends AnyFunSuite with SparkTestBase {

  test("a routing-column filter prunes partitions at the scan, not after it") {
    val base = java.nio.file.Files.createTempDirectory("graft_layout_spec_")
    try {
      val layout = base.resolve("by_type").toString
      ParquetLayout.stageLayout(spark, sf, layout)
      val plan = ParquetLayout.prunedPurchases(spark, layout)
        .queryExecution.executedPlan.toString

      // the filter lives in PartitionFilters on the scan node...
      val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq
      assert(pf.exists(_.contains("purchase")), s"no partition pruning: $pf")
      // ...and event_type is NOT read from data files (it's a directory
      // key; a scan hauling it as a data column defeats the layout)
      val schemas = "ReadSchema: struct<([^>]*)>".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq
      assert(schemas.nonEmpty)
      schemas.foreach(s => assert(!s.contains("event_type"),
        s"event_type read from data files: $s"))

      // losslessness: pruned read == direct filter on the flat table
      val pruned = ParquetLayout.prunedPurchases(spark, layout)
        .select("event_id", "user_id", "tsu", "value")
        .collect().map(_.toSeq).toSet
      val direct = Tables.eventsMicros(spark, sf)
        .filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "tsu", "value")
        .collect().map(_.toSeq).toSet
      assert(pruned == direct)
    } finally Tables.deleteRecursively(base)
  }

  test("orc interchange: lossless round trip, filter pushed to the ORC scan") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft_orcspec_")
    try {
      val src = Tables.eventsMicros(spark, sf)
        .select("event_id", "user_id", "tsu", "value", "event_type")
      val path = base.resolve("ev").toString
      src.write.orc(path)
      val back = spark.read.orc(path)
      // bit-lossless: same multiset of rows either direction
      assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
      // the routing filter reaches the ORC scan as a pushed predicate
      val plan = back.filter(col("event_type") === "purchase")
        .queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") &&
        plan.contains("EqualTo(event_type,purchase)"), plan.take(800))
    } finally Tables.deleteRecursively(base)
  }

  test("q103 leaves no scratch layout behind") {
    import scala.jdk.CollectionConverters._
    def scratch(): Set[String] = {
      val tmp = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
      val s = java.nio.file.Files.list(tmp)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("graft_q103_")).toSet
      finally s.close()
    }
    val before = scratch()
    val rows = ParquetLayout.partitionPrunedRevenue(spark, sf).count()
    assert(rows > 0)
    assert((scratch() -- before).isEmpty)
  }
}
