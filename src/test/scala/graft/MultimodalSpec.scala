package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

/** Multimodal plumbing: the partition-batched decode harness must be
  * deterministic and shape-stable (the decode kernel itself is a
  * documented stub — these tests pin the Spark-side contract that
  * survives a real-codec swap).
  */
class MultimodalSpec extends AnyFunSuite with SparkTestBase {

  test("media features: one row per document, deterministic across runs") {
    val a = Multimodal.mediaFeatures(spark, sf).collect()
    val b = Multimodal.mediaFeatures(spark, sf).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length == Tables.documents(spark, sf).count())
  }

  test("media features: plausible decoded shapes (stub grid), byte_len matches payload") {
    val bad = Multimodal.mediaFeatures(spark, sf)
      .filter(col("width") < 64 || col("height") < 64 ||
        col("channels") =!= 3 ||
        col("brightness") < 0.0 || col("brightness") >= 1.0 ||
        col("byte_len") <= 0)
      .count()
    assert(bad == 0)
  }

  test("frame samples: exactly nFrames rows per doc with 0-based contiguous indexes") {
    val df = Multimodal.frameSamples(spark, sf)
    val n = Tables.documents(spark, sf).count()
    assert(df.count() == n * 4)
    val perDoc = df.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), min("frame_idx").as("lo"), max("frame_idx").as("hi"))
      .filter(col("n") =!= 4 || col("lo") =!= 0 || col("hi") =!= 3)
    assert(perDoc.count() == 0)
  }
}
