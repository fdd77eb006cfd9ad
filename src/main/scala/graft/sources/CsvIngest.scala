package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV ingestion with the reference's quirks handled explicitly
  * (SURVEY.md §2.1 S1-S6, §7.5):
  *
  *   - UTF-8 BOM: the crawler writes `utf-8-sig`
  *     (crawler/spider_worker.py:111); a BOM glued to the first header
  *     cell corrupts the first column name on a naive read.
  *   - Embedded commas/quotes/newlines in free text → multiLine +
  *     quote/escape (danmaku_analysis_cluster.py:120).
  *   - Malformed numeric rows → cast-validity filter
  *     (spark_energy.py:32), not inferSchema coercion.
  *   - File lineage → input_file_name + regexp_extract
  *     (spark_energy.py:27,31).
  *   - Dedup-on-ingest on the record id (spider_worker.py:73-77).
  *
  * The schema is DECLARED (one pass at 100 TB); `inferSchema` is never
  * used. All text columns are read as string and validated by cast —
  * a malformed row yields nulls that the validity filter drops, which
  * is the reference's semantic (drop, don't fail).
  */
object CsvIngest {

  /** The reference's danmaku schema (data/readme.md:23-31), string-typed
    * at the reader so cast-validity filtering is explicit.
    */
  val danmakuRawSchema = StructType(Seq(
    StructField("dmid", StringType),
    StructField("video_time", StringType),
    StructField("text", StringType),
    StructField("send_date", StringType),
    StructField("uid", StringType),
    StructField("source", StringType)))

  /** Glob-scan episode CSVs (S1-S5): declared schema, quoted/multiline
    * text, BOM-tolerant, with a `bvid` lineage column extracted from the
    * filename.
    */
  def readDanmaku(spark: SparkSession, globPath: String): DataFrame =
    spark.read
      .schema(danmakuRawSchema)
      .option("header", true)
      .option("multiLine", true)
      .option("quote", "\"")
      .option("escape", "\"")
      .csv(globPath)
      .withColumn("bvid",
        regexp_extract(input_file_name(), "danmaku_(BV[0-9A-Za-z]+)\\.csv", 1))

  /** Typed + validated view (P5 cast-validity, S11 dedup-on-ingest):
    * rows whose dmid/video_time fail to parse are dropped, duplicate
    * dmids keep one survivor.
    */
  def cleanDanmaku(raw: DataFrame): DataFrame =
    raw
      // the BOM, if present, rides at the start of the first *data* cell
      // only when headers are absent; on the header row Spark consumes it
      // with the header — strip defensively from the id column anyway.
      // try_* variants: ANSI mode (Spark 4 default) makes plain cast
      // THROW on malformed input; the reference's semantic is drop
      // (spark_energy.py:32 keeps rows whose cast is non-null).
      .withColumn("dmid", expr("try_cast(regexp_replace(dmid, '^﻿', '') AS BIGINT)"))
      .withColumn("video_time", expr("try_cast(video_time AS DOUBLE)"))
      .withColumn("send_date",
        expr("try_to_timestamp(send_date, 'yyyy-MM-dd HH:mm:ss')"))
      .filter(col("dmid").isNotNull && col("video_time").isNotNull)
      .dropDuplicates("dmid")

  /** S6: single-file header CSV sink. `coalesce(1)` funnels the final
    * stage through one task — documented as a small-result-only sink
    * (the reference uses it for the ~500-row word-freq table; a 100 TB
    * result would use the partitioned default).
    */
  def writeCsvSingle(df: DataFrame, out: String): Unit =
    df.coalesce(1)
      .write.mode(SaveMode.Overwrite)
      .option("header", true)
      .csv(out)

  /** S7 rebuilt: executor-side JSON sink for nested results — replaces
    * the reference's driver-side collect() + json.dump loop
    * (spark_energy.py:98-116), which caps output at driver memory.
    */
  def writeJson(df: DataFrame, out: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(out)

  /** S12: idempotent append ingest — new batch unioned in, deduped on
    * the id, so re-running an overlapping crawl batch is a no-op
    * (spider_worker.py:104-113 re-reads existing ids for the same
    * purpose).
    */
  def appendIncremental(existing: DataFrame, batch: DataFrame): DataFrame =
    existing.unionByName(batch).dropDuplicates("dmid")
}
