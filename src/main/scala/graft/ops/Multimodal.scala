package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata structs; decode/feature-extraction runs
  * as a partition-batched kernel (`mapPartitions` over a typed Dataset —
  * the Scala analog of a batched pandas-UDF: one decoder init per
  * partition, columnar-friendly batch shape).
  *
  * The container has no image/audio codecs, so THE DECODE KERNEL IS A
  * DETERMINISTIC STUB (clearly marked below): it derives fake
  * width/height/brightness from the payload bytes. Everything around it
  * — schema, binary column handling, partitioning, batch iteration,
  * output struct shape — is the real engine surface and is tested.
  */
object Multimodal {

  /** Byte-level metadata of a binary payload — pure native expressions
    * (this part needs no decoder and is DuckDB-oracle-checked).
    */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        octet_length(col("text").cast("binary")).cast("long").as("byte_len"),
        md5(col("text").cast("binary")).as("content_md5"),
        ascii(substring(col("text"), 1, 1)).cast("long").as("first_byte"))
      .orderBy("doc_id")

  /** Decoded-media feature row. */
  case class MediaFeatures(
      doc_id: Long, width: Int, height: Int, channels: Int,
      brightness: Double, byte_len: Long)

  /** STUB DECODER — deterministic fake in lieu of a real codec (none in
    * this container). A real deployment swaps `decodeOne` for an actual
    * image/audio decode; the partition-batched harness around it is
    * unchanged.
    */
  private def decodeOne(docId: Long, payload: Array[Byte]): MediaFeatures = {
    var acc = 1125899906842597L // FNV-ish deterministic fold over bytes
    var i = 0
    while (i < payload.length) { acc = acc * 31 + (payload(i) & 0xff); i += 1 }
    val w = 64 + (math.abs(acc % 7) * 32).toInt
    val h = 64 + (math.abs((acc >> 8) % 5) * 32).toInt
    MediaFeatures(docId, w, h, 3,
      (math.abs(acc >> 16) % 1000) / 1000.0, payload.length.toLong)
  }

  /** Partition-batched decode: binary column in, feature struct out.
    * One kernel instantiation per partition (where a real decoder would
    * allocate its codec context), rows streamed through it.
    */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    val rows = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    rows.mapPartitions { it =>
      // per-partition decoder init would go here
      it.map { case (id, payload) => decodeOne(id, payload) }
    }(Encoders.product[MediaFeatures])
      .toDF()
      .orderBy("doc_id")
  }

  /** Frame-sampling shape: media → N deterministic "frames" each with its
    * own feature row (the explode-shaped half of a video pipeline).
    */
  def frameSamples(spark: SparkSession, dir: String, nFrames: Int = 4): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(nFrames - 1)), f =>
          struct(
            f.as("frame_idx"),
            // STUB frame feature: offset-dependent deterministic hash
            pmod(xxhash64(col("payload"), f), lit(1000)).as("frame_sig"))))
          .as(Seq("pos", "frame")))
      .select(col("doc_id"), col("frame.frame_idx").as("frame_idx"),
        col("frame.frame_sig").as("frame_sig"))
      .orderBy("doc_id", "frame_idx")

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q80_binary_meta" -> (binaryMeta(_, _)),
    "q81_media_features" -> (mediaFeatures(_, _)),
    "q82_frame_samples" -> (frameSamples(_, _)))

  val oracles: Map[String, String] = Map(
    "q80_binary_meta" ->
      """SELECT doc_id, octet_length(text::BLOB) AS byte_len,
         md5(text) AS content_md5,
         ascii(substr(text, 1, 1))::BIGINT AS first_byte
         FROM documents ORDER BY doc_id""")
  // q81/q82 depend on the stub decode kernel — rows-only; shape and
  // determinism pinned in MultimodalSpec.
}
