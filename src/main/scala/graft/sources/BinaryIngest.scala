package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Binary-segment ingestion — the Spark rebuild of the reference's
  * protobuf crawler decode (crawler/spider_worker.py:29-51, message
  * schema crawler/dm_pb2.py:79-80: DanmakuElem{id, progress, content,
  * ctime, midHash}).
  *
  * Files arrive as opaque blobs via the `binaryFile` source; decoding
  * runs executor-side, partition-batched. The container has no protobuf
  * runtime, so `decodeSegment` is a STUB for a simple deterministic
  * length-prefixed record format (documented below); a real deployment
  * swaps it for `from_protobuf` (spark-protobuf) or a generated parser —
  * the source plumbing (binaryFile scan → per-file decode → typed rows →
  * dedup) is the engine surface and is what the tests pin.
  */
object BinaryIngest {

  /** Decoded record, field-for-field the reference's DanmakuElem. */
  case class DanmakuRecord(
      id: Long, progress: Double, content: String, ctime: Long, midHash: String)

  /** STUB wire format (stand-in for the protobuf segment): repeated
    * records of
    *   [i64 id][f64 progress][i64 ctime][i32 contentLen][utf8 content]
    *   [i32 midLen][utf8 midHash]
    * big-endian, no framing header. Truncated trailing bytes are
    * discarded (a real protobuf parser does the same for a torn tail).
    */
  def decodeSegment(bytes: Array[Byte]): Seq[DanmakuRecord] = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val out = scala.collection.mutable.ArrayBuffer.empty[DanmakuRecord]
    try {
      while (buf.remaining() >= 28) {
        val id = buf.getLong
        val progress = buf.getDouble
        val ctime = buf.getLong
        val cLen = buf.getInt
        if (cLen < 0 || cLen > buf.remaining()) throw new RuntimeException("torn")
        val cBytes = new Array[Byte](cLen); buf.get(cBytes)
        if (buf.remaining() < 4) throw new RuntimeException("torn")
        val mLen = buf.getInt
        if (mLen < 0 || mLen > buf.remaining()) throw new RuntimeException("torn")
        val mBytes = new Array[Byte](mLen); buf.get(mBytes)
        out += DanmakuRecord(id, progress,
          new String(cBytes, java.nio.charset.StandardCharsets.UTF_8), ctime,
          new String(mBytes, java.nio.charset.StandardCharsets.UTF_8))
      }
    } catch { case _: RuntimeException => /* discard torn tail */ }
    out.toSeq
  }

  /** Encoder for the stub wire format (test fixtures + round-trip spec). */
  def encodeSegment(records: Seq[DanmakuRecord]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bos)
    records.foreach { r =>
      dos.writeLong(r.id); dos.writeDouble(r.progress); dos.writeLong(r.ctime)
      val c = r.content.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      dos.writeInt(c.length); dos.write(c)
      val m = r.midHash.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      dos.writeInt(m.length); dos.write(m)
    }
    bos.toByteArray
  }

  /** binaryFile scan → per-file decode → typed rows, deduped on id
    * (S10 + S11). flatMap keeps decode streaming per partition — a
    * 100 TB crawl directory decodes with per-file parallelism, nothing
    * driver-side.
    */
  def readSegments(spark: SparkSession, globPath: String): Dataset[DanmakuRecord] = {
    val files = spark.read.format("binaryFile").load(globPath)
      .select(col("content").as("bytes"))
      .as(Encoders.BINARY)
    files.flatMap(decodeSegment _)(Encoders.product[DanmakuRecord])
      .dropDuplicates("id")
      .as(Encoders.product[DanmakuRecord])
  }
}
