package graft.sources

import java.nio.ByteBuffer

/** Minimal ISO-BMFF (MP4) container codec — pure big-endian byte
  * arithmetic over the public ISO/IEC 14496-12 box layout, the video
  * analog of the protobuf wire-format decoder in BinaryIngest.
  *
  * The JDK ships no video FRAME codec, but container METADATA (brand,
  * movie header, track headers, handler types, sample-data extent) is
  * plain structure: `size(4) type(4) payload` boxes, nested. That
  * metadata pass is the part of a video pipeline a 100 TB
  * statistics/filtering stage actually runs on every object — frame
  * decode happens downstream in a native/GPU stage on the survivors.
  * Reference scope: metadata extraction over opaque media columns
  * (SURVEY.md §2 multimodal rows; same honest-payload pattern as
  * Multimodal's BMP/WAV/GIF round trips).
  *
  * Encoder writes `ftyp moov(mvhd trak(tkhd mdia(mdhd hdlr))...) mdat`;
  * parser walks boxes with bounds checks (64-bit `largesize` and
  * size-0 run-to-end forms included) and fails loudly on a malformed
  * payload rather than emitting silent zeros.
  */
object IsoBmff {

  // ---- encoder ---------------------------------------------------------

  private def be32(i: Int): Array[Byte] = ByteBuffer.allocate(4).putInt(i).array()

  private def box(tpe: String, parts: Array[Byte]*): Array[Byte] = {
    val size = 8 + parts.map(_.length).sum
    val buf = ByteBuffer.allocate(size)
    buf.putInt(size).put(tpe.getBytes("US-ASCII"))
    parts.foreach(buf.put)
    buf.array()
  }

  /** FullBox payload prefix: version byte + 24-bit flags. */
  private def full(version: Int, flags: Int, payload: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + payload.length)
    buf.putInt((version << 24) | (flags & 0xffffff)).put(payload)
    buf.array()
  }

  private val unityMatrix: Array[Byte] = {
    val buf = ByteBuffer.allocate(36)
    Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000).foreach(buf.putInt)
    buf.array()
  }

  private def mvhd(timescale: Int, duration: Long, nextTrackId: Int): Array[Byte] = {
    val buf = ByteBuffer.allocate(96)
    buf.putInt(0).putInt(0)                   // creation, modification
    buf.putInt(timescale).putInt(duration.toInt)
    buf.putInt(0x00010000)                    // rate 1.0 (16.16)
    buf.putShort(0x0100.toShort)              // volume 1.0 (8.8)
    buf.putShort(0).putLong(0L)               // reserved
    buf.put(unityMatrix)
    (0 until 6).foreach(_ => buf.putInt(0))   // pre_defined
    buf.putInt(nextTrackId)
    box("mvhd", full(0, 0, buf.array()))
  }

  private def tkhd(trackId: Int, duration: Long, width: Int, height: Int,
                   audio: Boolean): Array[Byte] = {
    val buf = ByteBuffer.allocate(80)
    buf.putInt(0).putInt(0).putInt(trackId).putInt(0).putInt(duration.toInt)
    buf.putLong(0L)                           // reserved
    buf.putShort(0).putShort(0)               // layer, alternate_group
    buf.putShort(if (audio) 0x0100.toShort else 0).putShort(0)
    buf.put(unityMatrix)
    buf.putInt(width << 16).putInt(height << 16) // 16.16 fixed point
    box("tkhd", full(0, 7, buf.array()))      // enabled | in_movie | in_preview
  }

  private def mdhd(timescale: Int, duration: Long): Array[Byte] = {
    val buf = ByteBuffer.allocate(20)
    buf.putInt(0).putInt(0).putInt(timescale).putInt(duration.toInt)
    buf.putShort(0x55C4.toShort)              // packed ISO-639-2 'und'
    buf.putShort(0)
    box("mdhd", full(0, 0, buf.array()))
  }

  private def hdlr(handler: String, name: String): Array[Byte] = {
    val nm = name.getBytes("US-ASCII")
    val buf = ByteBuffer.allocate(20 + nm.length + 1)
    buf.putInt(0).put(handler.getBytes("US-ASCII"))
    buf.putInt(0).putInt(0).putInt(0)         // reserved
    buf.put(nm).put(0.toByte)                 // null-terminated name
    box("hdlr", full(0, 0, buf.array()))
  }

  private def trak(trackId: Int, duration: Long, timescale: Int,
                   width: Int, height: Int, audio: Boolean): Array[Byte] =
    box("trak",
      tkhd(trackId, duration, width, height, audio),
      box("mdia",
        mdhd(timescale, duration),
        hdlr(if (audio) "soun" else "vide",
          if (audio) "SoundHandler" else "VideoHandler")))

  /** A structurally valid single-video-track (plus optional audio
    * track) MP4 container with the given movie parameters and raw
    * sample-data payload.
    */
  def encode(timescale: Int, duration: Long, width: Int, height: Int,
             withAudio: Boolean, mdat: Array[Byte]): Array[Byte] = {
    // version-0 boxes carry u32 durations; silently writing
    // duration.toInt would wrap a >u32 value into a corrupt container
    require(duration >= 0 && duration <= 0xffffffffL,
      s"duration $duration exceeds the version-0 u32 box range")
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), be32(0x200),
      "isom".getBytes("US-ASCII"), "iso2".getBytes("US-ASCII"),
      "mp41".getBytes("US-ASCII"))
    val nTracks = if (withAudio) 2 else 1
    val traks =
      trak(1, duration, timescale, width, height, audio = false) +:
        (if (withAudio) Seq(trak(2, duration, timescale, 0, 0, audio = true))
         else Nil)
    ftyp ++ box("moov", (mvhd(timescale, duration, nTracks + 1) +: traks): _*) ++
      box("mdat", mdat)
  }

  // ---- parser ----------------------------------------------------------

  final case class Mp4Info(
      majorBrand: String, timescale: Long, duration: Long, nTracks: Int,
      width: Int, height: Int, hasAudio: Boolean, mdatBytes: Long)

  /** Walk the box tree and extract movie metadata. Bounds-checked
    * throughout; any overrun, truncated header, or missing movie header
    * throws (a metadata pass must surface corrupt objects, not count
    * them as zero-duration movies).
    */
  def parse(bytes: Array[Byte]): Mp4Info = {
    var major = ""
    var timescale = -1L
    var duration = -1L
    var nTracks = 0
    var width = 0
    var height = 0
    var hasAudio = false
    var mdatBytes = 0L

    def u32(off: Int): Long =
      ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
        ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)
    def u64(off: Int): Long = (u32(off) << 32) | u32(off + 4)
    def str4(off: Int): String = new String(bytes, off, 4, "US-ASCII")

    // a crafted deeply-nested box chain must fail loudly, not blow the
    // stack: real containers nest moov/trak/mdia a handful of levels
    val maxDepth = 32

    def walk(start: Int, end: Int, depth: Int): Unit = {
      require(depth <= maxDepth, s"box nesting deeper than $maxDepth")
      var off = start
      while (off < end) {
        require(off + 8 <= end, s"truncated box header at offset $off")
        var size = u32(off)
        var hdr = 8
        val tpe = str4(off + 4)
        if (size == 1) { // 64-bit largesize form
          require(off + 16 <= end, s"truncated largesize header at $off")
          size = u64(off + 8); hdr = 16
        } else if (size == 0) size = end - off // runs to end of container
        require(size >= hdr && size <= (end - off).toLong,
          s"box $tpe at $off overruns its container (size=$size)")
        val body = off + hdr
        val bodyEnd = off + size.toInt
        // leaf boxes read fixed offsets: a malformed-but-in-container
        // small box must fail HERE, not misparse adjacent boxes' bytes
        def leaf(min: Int): Unit = require(bodyEnd - body >= min,
          s"$tpe box too small (${bodyEnd - body} < $min payload bytes)")
        tpe match {
          case "ftyp" =>
            leaf(4)
            major = str4(body)
          case "moov" | "mdia" => walk(body, bodyEnd, depth + 1)
          case "trak" => nTracks += 1; walk(body, bodyEnd, depth + 1)
          case "mvhd" =>
            val v = bytes(body) & 0xff
            if (v == 1) { leaf(32); timescale = u32(body + 20); duration = u64(body + 24) }
            else { leaf(20); timescale = u32(body + 12); duration = u32(body + 16) }
          case "tkhd" =>
            // spec-minimum payload: fullbox(4) + 80 (v0) / + 92 (v1)
            leaf(if ((bytes(body) & 0xff) == 1) 96 else 84)
            // width/height are the final 8 payload bytes in v0 and v1
            val w = (u32(bodyEnd - 8) >> 16).toInt
            val h = (u32(bodyEnd - 4) >> 16).toInt
            if (w > 0 && h > 0) { width = w; height = h }
          case "hdlr" =>
            leaf(12)
            if (str4(body + 8) == "soun") hasAudio = true
          case "mdat" => mdatBytes += size - hdr
          case _ => () // skip boxes this metadata pass doesn't read
        }
        off += size.toInt
      }
    }
    walk(0, bytes.length, 0)
    require(timescale > 0, "no movie header (mvhd) found")
    Mp4Info(major, timescale, duration, nTracks, width, height, hasAudio,
      mdatBytes)
  }
}
