package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

/** Multimodal plumbing: every decode kernel is real (JDK codecs for
  * image/audio, the IsoBmff box walker for video containers) and the
  * partition-batched harness must be deterministic and shape-stable.
  */
class MultimodalSpec extends AnyFunSuite with SparkTestBase {

  test("ImageIO disk cache: kernels disable it, and output bytes are cache-mode-independent") {
    // r17 optimization pin: the JDK default (useCache=true) spools every
    // stream-based encode/decode through a temp FILE in java.io.tmpdir —
    // the measured source of the image family's host-disk sensitivity.
    // The guard must flip the global off, and flipping it must not
    // change a single output byte (the cache is stream plumbing, not
    // codec state). Encode the same payload under both modes and
    // compare; the kernel call between them exercises the guard.
    val colors = Seq((10, 20, 30), (200, 100, 50), (0, 255, 7), (99, 98, 97))
    javax.imageio.ImageIO.setUseCache(true)
    assert(javax.imageio.ImageIO.getUseCache)
    val viaKernel = Multimodal.encodeGif(9, 11, colors) // guard fires inside
    assert(!javax.imageio.ImageIO.getUseCache,
      "encodeGif must disable the disk-backed stream cache")
    // genuine cross-mode decode comparison: read the same payload with a
    // FileCache stream (raw JDK path, cache forced on) and with the
    // kernel path (cache off) — every pixel must match
    def decodeAll(payload: Array[Byte]): Seq[Seq[Int]] = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
      try {
        reader.setInput(iis)
        (0 until reader.getNumImages(true)).map { i =>
          val img = reader.read(i)
          (for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
            yield img.getRGB(x, y)).toSeq
        }
      } finally { reader.dispose(); iis.close() }
    }
    javax.imageio.ImageIO.setUseCache(true) // force the disk-cached stream
    val diskPixels = decodeAll(viaKernel)
    javax.imageio.ImageIO.setUseCache(false)
    val memPixels = decodeAll(viaKernel)
    assert(diskPixels == memPixels,
      "decoded pixels must not depend on the ImageIO cache mode")
    assert(diskPixels.length == colors.length)
  }

  test("media features: one row per document, deterministic across runs") {
    val a = Multimodal.mediaFeatures(spark, sf).collect()
    val b = Multimodal.mediaFeatures(spark, sf).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length == Tables.documents(spark, sf).count())
  }

  test("media features: parsed MP4 metadata is internally consistent") {
    val bad = Multimodal.mediaFeatures(spark, sf)
      .filter(col("n_tracks") < 1 || col("n_tracks") > 2 ||
        col("timescale") < 600 || col("timescale") > 1000 ||
        col("duration_ms") < 10000L ||
        col("width") < 320 || col("height") < 240 ||
        col("mdat_bytes") < 16 || col("mdat_bytes") >= 80)
      .count()
    assert(bad == 0)
  }

  test("REAL MP4 box walk: every written field reads back exactly") {
    val bytes = graft.sources.IsoBmff.encode(
      timescale = 900, duration = 12345L, width = 640, height = 360,
      withAudio = true, mdat = Array.fill[Byte](33)(7))
    val info = graft.sources.IsoBmff.parse(bytes)
    assert(info.majorBrand == "isom")
    assert(info.timescale == 900L && info.duration == 12345L)
    assert(info.nTracks == 2 && info.hasAudio)
    assert(info.width == 640 && info.height == 360)
    assert(info.mdatBytes == 33L)
    val solo = graft.sources.IsoBmff.parse(graft.sources.IsoBmff.encode(
      600, 1L, 16, 16, withAudio = false, mdat = Array.emptyByteArray))
    assert(solo.nTracks == 1 && !solo.hasAudio && solo.mdatBytes == 0L)
  }

  test("REAL MP4 box walk: corrupt containers fail loudly, not as zero rows") {
    val good = graft.sources.IsoBmff.encode(
      600, 100L, 32, 32, withAudio = false, mdat = Array.emptyByteArray)
    // truncate mid-box: the header promises more bytes than exist
    intercept[IllegalArgumentException] {
      graft.sources.IsoBmff.parse(good.take(good.length - 4))
    }
    // no moov at all: a metadata pass must not fabricate a movie
    intercept[IllegalArgumentException] {
      graft.sources.IsoBmff.parse(good.take(28)) // the complete ftyp box only
    }
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

  test("REAL multi-frame GIF: every frame decodes back with its own exact color") {
    val s = spark
    implicit val enc = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.BINARY)
    val gif = Multimodal.encodeGif(5, 3, Seq((10, 20, 30), (200, 100, 50), (0, 0, 0)))
    val out = Multimodal.frameFeatures(s.createDataset(Seq(9L -> gif)))
      .orderBy("frame_idx").collect()
    assert(out.length == 3, "all three frames must be enumerated")
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getInt(1) == i && r.getInt(2) == 5 && r.getInt(3) == 3)
    }
    assert(out(0).getDouble(4) == 20.0)       // (10+20+30)/3
    assert(out(1).getDouble(4) == 350.0 / 3)  // (200+100+50)/3
    assert(out(2).getDouble(4) == 0.0)
  }

  test("REAL image decode measures pixel content: gradient brightness, PNG cross-format") {
    val s = spark
    implicit val enc = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.BINARY)
    import s.implicits._
    // a 2x1 image: one black pixel, one white → mean brightness 127.5,
    // provable only by actually reading both pixels back
    val img = new java.awt.image.BufferedImage(2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x000000); img.setRGB(1, 0, 0xffffff)
    val png = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos) // PNG: different codec
      bos.toByteArray                              // than the BMP encoder's
    }
    val bmp = Multimodal.encodeBmp(3, 2, 10, 20, 30)
    val out = Multimodal.imageFeatures(s.createDataset(Seq(1L -> png, 2L -> bmp)))
      .orderBy("doc_id").collect()
    assert(out(0).getInt(1) == 2 && out(0).getInt(2) == 1)
    assert(out(0).getDouble(3) == 127.5)
    assert(out(1).getInt(1) == 3 && out(1).getInt(2) == 2)
    assert(out(1).getDouble(3) == 20.0) // (10+20+30)/3
  }

  test("REAL image resize: dims change, uniform color survives, identity resize is lossless") {
    val bmp = Multimodal.encodeBmp(20, 10, 40, 80, 120)
    val small = Multimodal.resizeImage(bmp, 8, 8)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(small))
    assert(img.getWidth == 8 && img.getHeight == 8)
    for (x <- 0 until 8; y <- 0 until 8)
      assert((img.getRGB(x, y) & 0xffffff) == ((40 << 16) | (80 << 8) | 120))
    // identity-size resize of a non-uniform image keeps every pixel
    val src = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    src.setRGB(0, 0, 0xff0000); src.setRGB(1, 0, 0x00ff00)
    src.setRGB(0, 1, 0x0000ff); src.setRGB(1, 1, 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(src, "png", bos)
    val same = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.resizeImage(bos.toByteArray, 2, 2)))
    for (x <- 0 until 2; y <- 0 until 2)
      assert((same.getRGB(x, y) & 0xffffff) == (src.getRGB(x, y) & 0xffffff))
  }

  // ---- quarantine discipline: one torn object must not abort a stage --

  private def binEnc = org.apache.spark.sql.Encoders.tuple(
    org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.BINARY)

  test("chaos: corrupt image mid-partition quarantines; the stage survives") {
    val s = spark
    implicit val enc = binEnc
    val good = Multimodal.encodeBmp(4, 4, 10, 20, 30)
    val rows = s.createDataset(Seq(
      1L -> good, 2L -> Array[Byte](1, 2, 3, 4), 3L -> good)).repartition(1)
    val out = Multimodal.imageFeatures(rows).orderBy("doc_id").collect()
    assert(out.length == 3, "all rows surface, including the corrupt one")
    assert(out(0).getBoolean(5) && out(2).getBoolean(5))
    assert(out(0).getDouble(3) == 20.0 && out(2).getDouble(3) == 20.0)
    assert(!out(1).getBoolean(5) && !out(1).isNullAt(6), "quarantined with err")
    assert(out(1).isNullAt(1) && out(1).isNullAt(3), "no fabricated features")
    assert(out(1).getLong(4) == 4L, "byte_len still measured")
  }

  test("chaos: corrupt audio payload quarantines; valid neighbors decode") {
    val s = spark
    implicit val enc = binEnc
    val good = Multimodal.encodeWav(8000, 100, 500)
    val rows = s.createDataset(Seq(
      1L -> good, 2L -> "not a wav at all".getBytes, 3L -> good)).repartition(1)
    val out = Multimodal.audioFeatures(rows).orderBy("doc_id").collect()
    assert(out.length == 3)
    assert(out(0).getBoolean(5) && out(0).getDouble(4) == 500.0)
    assert(!out(1).getBoolean(5) && !out(1).isNullAt(6))
    assert(out(2).getBoolean(5) && out(2).getDouble(4) == 500.0)
  }

  test("chaos: corrupt animated payload quarantines as one frame_idx=-1 row") {
    val s = spark
    implicit val enc = binEnc
    val gif = Multimodal.encodeGif(3, 3, Seq((9, 9, 9), (18, 18, 18)))
    val rows = s.createDataset(Seq(
      1L -> gif, 2L -> Array[Byte](71, 73, 70, 0, 0), 3L -> gif)).repartition(1)
    val out = Multimodal.frameFeatures(rows)
    assert(out.filter(col("parse_ok")).count() == 4, "2 frames x 2 valid docs")
    val bad = out.filter(!col("parse_ok")).collect()
    assert(bad.length == 1 && bad(0).getLong(0) == 2L && bad(0).getInt(1) == -1)
  }

  test("chaos: corrupt MP4 container quarantines in the metadata kernel") {
    val s = spark
    implicit val enc = binEnc
    val good = graft.sources.IsoBmff.encode(
      600, 100L, 32, 32, withAudio = false, mdat = Array.emptyByteArray)
    val rows = s.createDataset(Seq(
      1L -> good, 2L -> good.take(good.length - 4), 3L -> good)).repartition(1)
    val out = Multimodal.mp4Features(rows).orderBy("doc_id").collect()
    assert(out.length == 3)
    assert(out(0).getBoolean(7) && out(2).getBoolean(7))
    assert(out(0).getInt(1) == 1 && out(0).getInt(4) == 32)
    assert(!out(1).getBoolean(7) && !out(1).isNullAt(8))
    assert(out(1).isNullAt(3), "no fabricated duration for the torn object")
  }

  // ---- parser hardening: crafted hostile containers -------------------

  test("box walk: crafted deep nesting fails loudly, not with a stack overflow") {
    // 40 nested moov boxes around an 8-byte free box: each wrapper adds
    // an 8-byte header
    val depth = 40
    var inner = java.nio.ByteBuffer.allocate(8)
      .putInt(8).put("free".getBytes("US-ASCII")).array()
    (1 to depth).foreach { _ =>
      inner = java.nio.ByteBuffer.allocate(8 + inner.length)
        .putInt(8 + inner.length).put("moov".getBytes("US-ASCII"))
        .put(inner).array()
    }
    val e = intercept[IllegalArgumentException] {
      graft.sources.IsoBmff.parse(inner)
    }
    assert(e.getMessage.contains("nesting"))
  }

  test("box walk: undersized leaf boxes fail loudly, not by reading neighbors") {
    def tiny(tpe: String): Array[Byte] = java.nio.ByteBuffer.allocate(10)
      .putInt(10).put(tpe.getBytes("US-ASCII")).putShort(0).array()
    for (t <- Seq("mvhd", "tkhd", "hdlr", "ftyp")) {
      val e = intercept[IllegalArgumentException] {
        graft.sources.IsoBmff.parse(tiny(t))
      }
      assert(e.getMessage.contains("too small") || e.getMessage.contains("mvhd"),
        s"$t: ${e.getMessage}")
    }
  }

  test("encoder: a duration beyond the version-0 u32 range is rejected, not wrapped") {
    intercept[IllegalArgumentException] {
      graft.sources.IsoBmff.encode(600, 0x100000000L, 32, 32,
        withAudio = false, mdat = Array.emptyByteArray)
    }
  }

  test("REAL audio decode measures sample content: mixed-amplitude RMS") {
    val s = spark
    implicit val enc = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.BINARY)
    // hand-build a 4-sample PCM16 WAV with amplitudes 3, -4, 0, 12 →
    // rms = sqrt((9+16+0+144)/4) = sqrt(42.25) = 6.5 exactly
    val base = Multimodal.encodeWav(16000, 4, 0)
    val buf = java.nio.ByteBuffer.wrap(base).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.position(44)
    Seq[Short](3, -4, 0, 12).foreach(buf.putShort)
    val out = Multimodal.audioFeatures(s.createDataset(Seq(7L -> base))).collect().head
    assert(out.getInt(1) == 16000 && out.getLong(2) == 4L)
    assert(out.getLong(3) == 250L) // 4 samples / 16 kHz = 250 us
    assert(out.getDouble(4) == 6.5)
  }
}
