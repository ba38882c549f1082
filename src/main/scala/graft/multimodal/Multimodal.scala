package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * The Spark-side design is real and tested: schema, partition-friendly
  * batch shape (mapPartitions over iterators — one decoder init per
  * partition, the same shape a JNI/FFmpeg binding needs), and
  * row-local metadata extraction. Image decode is REAL for the formats
  * the JDK ships codecs for (PNG/JPEG/GIF/BMP via `javax.imageio`,
  * header-only — no pixel decode); payloads no installed reader
  * recognizes fall back to `decodeImageStub`'s deterministic fake, so
  * pipelines over non-image payloads still exercise realistic value
  * distributions end-to-end (audio/video codecs are not in this
  * container — those stay stubbed by design).
  */
object Multimodal {

  final case class MediaMeta(
      mediaId: Long,
      modality: String,
      nBytes: Long,
      width: Int,
      height: Int,
      channels: Int,
      format: String)

  /** Wrap any table into the multimodal shape: (id, modality, content
    * binary). Real pipelines read this from parquet/tar shards; here any
    * string column doubles as payload bytes.
    */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String, modality: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(modality).as("modality"),
      col(payloadCol).cast("binary").as("content"))

  /** STUB image decode: deterministic fake dimensions from the payload
    * bytes, used when no installed `javax.imageio` reader recognizes
    * the payload. A full build would add FFmpeg-style codecs here; the
    * signature and partition shape stay identical.
    */
  def decodeImageStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val n = if (bytes == null) 0 else bytes.length
    val h = 120 + (math.abs(n * 2654435761L) % 1080).toInt
    val w = 160 + (math.abs(n * 40503L) % 1920).toInt
    (w, h, 3)
  }

  /** REAL image header decode via `javax.imageio`: width / height /
    * band count / format from the actual bytes, header-only (the
    * reader is never asked for pixels — `getWidth(0)` parses IHDR/SOF
    * markers), so cost is O(header) per row regardless of image size.
    * None when no installed reader recognizes the payload.
    */
  def decodeImageHeader(bytes: Array[Byte]): Option[(Int, Int, Int, String)] = {
    if (bytes == null || bytes.length == 0) return None
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis, true, true)
          val types = r.getImageTypes(0)
          val bands = if (types.hasNext) types.next().getNumBands else 3
          Some((r.getWidth(0), r.getHeight(0), bands,
            r.getFormatName.toLowerCase))
        } catch { case _: java.io.IOException => None }
        finally r.dispose()
      }
    } finally iis.close()
  }

  /** Decode stage: mapPartitions so codec state initializes once per
    * partition (not per row) — the batch shape that matters at scale.
    * Real header decode first; deterministic stub for unrecognized
    * payloads (`format` = "stub" marks the fallback).
    */
  def decodeMeta(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("modality"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder scope: ImageIO scans its reader SPI
        // registry once per lookup; heavier codecs would init here
        it.map { case (id, modality, bytes) =>
          val n = if (bytes == null) 0L else bytes.length.toLong
          decodeImageHeader(bytes) match {
            case Some((w, h, c, fmt)) => MediaMeta(id, modality, n, w, h, c, fmt)
            case None =>
              val (w, h, c) = decodeImageStub(bytes)
              MediaMeta(id, modality, n, w, h, c, "stub")
          }
        }
      }
  }

  /** Deterministic synthetic image bytes for planted-decode tests:
    * TYPE_INT_RGB gradient encoded by the JDK's own writer.
    */
  def syntheticImage(width: Int, height: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, ((x * 7 + y * 13) & 0xffffff))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  final case class PixelStats(
      mediaId: Long,
      width: Long,
      height: Long,
      sumR: Long,
      sumG: Long,
      sumB: Long,
      dsSumR: Long,
      dsNPx: Long)

  /** REAL pixel-level feature extraction: a full ImageIO decode of each
    * payload inside one mapPartitions pass (decoder machinery amortized
    * per partition, not per row), exact per-channel integer sums over
    * EVERY pixel, plus a stride-`stride` nearest-neighbor downsample
    * (the resize stage) summarized by its red-channel sum and pixel
    * count. Lossless formats (PNG/BMP/GIF) round-trip pixels exactly,
    * so the sums are closed-form checkable from the generator — the
    * pixel-proven counterpart of the header-only [[decodeMeta]].
    * Undecodable payloads are dropped.
    */
  def decodePixelStats(media: DataFrame, stride: Int = 2): Dataset[PixelStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            if (img == null) None
            else {
              val w = img.getWidth
              val h = img.getHeight
              var sr = 0L; var sg = 0L; var sb = 0L
              var dsr = 0L; var dsn = 0L
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val v = img.getRGB(x, y) & 0xffffff
                  sr += v >> 16; sg += (v >> 8) & 0xff; sb += v & 0xff
                  if (x % stride == 0 && y % stride == 0) {
                    dsr += v >> 16; dsn += 1L
                  }
                  x += 1
                }
                y += 1
              }
              Some(PixelStats(id, w.toLong, h.toLong, sr, sg, sb, dsr, dsn))
            }
          } catch { case _: Throwable => None }
        }
      }
  }

  /** Row-local binary metadata (no decode needed): byte length + digest —
    * pure Column expressions, used for dedup/integrity at scan speed.
    */
  def binaryMeta(content: Column): Seq[Column] = Seq(
    length(content).as("n_bytes"),
    md5(content).as("digest"))

  final case class AudioMeta(
      mediaId: Long,
      nBytes: Long,
      sampleRate: Int,
      channels: Int,
      bitsPerSample: Int,
      nFrames: Long,
      durationMs: Long,
      format: String)

  /** REAL WAV header parse — RIFF chunk walk in pure byte arithmetic
    * (PCM `fmt ` + `data` chunks), no codec dependency at all. Returns
    * (sampleRate, channels, bitsPerSample, nFrames); None for
    * non-RIFF/underspecified payloads.
    */
  def decodeWavHeader(bytes: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    if (bytes == null || bytes.length < 44) return None
    def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def le32(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    val isRiff = bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' &&
      bytes(10) == 'V' && bytes(11) == 'E'
    if (!isRiff) return None
    var off = 12
    var sr = 0; var ch = 0; var bps = 0; var dataLen = -1L
    while (off + 8 <= bytes.length && (sr == 0 || dataLen < 0)) {
      val id = new String(bytes, off, 4, "US-ASCII")
      val sz = le32(off + 4)
      if (id == "fmt " && off + 24 <= bytes.length) {
        ch = le16(off + 10); sr = le32(off + 12).toInt; bps = le16(off + 22)
      } else if (id == "data") dataLen = sz
      off += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
    }
    if (sr > 0 && ch > 0 && bps > 0 && dataLen >= 0)
      Some((sr, ch, bps, dataLen / (ch.toLong * (bps / 8))))
    else None
  }

  /** Audio decode stage: same mapPartitions batch shape as
    * [[decodeMeta]]. WAV headers parse for real; unrecognized payloads
    * fall back to a deterministic stub (`format` = "stub") so non-audio
    * bytes still flow end-to-end.
    */
  def decodeAudioMeta(media: DataFrame): Dataset[AudioMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val n = if (bytes == null) 0L else bytes.length.toLong
          decodeWavHeader(bytes) match {
            case Some((sr, ch, bps, frames)) =>
              AudioMeta(id, n, sr, ch, bps, frames, frames * 1000L / sr, "wav")
            case None =>
              AudioMeta(id, n, 16000, 1, 16, n, n * 1000L / 16000L, "stub")
          }
        }
      }
  }

  /** Deterministic synthetic PCM16 WAV for planted-decode tests: a
    * triangle-wave payload under a hand-built RIFF header (byte-exact,
    * no encoder dependency).
    */
  def syntheticWav(sampleRate: Int, channels: Int, nFrames: Int): Array[Byte] = {
    val bps = 16
    val blockAlign = channels * bps / 8
    val dataLen = nFrames * blockAlign
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * blockAlign).putShort(blockAlign.toShort)
      .putShort(bps.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var f = 0
    while (f < nFrames) {
      var c = 0
      while (c < channels) {
        bb.putShort(((f % 200) * 300 - 30000 + c).toShort)
        c += 1
      }
      f += 1
    }
    bb.array()
  }

  /** Deterministic synthetic animated GIF: `nFrames` gradient frames of
    * one size written by the JDK's own GIF sequence writer — the
    * multi-frame counterpart of [[syntheticImage]], so frame-level
    * decode can be proven against real bytes with no external codecs.
    */
  def syntheticGif(width: Int, height: Int, nFrames: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(
          width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            img.setRGB(x, y, ((x * 7 + y * 13 + f * 31) & 0xffffff))
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** REAL multi-frame decode: (frame_idx, width, height) per frame via
    * the installed reader (GIF in a stock JDK). Header/descriptor walk
    * only — no pixel data is materialized. Empty when no reader
    * recognizes the payload.
    */
  def decodeFrames(bytes: Array[Byte]): Seq[(Int, Int, Int)] = {
    if (bytes == null || bytes.length == 0) return Seq.empty
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) Seq.empty
      else {
        val r = readers.next()
        try {
          // allowSearch frame counting needs backward seeks
          r.setInput(iis, false, true)
          val n = r.getNumImages(true)
          (0 until n).map(i => (i, r.getWidth(i), r.getHeight(i)))
        } catch { case _: java.io.IOException => Seq.empty }
        finally r.dispose()
      }
    } finally iis.close()
  }

  /** Frame-sample stage with REAL decode: every `stride`-th frame of
    * each animated payload, as (media_id, frame_idx, width, height,
    * n_frames) rows. mapPartitions so the reader SPI registry is
    * scanned once per partition, not per row — the one-codec-init
    * batch shape that matters when a real video codec sits here.
    */
  def sampleRealFrames(media: DataFrame, stride: Int): DataFrame = {
    require(stride >= 1, "stride must be >= 1")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val frames = decodeFrames(bytes)
          frames.iterator.filter(_._1 % stride == 0).map {
            case (i, w, h) => (id, i.toLong, w.toLong, h.toLong,
              frames.length.toLong)
          }
        }
      }
      .toDF("media_id", "frame_idx", "width", "height", "n_frames")
  }

  /** Frame-sample stage for video-like payloads: deterministic stride
    * sampling of `nFrames` offsets out of the payload (stub: byte slices
    * stand in for decoded frames; the partitioning/explode shape is real).
    */
  def sampleFrames(media: DataFrame, nFrames: Int): DataFrame = {
    val step = greatest(floor(length(col("content")) / nFrames), lit(1)).cast("int")
    media.select(
      col("media_id"),
      posexplode(
        transform(
          sequence(lit(0), lit(nFrames - 1)),
          i => call_function("substring", col("content"), (i * step + 1).cast("int"), lit(16))))
        .as(Seq("frame_idx", "frame_bytes")))
  }
}
