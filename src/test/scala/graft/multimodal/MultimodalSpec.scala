package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def media = Multimodal.asMediaTable(
    Seq((1L, "abcdef"), (2L, "xy")).toDF("id", "payload"), "id", "payload", "image")

  test("asMediaTable yields (media_id, modality, binary content)") {
    val row = media.orderBy($"media_id").head()
    assert(row.getLong(0) == 1L && row.getString(1) == "image")
    assert(new String(row.getAs[Array[Byte]](2), "UTF-8") == "abcdef")
  }

  test("decodeMeta is deterministic and matches the stub arithmetic") {
    val m = Multimodal.decodeMeta(media).collect().map(x => x.mediaId -> x).toMap
    val (w, h, c) = Multimodal.decodeImageStub("abcdef".getBytes("UTF-8"))
    assert(m(1L).nBytes == 6L && m(1L).width == w && m(1L).height == h && m(1L).channels == c)
    assert(m(2L).nBytes == 2L)
  }

  test("real image headers decode exact dimensions; grayscale reports 1 band") {
    val png = Multimodal.syntheticImage(96, 56, "png")
    assert(Multimodal.decodeImageHeader(png).contains((96, 56, 3, "png")))
    val jpg = Multimodal.syntheticImage(33, 17, "jpeg")
    assert(Multimodal.decodeImageHeader(jpg).contains((33, 17, 3, "jpeg")))
    // grayscale: band count comes from the actual image type
    val gray = {
      val img = new java.awt.image.BufferedImage(
        10, 12, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    assert(Multimodal.decodeImageHeader(gray).contains((10, 12, 1, "png")))
    // non-image payloads are not recognized
    assert(Multimodal.decodeImageHeader("just text".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeImageHeader(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeImageHeader(null).isEmpty)
  }

  test("decodeMeta routes real images to imageio and the rest to the stub") {
    val mixed = Seq(
      (1L, "image", Multimodal.syntheticImage(80, 60, "png")),
      (2L, "image", "not an image".getBytes("UTF-8")))
      .toDF("media_id", "modality", "content")
    val m = Multimodal.decodeMeta(mixed).collect().map(x => x.mediaId -> x).toMap
    assert(m(1L).width == 80 && m(1L).height == 60 && m(1L).format == "png")
    val (w, h, _) = Multimodal.decodeImageStub("not an image".getBytes("UTF-8"))
    assert(m(2L).width == w && m(2L).height == h && m(2L).format == "stub")
  }

  test("sampleFrames emits nFrames indexed slices per media row") {
    val frames = Multimodal.sampleFrames(media, 3)
    assert(frames.columns.toSeq == Seq("media_id", "frame_idx", "frame_bytes"))
    val byId = frames.groupBy($"media_id").count().as[(Long, Long)].collect().toMap
    assert(byId == Map(1L -> 3L, 2L -> 3L))
  }

  test("decodePixelStats recounts a tiny gradient exactly; garbage is dropped") {
    // 3x2 gradient: v(x,y) = (x*7 + y*13) & 0xffffff, all < 256 here so
    // r = g = 0 per pixel and b = v
    val df = Seq(
      (9L, Multimodal.syntheticImage(3, 2, "png")),
      (10L, "not an image".getBytes)).toDF("media_id", "content")
    val got = Multimodal.decodePixelStats(df, stride = 2).collect().toList
    assert(got.map(_.mediaId) == List(9L))
    val vs = for (y <- 0 until 2; x <- 0 until 3) yield (x, y, x * 7 + y * 13)
    val s = got.head
    assert(s.width == 3L && s.height == 2L)
    assert(s.sumR == 0L && s.sumG == 0L)
    assert(s.sumB == vs.map(_._3.toLong).sum)
    assert(s.dsSumR == 0L)
    assert(s.dsNPx == vs.count { case (x, y, _) => x % 2 == 0 && y % 2 == 0 }.toLong)
  }

  test("binaryMeta digest distinguishes payloads") {
    val d = media.select(($"media_id" +: Multimodal.binaryMeta($"content")): _*)
      .select($"digest").as[String].collect()
    assert(d.distinct.length == 2)
  }
}
