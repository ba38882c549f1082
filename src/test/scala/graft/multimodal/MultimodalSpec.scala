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

  test("sampleFrames emits nFrames indexed slices per media row") {
    val frames = Multimodal.sampleFrames(media, 3)
    assert(frames.columns.toSeq == Seq("media_id", "frame_idx", "frame_bytes"))
    val byId = frames.groupBy($"media_id").count().as[(Long, Long)].collect().toMap
    assert(byId == Map(1L -> 3L, 2L -> 3L))
  }

  test("binaryMeta digest distinguishes payloads") {
    val d = media.select(($"media_id" +: Multimodal.binaryMeta($"content")): _*)
      .select($"digest").as[String].collect()
    assert(d.distinct.length == 2)
  }
}
