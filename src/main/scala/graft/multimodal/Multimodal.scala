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
  * row-local metadata extraction. The codec itself is STUBBED with a
  * deterministic fake (this container has no image/audio libraries):
  * `decodeImageStub` derives plausible dimensions from the bytes, so
  * pipelines exercise realistic value distributions end-to-end.
  */
object Multimodal {

  final case class MediaMeta(
      mediaId: Long,
      modality: String,
      nBytes: Long,
      width: Int,
      height: Int,
      channels: Int)

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
    * bytes. A real build replaces the body with an image codec; the
    * signature and partition shape stay identical.
    */
  def decodeImageStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val n = if (bytes == null) 0 else bytes.length
    val h = 120 + (math.abs(n * 2654435761L) % 1080).toInt
    val w = 160 + (math.abs(n * 40503L) % 1920).toInt
    (w, h, 3)
  }

  /** Decode stage: mapPartitions so a real codec initializes once per
    * partition (not per row) — the batch shape that matters at scale.
    */
  def decodeMeta(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("modality"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // real impl: val codec = Codec.open() here, once per partition
        it.map { case (id, modality, bytes) =>
          val (w, h, c) = decodeImageStub(bytes)
          MediaMeta(id, modality, if (bytes == null) 0L else bytes.length.toLong, w, h, c)
        }
      }
  }

  /** Row-local binary metadata (no decode needed): byte length + digest —
    * pure Column expressions, used for dedup/integrity at scan speed.
    */
  def binaryMeta(content: Column): Seq[Column] = Seq(
    length(content).as("n_bytes"),
    md5(content).as("digest"))

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
