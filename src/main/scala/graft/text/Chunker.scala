package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking and reassembly — the context-window primitive of
  * an LLM corpus pipeline: shard long documents into fixed-size
  * character chunks that downstream stages (embedding, scoring,
  * dedup) process row-parallel, then reassemble per-document outputs
  * in chunk order.
  *
  * Chunking is row-local (explode over a position sequence);
  * reassembly is one hash aggregation whose ordered-concat runs on
  * each document's OWN chunk list (array_sort of collected structs —
  * no window, no global sort). Round-trip identity (reassemble ∘
  * chunk = id) is the q90 oracle's claim, proven by md5 against the
  * untouched source.
  */
object Chunker {

  /** (idCol, chunk_ix, chunk): 0-based fixed-size character chunks;
    * the last chunk carries the remainder. Empty text yields one
    * empty chunk (so every document survives the round trip).
    */
  def chunk(df: DataFrame, idCol: String, textCol: String, chunkChars: Int): DataFrame = {
    require(chunkChars >= 1, "chunkChars must be >= 1")
    df.select(col(idCol),
        posexplode(chunksOf(col(textCol), chunkChars)))
      .withColumnRenamed("pos", "chunk_ix")
      .withColumnRenamed("col", "chunk")
  }

  private def chunksOf(text: org.apache.spark.sql.Column, n: Int) = {
    // ceil(len/n)−1: double floor is exact for any text shorter than
    // 2^52 chars
    val last = greatest(
      floor((length(text) + lit(n - 1)) / lit(n)).cast("int") - 1, lit(0))
    transform(sequence(lit(0), last),
      i => text.substr(i * n + 1, lit(n)))
  }

  /** (idCol, text): chunks concatenated in chunk_ix order. */
  def reassemble(chunks: DataFrame, idCol: String, ixCol: String, chunkCol: String): DataFrame =
    chunks.groupBy(col(idCol))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col(ixCol), col(chunkCol)))),
          x => x(chunkCol)),
        "").as("text"))

  /** Overlapping sliding-window chunks — the RAG convention: a window
    * of `size` chars every `stride` chars, so consecutive chunks share
    * size−stride chars of context. Chunk i covers [i·stride,
    * i·stride+size); the count is 1 + ⌈max(len−size, 0)/stride⌉, which
    * guarantees the final chunk reaches the end of the text. Row-local
    * like [[chunk]].
    */
  def slidingChunk(df: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(stride >= 1 && size >= stride, "need 1 <= stride <= size")
    val m = greatest(length(col(textCol)) - lit(size), lit(0))
    // double-floor ceil is exact far beyond any real text length
    val last = floor((m + lit(stride - 1)) / lit(stride)).cast("int")
    df.select(col(idCol),
        posexplode(transform(sequence(lit(0), last),
          i => col(textCol).substr(i * stride + 1, lit(size)))))
      .withColumnRenamed("pos", "chunk_ix")
      .withColumnRenamed("col", "chunk")
  }

  /** Inverse of [[slidingChunk]]: the first chunk enters whole, every
    * later chunk contributes only the part beyond the size−stride
    * overlap (its start i·stride sits exactly overlap chars before the
    * previous coverage end (i−1)·stride+size). Lossless by
    * construction — q180's oracle pins it with md5 against the
    * untouched source.
    */
  def reassembleOverlapping(chunks: DataFrame, idCol: String, ixCol: String,
      chunkCol: String, size: Int, stride: Int): DataFrame = {
    val overlap = size - stride
    chunks.groupBy(col(idCol))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col(ixCol), col(chunkCol)))),
          x => when(x(ixCol) === 0, x(chunkCol))
            .otherwise(x(chunkCol).substr(lit(overlap + 1), lit(stride)))),
        "").as("text"))
  }
}
