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
}
