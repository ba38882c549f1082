package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy sequence packing for LLM training batches: place documents
  * into fixed-token-capacity bins WITHOUT splitting any document (the
  * fine-tuning convention — contrast Datasplit.tokenShards, which lays
  * text out contiguously and cuts mid-document, the pretraining
  * convention). Packing is inherently a sequential recurrence, so it is
  * sharded: documents are packed independently within each shard in a
  * deterministic order, and shards run in parallel.
  */
object Packing {

  /** Next-fit packing per shard: walk the shard's documents in
    * `orderCol` order keeping one open bin; when the next document
    * would overflow `capacity`, close the bin and open a new one. A
    * document larger than `capacity` occupies a bin alone (next-fit
    * never splits or reorders).
    *
    * Output: (`shardCol`, `orderCol`, `sizeCol`, bin, fill) with `bin`
    * the 0-based bin index within the shard and `fill` the bin's
    * running token count after placing the document.
    *
    * Scale shape: one shuffle keyed by shard; within each shard the
    * walk is `flatMapSortedGroups`' secondary sort — Spark sorts the
    * group SPILLABLY before handing over the iterator, so a shard never
    * has to fit in memory, and the recurrence itself is O(1) state.
    * Choose the shard count so per-shard work is balanced (a
    * uniformly-hashed id makes shards even); packing quality only
    * depends on the within-shard order, which is deterministic.
    */
  def nextFit(df: DataFrame, shardCol: String, orderCol: String,
      sizeCol: String, capacity: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val s = df.sparkSession
    import s.implicits._
    df.select(col(shardCol).cast("long"), col(orderCol).cast("long"),
        col(sizeCol).cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col(orderCol)) { (shard: Long, it: Iterator[(Long, Long, Long)]) =>
        var bin = 0L
        var fill = 0L
        it.map { case (_, id, sz) =>
          if (fill > 0L && fill + sz > capacity) { bin += 1L; fill = 0L }
          fill += sz
          (shard, id, sz, bin, fill)
        }
      }
      .toDF(shardCol, orderCol, sizeCol, "bin", "fill")
  }
}
