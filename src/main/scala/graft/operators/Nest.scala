package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational→nested assembly: collapse a child table into a sorted
  * `array<struct>` column on its parent — the "pack one training
  * example per row" export shape (order + its lines, conversation +
  * its turns, doc + its chunks) that feeds JSONL/sequence writers.
  * The inverse of `explode`; the last step before a corpus leaves the
  * relational world.
  *
  * Scale shape: one hash-agg on the child key (map-side partial
  * `collect_list` batches rows before the exchange) + one equi-join
  * to the parent — both on the same key, so AQE plans them as one
  * co-partitioned stage. `sort_array` orders each array row-locally
  * (structs compare field-by-field in declaration order — put the
  * sequence column first), so no window function and no global sort
  * anywhere. Per-parent fan-in is the skew bound: arrays are
  * driver-free but a single parent with millions of children makes a
  * jumbo row — cap or chunk upstream (q90's chunker) if the domain
  * allows unbounded children.
  */
object Nest {

  /** Left-join `parent` with a per-key sorted `array<struct<itemCols>>`
    * from `child`; childless parents get an EMPTY array, not null.
    * `itemCols` order defines both struct layout and sort precedence —
    * lead with columns forming a total order for determinism.
    * `parentKey`/`childKey` must be differently named (the child key
    * is dropped from the output).
    */
  def assemble(
      parent: DataFrame,
      child: DataFrame,
      parentKey: String,
      childKey: String,
      itemCols: Seq[String],
      itemsCol: String = "items"): DataFrame = {
    require(parentKey != childKey,
      "parentKey and childKey must be named differently (alias one side)")
    require(!parent.columns.contains(itemsCol),
      s"parent already has a column named $itemsCol")
    val packed = child.groupBy(col(childKey))
      .agg(sort_array(collect_list(struct(itemCols.map(col): _*))).as(itemsCol))
    val emptyTyped = array().cast(packed.schema(itemsCol).dataType)
    parent.join(packed, parent(parentKey) === packed(childKey), "left")
      .drop(childKey)
      .withColumn(itemsCol, coalesce(col(itemsCol), emptyTyped))
  }
}
