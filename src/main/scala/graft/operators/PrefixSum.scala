package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global running sum — the scalable replacement for
  * `sum(...).over(Window.orderBy(...))`, which moves the whole dataset
  * through ONE task. Same two-phase shape as [[GlobalRank]] /
  * `Datasplit.tokenShards`: range-partition on the sort keys (disjoint
  * ordered ranges), compute per-partition totals (one tiny row per
  * partition), turn those into cumulative offsets with an O(partitions)
  * window, broadcast them back, and run the intra-partition running sum
  * as a window PARTITIONED by partition id so every range scans in
  * parallel.
  */
object PrefixSum {

  /** Append an inclusive running sum of `valueCol` (must be integral)
    * ordered by `sortCols` — which must define a TOTAL order (include a
    * unique id as the last key; with duplicate sort keys the per-row
    * attribution inside a tie is partition-placement-dependent).
    * Descending order over a numeric key is expressed by sorting on its
    * negation.
    */
  def runningSum(df: DataFrame, sortCols: Seq[String], valueCol: String,
      outCol: String, numPartitions: Option[Int] = None): DataFrame = {
    val keys = sortCols.map(col)
    val parted = numPartitions
      .map(n => df.repartitionByRange(n, keys: _*))
      .getOrElse(df.repartitionByRange(keys: _*))
      .withColumn("__pid", spark_partition_id())
      .persist() // freeze sampled range boundaries for both consumers
    val offsets = parted.groupBy(col("__pid"))
      .agg(sum(col(valueCol)).as("__ptotal"))
      .withColumn("__off",
        coalesce(sum(col("__ptotal")).over(
          Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__ptotal")
    val intra = Window.partitionBy(col("__pid")).orderBy(keys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parted.join(broadcast(offsets), "__pid")
      .withColumn(outCol, (col("__off") + sum(col(valueCol)).over(intra)).cast("long"))
      .drop("__pid", "__off")
  }

  /** Inclusive running sum over a VALUE-DOMAIN frame (one row per
    * DISTINCT integral `valueCol` — per key group when `keyCols` is
    * non-empty — weights in `weightCol`): the shape percentile
    * extraction needs ("min v whose cumulative weight reaches the rank
    * threshold"). Unlike [[runningSum]] this variant needs NO persist
    * to stay correct: rows are coarse-bucketed by a DETERMINISTIC pure
    * function of the value (adaptive width from a 1-row GLOBAL min/max
    * broadcast), so the two consumers of the bucketing agree without
    * freezing sampled range boundaries. Per-(key, bucket) totals are
    * one tiny row each (≤ `buckets`+1 per key — the offsets window
    * partitions by the keys and runs at metadata scale), offsets
    * broadcast back, and the intra-bucket running sum partitions by
    * (keys, bucket id) — a single hot key's value domain never funnels
    * through one task. `totalCol` carries the per-key grand total on
    * every row (saves callers a separate aggregate + join of the same
    * input).
    *
    * Input rows must be distinct on (`keyCols`, `valueCol`) (a
    * value-domain counts frame is, by construction); `valueCol` must be
    * integral. Only `keyCols`, `valueCol`, and `weightCol` survive to
    * the output (plus `outCol`/`totalCol`) — other input columns are
    * dropped up front, so the internal temp names can never collide
    * with caller columns.
    *
    * CALLER CONTRACT on `keyCols`: the per-(key, bucket) offsets frame
    * is up to |keys|×(buckets+1) rows and is BROADCAST back by default
    * — keyed callers must have pruned/bounded key cardinality (the
    * SavedObjects callers are bounded by terms pruning). For an
    * unbounded key domain pass `broadcastOffsets = false`: the offsets
    * join falls back to the planner (AQE still broadcasts when the
    * frame turns out small, shuffles on (keys, bucket) when it
    * doesn't — both sides hash the same compound key, no hot task).
    */
  def valueDomainCumsum(counts: DataFrame, valueCol: String, weightCol: String,
      outCol: String, totalCol: String, buckets: Int = 1024,
      keyCols: Seq[String] = Seq.empty,
      broadcastOffsets: Boolean = true): DataFrame = {
    val keep = keyCols ++ Seq(valueCol, weightCol)
    val reserved = Set("__lo", "__hi", "__bk", "__off", "__bt")
    require(keep.toSet.intersect(reserved).isEmpty &&
      !reserved(outCol) && !reserved(totalCol),
      s"valueDomainCumsum reserves ${reserved.mkString(", ")} internally")
    val in = counts.select(keep.map(col): _*)
    val v = col(valueCol)
    val w = col(weightCol)
    val keys = keyCols.map(col)
    val bounds = in.agg(min(v).cast("long").as("__lo"),
      max(v).cast("long").as("__hi"))
    // width = (hi-lo) div buckets + 1 keeps __bk in [0, buckets] with no
    // multiplication (no int64 wrap for any value range)
    val bucketed = in.crossJoin(broadcast(bounds))
      .withColumn("__bk",
        expr(s"(`$valueCol` - __lo) div ((__hi - __lo) div $buckets + 1)"))
      .drop("__lo", "__hi")
    val joinKeys = keyCols :+ "__bk"
    val btot = bucketed.groupBy(joinKeys.map(col): _*).agg(sum(w).as("__bt"))
    val woff = Window.partitionBy(keys: _*).orderBy(col("__bk"))
    val off = btot.select(joinKeys.map(col) ++ Seq(
      coalesce(sum(col("__bt")).over(
        woff.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("__off"),
      sum(col("__bt")).over(
        woff.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .as(totalCol)): _*)
    bucketed.join(if (broadcastOffsets) broadcast(off) else off, joinKeys)
      .withColumn(outCol, (col("__off") + sum(w).over(
        Window.partitionBy(joinKeys.map(col): _*).orderBy(v)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .cast("long"))
      .drop("__bk", "__off")
  }
}
