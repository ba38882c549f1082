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
}
