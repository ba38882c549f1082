package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global equi-depth (equal-count) binning — the feature-bucketing /
  * histogram-equalization primitive: every row gets a bin in [0, k)
  * by its GLOBAL rank under (value, tiebreak), so bin populations
  * differ by at most one row, whatever the value distribution.
  *
  * A naive ntile() needs one global window = one partition = dead at
  * scale. This uses the same two-phase distributed prefix-sum shape
  * as [[Datasplit.tokenShards]]: range-repartition on the sort key,
  * count per partition, broadcast the (tiny, one-row-per-partition)
  * offsets back, and finish ranks with per-partition windows. The
  * only global ordering ever materialized is the partition-count-
  * sized offset frame. Bin ids are integral (`div`) — exact past
  * 2^53 rows — and replayable by any engine's row_number().
  */
object EquiDepth {

  /** Input columns + (rank, bin): rank is the 1-based global
    * (valueCol, tieCol) rank, bin = ((rank−1)·k) div N ∈ [0, k).
    * Ties are totally ordered by tieCol, so the result is
    * deterministic for unique tiebreaks.
    */
  def bins(
      df: DataFrame,
      valueCol: String,
      tieCol: String,
      k: Int,
      numPartitions: Int = 0): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    val parts = df
      .repartitionByRange(n, col(valueCol), col(tieCol))
      .withColumn("__pid", spark_partition_id())
      .persist()
    val counts = parts.groupBy(col("__pid")).agg(count(lit(1)).as("__pn"))
    // one row per partition: the only "global" window, bounded by n
    val offsets = counts
      .withColumn("__offset",
        coalesce(sum(col("__pn"))
          .over(Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val total = counts.agg(sum(col("__pn")).as("__total"))
    val intra = Window.partitionBy(col("__pid")).orderBy(col(valueCol), col(tieCol))
    parts
      .join(broadcast(offsets.drop("__pn")), "__pid")
      .crossJoin(broadcast(total))
      .withColumn("rank", col("__offset") + row_number().over(intra))
      .withColumn("bin", expr(s"((rank - 1) * $k) div __total").cast("int"))
      .drop("__pid", "__offset", "__total")
  }
}
