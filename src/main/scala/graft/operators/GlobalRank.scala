package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global row numbering: assign `row_number()` over a TOTAL
  * order without ever collapsing the data to one partition.
  *
  * `Window.orderBy(...)` with no partition spec is the classic Spark
  * scale trap — every row funnels through a single task. This operator
  * keeps the numbering distributed:
  *
  *   1. `repartitionByRange` + `sortWithinPartitions` on the order key —
  *      one range exchange, Spark's own distributed sort machinery;
  *   2. per-partition row counts — an algebraic aggregate whose result
  *      is #partitions rows (metadata-scale, never data-scale);
  *   3. cumulative offsets over that tiny frame (the only unpartitioned
  *      window runs over #partitions rows) broadcast-joined back;
  *   4. partition-LOCAL `row_number` + offset = the global rank.
  *
  * The result is identical to the single-partition window for any TOTAL
  * order (callers must include a tiebreaker column, e.g. the row id);
  * range boundaries chosen by sampling affect only which partition a row
  * lands in, never its global rank.
  */
object GlobalRank {

  /** Append a 1-based global `row_number` column named `outCol`, ordered
    * by `sortCols` (which must define a total order).
    */
  def rowNumber(df: DataFrame, sortCols: Seq[String], outCol: String,
      numPartitions: Option[Int] = None): DataFrame = {
    val keys = sortCols.map(col)
    val parted = numPartitions
      .map(n => df.repartitionByRange(n, keys: _*))
      .getOrElse(df.repartitionByRange(keys: _*))
      .sortWithinPartitions(keys: _*)
      .withColumn("__pid", spark_partition_id())
      .persist()
    val counts = parted.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
    val offsets = counts.withColumn("__off",
      coalesce(sum(col("__cnt")).over(
        Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__cnt")
    val local = row_number().over(
      Window.partitionBy(col("__pid")).orderBy(keys: _*))
    parted.join(broadcast(offsets), "__pid")
      .withColumn(outCol, local.cast("long") + col("__off"))
      .drop("__pid", "__off")
  }
}
