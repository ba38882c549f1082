package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quantile normalization: replace each group's values with the value
  * at the SAME relative rank in the global (all-groups) distribution —
  * the classic cross-batch feature calibration (microarray-style) that
  * makes "p95 of shard A" comparable to "p95 of shard B" regardless of
  * each shard's own scale or skew.
  *
  * All-integer rank arithmetic, no interpolation: a row at rank r of n
  * within its group maps to global sorted position
  * `(r-1)·(N-1) div (n-1) + 1` (1-based; group min → global min,
  * group max → global max; a singleton group takes the global lower
  * median `(N+1) div 2`). Operands are non-negative, so Spark's
  * truncating `div` and DuckDB's flooring `//` agree.
  *
  * Scale shape: the global order comes from [[GlobalRank]] (range
  * exchange + partition-local numbering — never one funnel partition);
  * group ranks are a group-partitioned window; the mapping is one
  * equi-join on the computed position (uniform key). No collect, no
  * global window.
  */
object QuantileNorm {

  /** Append `normCol`: the global-distribution value at this row's
    * within-group relative rank. `tieCol` must totalize the order.
    */
  def normalize(df: DataFrame, groupCol: String, valueCol: String,
      tieCol: String, normCol: String = "norm"): DataFrame = {
    val global = GlobalRank.rowNumber(
        df.select(col(valueCol), col(tieCol)), Seq(valueCol, tieCol), "__gr")
      .select(col("__gr").as("__idx"), col(valueCol).as(normCol))
    val n = df.count()
    val byGroup = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol), col(tieCol))
    df
      .withColumn("__r", row_number().over(byGroup).cast("long"))
      .withColumn("__cnt", count(lit(1)).over(
        Window.partitionBy(col(groupCol))))
      .withColumn("__idx",
        when(col("__cnt") === 1L, lit((n + 1) / 2))
          .otherwise(expr(s"(__r - 1) * ${n - 1}L div (__cnt - 1) + 1")))
      .join(global, "__idx")
      .drop("__r", "__cnt", "__idx")
  }
}
