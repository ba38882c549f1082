package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group winsorization (outlier clamping to exact rank-based
  * percentile bounds): a standard feature-cleaning step before model
  * training — extreme values are clamped, not dropped, so row counts
  * and group totals stay stable.
  *
  * Bounds are EXACT order statistics at ranks floor(p*(n-1))+1 with a
  * deterministic (value, id) tie order — pure integer rank arithmetic,
  * so a SQL engine replays them bit-for-bit (interpolated percentiles
  * would hang the compare on last-ulp FP).
  *
  * Scale shape: one group-keyed exchange feeds both the ranking window
  * and the count; the per-group bound table is tiny (2 rows per group)
  * and broadcast back for the row-local clamp. The full per-group sort
  * is the cost — for groups beyond executor-sort scale, swap the exact
  * rank for the two-phase distributed rank in `EquiDepth` (same bound
  * semantics, range-repartition + offsets) or an approx-percentile
  * bound if the contract allows it.
  */
object Winsorize {

  /** Clamp `valCol` (integral) within each `groupCol` to the exact
    * [pLo, pHi] rank bounds; adds `clamped`. `tieCol` makes rank order
    * total and replayable.
    */
  def clamp(df: DataFrame, groupCol: String, valCol: String, tieCol: String,
      pLo: Double, pHi: Double): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, "need 0 <= pLo < pHi <= 1")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valCol), col(tieCol))
    val cnt = Window.partitionBy(col(groupCol))
    val ranked = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(cnt))
    // floor(p*(n-1)) in pure integer/double-exact arithmetic: n is an
    // exact long, p a literal; +1 converts 0-based rank to row_number
    def rankAt(p: Double) =
      (floor(lit(p) * (col("__n") - lit(1)).cast("double")) + lit(1)).cast("long")
    val bounds = ranked
      .filter(col("__rn") === rankAt(pLo) || col("__rn") === rankAt(pHi))
      .groupBy(col(groupCol))
      .agg(min(col(valCol)).as("__lo"), max(col(valCol)).as("__hi"))
    df.join(broadcast(bounds), Seq(groupCol))
      .withColumn("clamped",
        greatest(least(col(valCol), col("__hi")), col("__lo")))
      .drop("__lo", "__hi")
  }
}
