package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group location/scale statistics — exact lower median and
  * MAD (median absolute deviation) over an integral metric, plus
  * robust-z outlier counts. The robust counterpart of `Anomaly`'s
  * mean/stddev z-scores: a handful of corrupt extreme rows move the
  * mean and explode the stddev, but leave median/MAD (breakdown point
  * 50%) untouched — the right gate for feature sanity checks on raw
  * training data.
  *
  * Exactness contract: "median" is the LOWER median — the value at
  * 0-based rank floor((n-1)/2) under a deterministic (value, tie)
  * order — so every number here is an integer a SQL engine reproduces
  * exactly (no two-middle averaging, no interpolation).
  *
  * Scale shape: two group-keyed rank passes (values, then absolute
  * deviations), each one exchange + per-group sort; the per-group
  * median tables are broadcast back. Beyond per-executor sort scale,
  * substitute the `EquiDepth` two-phase distributed rank — the bound
  * definition is rank-based precisely so that swap changes nothing.
  */
object RobustStats {

  private def lowerMedian(df: DataFrame, groupCol: String, valCol: String,
      tieCols: Seq[String], out: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valCol) +: tieCols.map(col): _*)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(groupCol))))
      .filter(col("__rn") === expr("((__n - 1) div 2) + 1"))
      .select(col(groupCol), col(valCol).as(out))
  }

  /** Per group: n, med, mad, n_outliers where |v - med| > zmax * mad.
    * With mad = 0 (over half the group identical) every deviating row
    * counts as an outlier — the conventional degenerate-MAD reading.
    */
  def medianMadOutliers(df: DataFrame, groupCol: String, valCol: String,
      tieCol: String, zmax: Long): DataFrame = {
    val med = lowerMedian(df, groupCol, valCol, Seq(tieCol), "med")
    val withDev = df.join(broadcast(med), Seq(groupCol))
      .withColumn("__dev", abs(col(valCol) - col("med")))
    val mad = lowerMedian(withDev, groupCol, "__dev", Seq(valCol, tieCol), "mad")
    withDev.join(broadcast(mad), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), first(col("med")).as("med"),
        first(col("mad")).as("mad"),
        sum(when(col("__dev") > lit(zmax) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
  }
}
