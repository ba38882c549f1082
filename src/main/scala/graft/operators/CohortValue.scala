package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort value curves (LTV): entities cohorted by first-activity
  * bucket, then per cohort-age the active count, the value collected,
  * and the running cumulative value — the "how much is a January
  * signup worth by day 30" readout that [[Retention]]'s activity
  * matrix doesn't price.
  *
  * Shape: one entity-keyed min-agg for cohort assignment, one
  * entity-keyed equi-join back (both map-combinable / co-partitioned
  * on the entity key), then a (cohort, age) hash-agg; the cumulative
  * window runs only on that bounded cohort×age frame. Values are
  * caller-integerized units so every column is an exact integer.
  */
object CohortValue {

  /** Per (cohort_day, age): n_active (distinct entities), value_units,
    * cum_value (running per-cohort total through this age).
    */
  def curves(df: DataFrame, entityCol: String, dayCol: String,
      valueUnitsCol: String): DataFrame = {
    val cohorts = df.groupBy(col(entityCol))
      .agg(min(col(dayCol)).as("cohort_day"))
    val aged = df.join(cohorts, entityCol)
      .withColumn("age", col(dayCol) - col("cohort_day"))
    val grid = aged.groupBy(col("cohort_day"), col("age"))
      .agg(countDistinct(col(entityCol)).as("n_active"),
        sum(col(valueUnitsCol)).as("value_units"))
    val w = Window.partitionBy(col("cohort_day")).orderBy(col("age"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.withColumn("cum_value", sum(col("value_units")).over(w))
  }
}
