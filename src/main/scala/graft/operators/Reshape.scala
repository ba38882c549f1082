package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Wide→long reshape (melt / unpivot) — the inverse of the q80 pivot:
  * turn per-measure COLUMNS into (variable, value) ROWS so one generic
  * downstream (agg, drift gate, quality scorer) runs over every
  * measure instead of one hand-written branch per column. The
  * standard first step when a feature table with hundreds of metric
  * columns feeds a single anomaly/profiling pipeline.
  *
  * Scale shape: `Dataset.unpivot` plans an `Expand` — a map-side
  * row-multiplier emitting one row per (input row × value column)
  * inside whole-stage codegen. No shuffle, no UDF; column pruning
  * still reaches the scan (only id + melted columns are read). The
  * k× row fan-out is paid AFTER pushed filters, and a following
  * aggregation map-side-combines it straight back down.
  */
object Reshape {

  /** One output row per (row, value column): ids…, varCol (the source
    * column's name), valCol (its value). Value columns must share a
    * least common type — cast them first (unpivot refuses otherwise;
    * silent widening would corrupt an exact-integer pipeline).
    */
  def melt(df: DataFrame, ids: Seq[String], values: Seq[String],
      varCol: String = "variable", valCol: String = "value"): DataFrame =
    df.unpivot(ids.map(col).toArray, values.map(col).toArray, varCol, valCol)

  /** Melt every non-id column. */
  def meltAll(df: DataFrame, ids: Seq[String],
      varCol: String = "variable", valCol: String = "value"): DataFrame =
    df.unpivot(ids.map(col).toArray, varCol, valCol)
}
