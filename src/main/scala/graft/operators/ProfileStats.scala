package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** One-pass data profiling — the "ANALYZE TABLE"-style summary a
  * pipeline runs before trusting a new drop of data: per column, row
  * count, null count, exact distinct count, and min/max.
  *
  * Output stays all-numeric so the result is engine-exact: numeric
  * columns cast min/max to double; string columns profile LENGTH
  * min/max (a cross-engine string-rendering-free proxy).
  *
  * Scale shape: ONE scan + one aggregation. The k exact
  * count(distinct)s expand the scan k+1-fold (Spark's Expand) before
  * a single shuffle — the standard exact-profile cost; swap in
  * approx_count_distinct when 2% error is acceptable and the expand
  * is not. Everything else is algebraic (partial-agg'd map-side).
  */
object ProfileStats {

  /** (col_name, n, n_null, n_distinct, min_v, max_v), one row per
    * profiled column.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "no columns to profile")
    def numed(c: String): Column = df.schema(c).dataType match {
      case StringType => length(col(c)).cast("double")
      case _          => col(c).cast("double")
    }
    val aggExprs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nnull"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(numed(c)).as(s"${c}__mn"),
        max(numed(c)).as(s"${c}__mx"))
    }
    val stackArgs = cols
      .map(c => s"'$c', `${c}__n`, `${c}__nnull`, `${c}__nd`, `${c}__mn`, `${c}__mx`")
      .mkString(", ")
    df.agg(aggExprs.head, aggExprs.tail: _*)
      .selectExpr(s"stack(${cols.size}, $stackArgs) " +
        "as (col_name, n, n_null, n_distinct, min_v, max_v)")
  }
}
