package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden-record survivorship: collapse a key's event/update history
  * into one profile row where each field carries its LATEST NON-NULL
  * value — the master-data-management merge rule ("most recent known
  * value wins, gaps don't erase"), plus first/last-seen and row-count
  * lineage.
  *
  * Per field f this is max over rows of struct(ts, tie, f) restricted
  * to f IS NOT NULL — a single algebraic aggregate: partial-agg'd
  * map-side, one shuffle on the key, no window over raw rows, no
  * sort. (The struct max IS the arg-max: Spark orders structs
  * lexicographically, and ts/tie lead.)
  */
object Survivorship {

  /** One row per key: last_<f> for each field (latest non-null by
    * (tsCol, tieCol)), plus first_seen / last_seen / n_rows.
    */
  def goldenRecord(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "no fields to merge")
    val fieldAggs = fields.map { f =>
      max(when(col(f).isNotNull, struct(col(tsCol), col(tieCol), col(f))))
        .getField(f).as(s"last_$f")
    }
    val meta = Seq(
      min(col(tsCol)).as("first_seen"),
      max(col(tsCol)).as("last_seen"),
      count(lit(1)).as("n_rows"))
    df.groupBy(col(keyCol)).agg((fieldAggs ++ meta).head, (fieldAggs ++ meta).tail: _*)
  }
}
