package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inter-arrival time analysis: per-entity `lag` deltas between
  * consecutive events, summarized per category with exact integer
  * stats (count, min, max, exact lower median by rank arithmetic — the
  * same deterministic convention as [[RobustStats]]).
  *
  * The delta window is partitioned BY ENTITY (bounded frames, one
  * exchange on the entity key); the median rank window is partitioned
  * BY CATEGORY. Ties order on (delta, event id) so both engines select
  * the same row bit-for-bit. No FP: milliseconds in, milliseconds out.
  */
object InterArrival {

  /** Per-`typeCol` stats of the gaps between consecutive events of the
    * same `entityCol`, ordered by (tsMsCol, idCol). The gap is
    * attributed to its LATER event's type. Output: typeCol, n_deltas,
    * min_ms, max_ms, med_ms.
    */
  def stats(df: DataFrame, entityCol: String, tsMsCol: String,
      typeCol: String, idCol: String): DataFrame = {
    val wLag = Window.partitionBy(col(entityCol))
      .orderBy(col(tsMsCol), col(idCol))
    val deltas = df
      .withColumn("__delta", col(tsMsCol) - lag(col(tsMsCol), 1).over(wLag))
      .filter(col("__delta").isNotNull)
    val wRank = Window.partitionBy(col(typeCol))
      .orderBy(col("__delta"), col(idCol))
    val ranked = deltas
      .withColumn("__rn", row_number().over(wRank))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(typeCol))))
    val med = ranked
      .filter(col("__rn") === expr("(__n - 1) div 2 + 1"))
      .select(col(typeCol), col("__delta").as("med_ms"))
    deltas.groupBy(col(typeCol))
      .agg(count(lit(1)).as("n_deltas"),
        min(col("__delta")).as("min_ms"),
        max(col("__delta")).as("max_ms"))
      .join(med, typeCol)
  }
}
