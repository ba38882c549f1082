package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands: collapse a per-group sequence of integer positions
  * (days, sequence numbers, ...) into maximal runs of consecutive
  * values — activity streaks, coverage spans, missing-range detection.
  *
  * The classic rank-difference trick: within a group, consecutive
  * positions share a constant `pos − row_number()` value, so one
  * group-partitioned window plus one hash-agg produces every island.
  * Both the window and the aggregation are partitioned by the group
  * key — no global window, no self-join, no iteration; scales as one
  * exchange keyed on the group.
  */
object Islands {

  /** Collapse distinct (groupCol, posCol) rows into islands. Output:
    * groupCol, island_start, island_end, island_len.
    */
  def detect(df: DataFrame, groupCol: String, posCol: String): DataFrame = {
    val distinctPos = df.select(col(groupCol), col(posCol)).distinct()
    val w = Window.partitionBy(col(groupCol)).orderBy(col(posCol))
    distinctPos
      .withColumn("__grp", col(posCol) - row_number().over(w))
      .groupBy(col(groupCol), col("__grp"))
      .agg(min(col(posCol)).as("island_start"),
        max(col(posCol)).as("island_end"),
        count(lit(1)).as("island_len"))
      .drop("__grp")
  }
}
