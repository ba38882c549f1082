package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Near-time duplicate detection for event streams: the same logical
  * event re-emitted within a short window (client retries, at-least-
  * once delivery replays) is a duplicate even though its event_id
  * differs — exact-id dedup ([[graft.dedup.Dedup.exact]]) can't see
  * it. An event is a near-time duplicate when the previous event of
  * the same (entity, type) is at most `windowMs` older.
  *
  * One shuffle, on the (entity, type) composite — the window frame is
  * a per-entity timeline, so partitions scale with entity cardinality
  * and no global ordering exists anywhere. The per-type rollup after
  * it is a tiny agg. This lag-based rule is deliberately chain-
  * tolerant (three events 4 s apart = two duplicates), matching the
  * streaming `dropDuplicatesWithinWatermark` view of retries rather
  * than a "distance to last KEPT" scan, which would be sequential
  * per key and is not what delivery-replay cleanup wants.
  */
object WindowDedup {

  /** Per `typeCol`: n_events, n_dups (events whose same-key
    * predecessor is ≤ windowMs older), dup_ppm (truncating ppm).
    * `tsMsCol` is epoch-millis; `tieCol` breaks equal timestamps
    * deterministically.
    */
  def dupStats(df: DataFrame, entityCol: String, typeCol: String,
      tsMsCol: String, tieCol: String, windowMs: Long): DataFrame = {
    val w = Window.partitionBy(col(entityCol), col(typeCol))
      .orderBy(col(tsMsCol), col(tieCol))
    df.select(col(entityCol), col(typeCol), col(tsMsCol), col(tieCol))
      .withColumn("__prev", lag(col(tsMsCol), 1).over(w))
      .withColumn("__dup",
        when(col("__prev").isNotNull &&
          col(tsMsCol) - col("__prev") <= windowMs, 1L).otherwise(0L))
      .groupBy(col(typeCol))
      .agg(count(lit(1)).as("n_events"), sum(col("__dup")).as("n_dups"))
      .withColumn("dup_ppm", expr("(n_dups * 1000000L) div n_events"))
  }
}
