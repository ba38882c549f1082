package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** SCD-type-2 dimension build: collapse an event/change stream into
  * validity intervals — one row per (key, value run) with
  * [valid_from, valid_to) bounds and a current-row flag. The
  * "replay the mutation log into a queryable dimension" staple of a
  * warehouse ingest layer.
  *
  * Semantics: events are ordered per key by (ts, tiebreak col); a new
  * interval opens exactly when the tracked value DIFFERS from the
  * previous event's value (gaps-and-islands). Repeated equal values
  * extend the current interval. The last interval per key is open
  * (valid_to null, is_current true).
  *
  * Scale shape: every window is partitioned by the dimension key —
  * one uniform hash partitioning, reused across the lag/island/bounds
  * steps (single Exchange; the island id and bounds run in the same
  * window stage). No global windows, no driver state.
  */
object Scd2 {

  def build(
      changes: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      tieCol: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val flagged = changes
      .withColumn("__prev", lag(col(valueCol), 1).over(byKey))
      // null-safe inequality: a leading null value still opens a run
      .withColumn("__new_run", when(!(col("__prev") <=> col(valueCol)), 1L).otherwise(0L))
      .withColumn("__run", sum(col("__new_run")).over(
        byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged
      .groupBy(col(keyCol), col("__run"))
      .agg(
        first(col(valueCol)).as("value"),
        min(col(tsCol)).as("valid_from"),
        count(lit(1)).as("n_events"))
      .withColumn("valid_to",
        lead(col("valid_from"), 1).over(
          Window.partitionBy(col(keyCol)).orderBy(col("__run"))))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol), col("value"), col("valid_from"), col("valid_to"),
        col("n_events"), col("is_current"))
  }

  /** STREAMING dimension maintenance: keep the SCD2 table current as
    * change events arrive, without ever rebuilding untouched keys.
    * Each micro-batch (1) lands idempotently in a batch_id-partitioned
    * history spool (a replayed batch dynamic-overwrites itself — the
    * at-least-once envelope of foreachBatch), then (2) recomputes
    * [[build]] ONLY for the key BUCKETS the batch touched, reading
    * those buckets' full history from the spool, and dynamic-
    * overwrites them in the dimension table. Exact recompute
    * semantics — the maintained table is bit-equal to a batch
    * [[build]] over everything delivered (the q91 oracle) — with
    * per-trigger work bounded by touched buckets, the
    * `startMetricsUpsert` device applied to a dimension.
    */
  def maintainStream(
      changes: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      tieCol: String,
      spoolPath: String,
      dimPath: String,
      checkpoint: String,
      buckets: Int = 16): StreamingQuery = {
    require(buckets >= 1, "buckets must be >= 1")
    changes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          batch.withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id").parquet(spoolPath)
          // touched buckets stay on executors (broadcast semi-join)
          val touched = broadcast(
            batch.select(pmod(col(keyCol), lit(buckets)).as("bucket")).distinct())
          val hist = s.read.parquet(spoolPath)
            .withColumn("bucket", pmod(col(keyCol), lit(buckets)))
            .join(touched, Seq("bucket"), "left_semi")
          build(hist.drop("batch_id", "bucket"), keyCol, tsCol, valueCol, tieCol)
            .withColumn("bucket", pmod(col(keyCol), lit(buckets)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket").parquet(dimPath)
        }
        ()
      }
      .start()
  }
}
