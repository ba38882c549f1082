package graft.ingest

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.StageAggMetric

/** Stateful per-stage skewness aggregation with EXPLICIT custom state —
  * the stream-native equivalent of the reference's "aggregate when the
  * stage completes" callback (CustomMetricsListener.scala:77-83,146-188).
  *
  * A stage has no end-marker in the metric stream, so closure is
  * INFERRED: a stage's state emits when no new task for that
  * (appName, appId, jobId, stageId) key arrives before the event-time
  * watermark passes `inactivityMs` past the last observed task. That is
  * exactly the reference's semantics under a well-ordered stream, minus
  * its shared-buffer concurrent-stage bug (keys isolate stages here).
  *
  * State per live stage is O(1): running min/max/sum/count for the two
  * skew columns — the same algebraic form as the batch
  * `Skewness.stageAgg` (max(|x−avg|) = greatest(max−avg, avg−min)), so
  * emitted rows are bit-identical to the batch recompute. At 100 TB the
  * state store holds (live stages) entries, bounded and watermark-evicted.
  */
object StatefulStageAgg {

  final case class StageKey(appName: String, appId: String, jobId: String, stageId: Int)

  final case class StageState(
      nTasks: Long,
      sumIn: Long, minIn: Long, maxIn: Long,
      sumSh: Long, minSh: Long, maxSh: Long,
      lastMetricMillis: Long)

  final case class TaskLite(
      appName: String, appId: String, jobId: String, stageId: Int,
      inputBytesRead: Long, shuffleBytesRead: Long, metricTime: Timestamp)

  private def skew(mx: Long, mn: Long, sum: Long, n: Long): Double = {
    val avg = sum.toDouble / n
    val range = if (mx == mn) 1.0 else (mx - mn).toDouble
    math.max(mx - avg, avg - mn) / range
  }

  private[ingest] def updateState(
      key: StageKey,
      tasks: Iterator[TaskLite],
      state: GroupState[StageState],
      inactivityMs: Long): Iterator[StageAggMetric] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator.single(StageAggMetric(
        key.appName, key.appId, key.jobId, key.stageId,
        skew(s.maxIn, s.minIn, s.sumIn, s.nTasks), s.maxIn,
        skew(s.maxSh, s.minSh, s.sumSh, s.nTasks), s.maxSh,
        new Timestamp(s.lastMetricMillis)))
    } else {
      var s = state.getOption.getOrElse(
        StageState(0L, 0L, Long.MaxValue, Long.MinValue, 0L, Long.MaxValue, Long.MinValue, 0L))
      tasks.foreach { t =>
        s = StageState(
          s.nTasks + 1,
          s.sumIn + t.inputBytesRead,
          math.min(s.minIn, t.inputBytesRead),
          math.max(s.maxIn, t.inputBytesRead),
          s.sumSh + t.shuffleBytesRead,
          math.min(s.minSh, t.shuffleBytesRead),
          math.max(s.maxSh, t.shuffleBytesRead),
          math.max(s.lastMetricMillis, t.metricTime.getTime))
      }
      state.update(s)
      // close the stage when the watermark passes last-task + inactivity;
      // clamped above the current watermark — a stage whose tasks arrive
      // LATE (watermark already past them) closes at the next advance
      // instead of crashing the query
      state.setTimeoutTimestamp(
        math.max(s.lastMetricMillis + inactivityMs, state.getCurrentWatermarkMs() + 1))
      Iterator.empty
    }
  }

  /** Wire the stateful aggregation onto a (streaming) task-metric frame.
    * Emits one StageAggMetric per stage when the stage goes quiet.
    */
  def apply(tasks: DataFrame, watermarkDelay: String = "5 minutes",
      inactivityMs: Long = 60000L): Dataset[StageAggMetric] = {
    val spark = tasks.sparkSession
    import spark.implicits._
    tasks
      .withWatermark("metricTime", watermarkDelay)
      .select($"appName", $"appId", $"jobId", $"stageId",
        $"inputBytesRead", $"shuffleBytesRead", $"metricTime")
      .as[TaskLite]
      .groupByKey(t => StageKey(t.appName, t.appId, t.jobId, t.stageId))
      .flatMapGroupsWithState[StageState, StageAggMetric](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (k, it, st) => updateState(k, it, st, inactivityMs))
  }
}
