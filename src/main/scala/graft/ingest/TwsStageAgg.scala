package graft.ingest

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

import graft.model.StageAggMetric
import StatefulStageAgg.{StageKey, StageState, TaskLite}

/** Per-stage skewness aggregation on Spark 4's `transformWithState`
  * arbitrary-state API — the modern successor of
  * [[StatefulStageAgg]]'s `flatMapGroupsWithState`, same inferred
  * stage-closure semantics (emit when the event-time watermark passes
  * `inactivityMs` beyond the stage's last task; reference callback:
  * CustomMetricsListener.scala:77-83,146-188):
  *
  *  - state lives in a typed [[ValueState]] (RocksDB-backed — the API
  *    requires the RocksDB provider, which moves state off-heap and
  *    scales it past executor memory: the 100 TB story for hot state);
  *  - stage closure is an explicit event-time TIMER per key instead of
  *    `GroupStateTimeout` (timers are re-armed on every new task, so a
  *    straggling task pushes its stage's emission out);
  *  - emitted rows use the same algebraic min/max/sum/count fold as the
  *    batch `Skewness.stageAgg`, so all three stateful deliveries and
  *    the batch recompute are bit-identical.
  *
  * State per live stage is O(1); timers are one per live stage.
  */
object TwsStageAgg {

  final class Processor(inactivityMs: Long)
      extends StatefulProcessor[StageKey, TaskLite, StageAggMetric] {

    @transient private var state: ValueState[StageState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[StageState](
        "stage", Encoders.product[StageState], TTLConfig.NONE)

    private def emit(key: StageKey, s: StageState): StageAggMetric = {
      def skew(mx: Long, mn: Long, sum: Long, n: Long): Double = {
        val avg = sum.toDouble / n
        val range = if (mx == mn) 1.0 else (mx - mn).toDouble
        math.max(mx - avg, avg - mn) / range
      }
      StageAggMetric(
        key.appName, key.appId, key.jobId, key.stageId,
        skew(s.maxIn, s.minIn, s.sumIn, s.nTasks), s.maxIn,
        skew(s.maxSh, s.minSh, s.sumSh, s.nTasks), s.maxSh,
        new Timestamp(s.lastMetricMillis))
    }

    override def handleInputRows(key: StageKey, rows: Iterator[TaskLite],
        tv: TimerValues): Iterator[StageAggMetric] = {
      var s =
        if (state.exists()) state.get()
        else StageState(0L, 0L, Long.MaxValue, Long.MinValue, 0L,
          Long.MaxValue, Long.MinValue, 0L)
      rows.foreach { t =>
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
      // re-arm the stage's closure timer: drop any earlier timer and set
      // the new one past last-task + inactivity, clamped above the
      // current watermark so late-arriving tasks still close cleanly
      getHandle.listTimers().foreach(ts => getHandle.deleteTimer(ts.asInstanceOf[Long]))
      getHandle.registerTimer(
        math.max(s.lastMetricMillis + inactivityMs, tv.getCurrentWatermarkInMs() + 1))
      Iterator.empty
    }

    override def handleExpiredTimer(key: StageKey, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[StageAggMetric] =
      if (state.exists()) {
        val s = state.get()
        state.clear()
        Iterator.single(emit(key, s))
      } else Iterator.empty
  }

  /** Wire the processor onto a (streaming) task-metric frame. Emits one
    * StageAggMetric per stage when the stage goes quiet. The session
    * running this query must use the RocksDB state store provider
    * (`Pipelines.startMetricsTws` sets it on a cloned session).
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
      .transformWithState[StageAggMetric](
        new Processor(inactivityMs), TimeMode.EventTime(), OutputMode.Append())
  }
}
