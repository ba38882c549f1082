package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.types.StructType

/** Observability data model.
  *
  * Mirrors the reference's three record types (SURVEY §1.3):
  *  - task metrics: reference `CustomTaskMetrics`
  *    (source/collector/.../CustomMetrics.scala:28-49)
  *  - stage-level skew aggregates: reference `CustomStageAggMetrics`
  *    (source/collector/.../CustomMetrics.scala:68-78)
  *  - enriched log events: Log4j2 LogEvent JSON + injected identity
  *    (source/collector/.../ObservabilityClient.scala:240-264)
  *
  * Counters are `Long` (the index mappings type them `long`,
  * .../templates/spark-task-metrics.json:21-71; the reference collector's
  * `Double` typing is a quirk we deliberately do not copy). Times are
  * `TimestampType` (epoch-millis `date` in the reference mappings).
  */
final case class TaskMetric(
    appName: String,
    appId: String,
    jobId: String,
    stageId: Int,
    stageAttemptId: Int,
    taskId: String,
    executorId: String,
    partitionId: Int,
    inputBytesRead: Long,
    inputRecordsRead: Long,
    runTime: Long,
    executorCpuTime: Long,
    peakExecutionMemory: Long,
    outputRecordsWritten: Long,
    outputBytesWritten: Long,
    shuffleRecordsRead: Long,
    shuffleBytesRead: Long,
    shuffleRecordsWritten: Long,
    shuffleBytesWritten: Long,
    metricTime: Timestamp
)

/** 8-column projection buffered for the stage aggregation — reference
  * `CustomLightTaskMetrics` (CustomMetrics.scala:54-63).
  */
final case class TaskMetricLite(
    appName: String,
    appId: String,
    jobId: String,
    stageId: Int,
    taskId: String,
    inputBytesRead: Long,
    shuffleBytesRead: Long,
    metricTime: Timestamp
)

/** Per-stage skewness aggregate — reference `CustomStageAggMetrics`
  * (CustomMetrics.scala:68-78). Skewness ∈ [0,1] by construction.
  */
final case class StageAggMetric(
    appName: String,
    appId: String,
    jobId: String,
    stageId: Int,
    inputBytesReadSkewness: Double,
    maxInputBytesRead: Long,
    shuffleBytesReadSkewness: Double,
    maxShuffleBytesRead: Long,
    metricTime: Timestamp
)

/** Log level struct — reference index mapping spark-logs.json:66-88. */
final case class LogLevel(intLevel: Long, name: String, standardLevel: String)

/** Enriched log record: flattened essentials of a Log4j2 LogEvent plus the
  * identity fields the reference injects at flush
  * (ObservabilityClient.scala:240-264) and the taskId/stageId parsed from the
  * MDC taskName ("task 12.0 in stage 2.0 (TID 42)",
  * ObservabilityClient.scala:255-264).
  */
final case class LogRecord(
    appName: String,
    appId: String,
    executorId: String,
    taskId: String,
    stageId: String,
    logTime: Timestamp,
    level: LogLevel,
    loggerName: String,
    threadName: String,
    message: String,
    mdcTaskName: String,
    thrownName: Option[String],
    thrownMessage: Option[String]
)

object Schemas {
  /** Discriminator values used for content routing — reference
    * metrics-pipeline.yaml:9-28 routes on `metricsType`.
    */
  val TaskMetricsType = "taskMetrics"
  val StageAggMetricsType = "stageAggMetrics"
  val LogsType = "logs"

  val taskMetrics: StructType = Encoders.product[TaskMetric].schema
  val taskMetricsLite: StructType = Encoders.product[TaskMetricLite].schema
  val stageAggMetrics: StructType = Encoders.product[StageAggMetric].schema
  val logRecords: StructType = Encoders.product[LogRecord].schema

  /** Canonical managed-table names (≙ the reference's three OpenSearch
    * indexes, bootstrap.py:223-229).
    */
  val TaskMetricsTable = "spark_task_metrics"
  val StageAggMetricsTable = "spark_stage_agg_metrics"
  val LogsTable = "spark_logs"
}
