package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Schemas

/** Pure DataFrame→DataFrame stages of the ingestion dataflow (SURVEY
  * §2.1). Each stage is batch/stream agnostic — the same function is
  * unit-tested on batch frames and composed into the streaming pipelines
  * — and each is a narrow, codegen'd projection/filter (no shuffle), so
  * the streaming micro-batches stay scan-speed.
  *
  * Reference correspondence:
  *  - projectTaskMetrics ≙ collectTaskCustomMetrics
  *    (source/collector/.../CustomMetricsListener.scala:111-134)
  *  - enrichJobId ≙ the stageId→jobId HashMap probe
  *    (CustomMetricsListener.scala:31,59-65,115)
  *  - injectIdentity ≙ flushEvents' appName/appId/executorId injection
  *    (ObservabilityClient.scala:239-254)
  *  - parseMdc ≙ the MDC taskName split
  *    (ObservabilityClient.scala:255-264; patterns at :130-131)
  *  - route ≙ the Data Prepper route on metricsType
  *    (deployment/infra/resources/pipelines/metrics-pipeline.yaml:9-11)
  */
object Transforms {

  /** Wire schema of raw collector metric events (the JSON the reference
    * POSTs): union of task-metric and stage-agg fields plus the
    * `metricsType` discriminator; times are epoch millis.
    */
  val rawMetricSchema: StructType = StructType(Seq(
    StructField("metricsType", StringType),
    StructField("appName", StringType),
    StructField("appId", StringType),
    StructField("jobId", StringType),
    StructField("stageId", IntegerType),
    StructField("stageAttemptId", IntegerType),
    StructField("taskId", StringType),
    StructField("executorId", StringType),
    StructField("partitionId", IntegerType),
    StructField("inputBytesRead", LongType),
    StructField("inputRecordsRead", LongType),
    StructField("runTime", LongType),
    StructField("executorCpuTime", LongType),
    StructField("peakExecutionMemory", LongType),
    StructField("outputRecordsWritten", LongType),
    StructField("outputBytesWritten", LongType),
    StructField("shuffleRecordsRead", LongType),
    StructField("shuffleBytesRead", LongType),
    StructField("shuffleRecordsWritten", LongType),
    StructField("shuffleBytesWritten", LongType),
    StructField("metricTime", LongType),
    // stage-agg passthrough fields (reference-style collectors may POST
    // pre-aggregated records; routed to the stage table untouched)
    StructField("inputBytesReadSkewness", DoubleType),
    StructField("maxInputBytesRead", LongType),
    StructField("shuffleBytesReadSkewness", DoubleType),
    StructField("maxShuffleBytesRead", LongType)
  ))

  /** Wire schema of raw log events: flattened Log4j2 LogEvent JSON plus
    * the identity fields injected at flush (reference spark-logs mapping,
    * .../templates/spark-logs.json).
    */
  val rawLogSchema: StructType = StructType(Seq(
    StructField("appName", StringType),
    StructField("appId", StringType),
    StructField("executorId", StringType),
    StructField("logTime", LongType),
    StructField("loggerName", StringType),
    StructField("threadName", StringType),
    StructField("message", StringType),
    StructField("level", StructType(Seq(
      StructField("intLevel", LongType),
      StructField("name", StringType),
      StructField("standardLevel", StringType)))),
    StructField("mdcTaskName", StringType),
    StructField("thrownName", StringType),
    StructField("thrownMessage", StringType)
  ))

  // ---- Reference-parity deep log schema (spark-logs.json:21-47,126-325)

  /** One extended stack-trace frame (Log4j2 ThrowableProxy JSON). */
  val stackFrameSchema: StructType = StructType(Seq(
    StructField("stackTraceElement", StructType(Seq(
      StructField("classLoaderName", StringType),
      StructField("declaringClass", StringType),
      StructField("fileName", StringType),
      StructField("lineNumber", LongType),
      StructField("methodName", StringType),
      StructField("moduleName", StringType),
      StructField("moduleVersion", StringType)))),
    StructField("extraClassInfo", StructType(Seq(
      StructField("exact", BooleanType),
      StructField("location", StringType),
      StructField("version", StringType))))))

  /** ThrowableProxy struct; `withCause` adds one causeProxy level (the
    * reference mapping types exactly thrownProxy → causeProxy; deeper
    * chains collapse into commonElementCount, and Spark schemas cannot
    * be recursive anyway).
    */
  private def throwableProxySchema(withCause: Boolean): StructType = {
    val base = Seq(
      StructField("name", StringType),
      StructField("message", StringType),
      StructField("localizedMessage", StringType),
      StructField("commonElementCount", LongType),
      StructField("extendedStackTrace", ArrayType(stackFrameSchema)))
    StructType(
      if (withCause) base :+ StructField("causeProxy", throwableProxySchema(withCause = false))
      else base)
  }

  /** Full-fidelity wire schema of Log4j2 JSON log events: nested
    * level/instant/message structs, the MDC as a MAP (contextData), and
    * the thrownProxy→causeProxy chain with typed extendedStackTrace
    * frames — a real Log4j2 JsonLayout event ingests without losing the
    * cause chain (the flat [[rawLogSchema]] keeps only name/message).
    */
  val rawLogSchemaDeep: StructType = StructType(Seq(
    StructField("appName", StringType),
    StructField("appId", StringType),
    StructField("executorId", StringType),
    StructField("logTime", LongType),
    StructField("instant", StructType(Seq(
      StructField("epochSecond", LongType),
      StructField("nanoOfSecond", LongType)))),
    StructField("loggerName", StringType),
    StructField("threadName", StringType),
    StructField("threadId", LongType),
    StructField("threadPriority", LongType),
    StructField("level", StructType(Seq(
      StructField("intLevel", LongType),
      StructField("name", StringType),
      StructField("standardLevel", StringType)))),
    StructField("message", StructType(Seq(
      StructField("message", StringType)))),
    StructField("contextData", MapType(StringType, StringType)),
    StructField("thrownProxy", throwableProxySchema(withCause = true))))

  /** Deep raw log event → LogRecord table shape: MDC stays a map (with
    * taskId/stageId parsed out of its taskName entry), the cause chain
    * stays structured, and scalar diagnostics (causeDepth, rootCauseName,
    * first-frame errLine) are derived for cheap slicing at query time.
    */
  def projectLogRecordsDeep(raw: DataFrame): DataFrame =
    raw
      .withColumn("taskId",
        nullif(regexp_extract(element_at(col("contextData"), "taskName"),
          "task (\\d+\\.\\d+)", 1), lit("")))
      .withColumn("stageId",
        nullif(regexp_extract(element_at(col("contextData"), "taskName"),
          "stage (\\d+\\.\\d+)", 1), lit("")))
      .select(
        col("appName"), col("appId"), col("executorId"),
        col("taskId"), col("stageId"),
        timestamp_millis(col("logTime")).as("logTime"),
        col("level"), col("level.name").as("levelName"),
        col("loggerName"), col("threadName"),
        col("message.message").as("message"),
        col("contextData").as("mdc"),
        col("thrownProxy"),
        when(col("thrownProxy").isNull, lit(0L))
          .when(col("thrownProxy.causeProxy").isNull, lit(1L))
          .otherwise(lit(2L)).as("causeDepth"),
        coalesce(col("thrownProxy.causeProxy.name"), col("thrownProxy.name"))
          .as("rootCauseName"),
        // try_element_at: a stackless throwable (frames absorbed into
        // commonElementCount, or -XX:-StackTraceInThrowable) has an
        // EMPTY frame array, and ANSI element_at on it would abort the
        // whole streaming query instead of yielding null
        try_element_at(col("thrownProxy.extendedStackTrace"), lit(1))
          .getField("stackTraceElement").getField("lineNumber").as("errLine"))

  /** A12: content routing — predicate dispatch on the discriminator. */
  def route(df: DataFrame, metricsType: String): DataFrame =
    df.filter(col("metricsType") === metricsType)

  /** A3: raw task-metric event → typed task-metric columns (epoch millis
    * → TimestampType, drop the stage-agg passthrough fields).
    */
  def projectTaskMetrics(raw: DataFrame): DataFrame =
    raw.select(
      col("appName"), col("appId"), col("jobId"),
      col("stageId"), col("stageAttemptId"), col("taskId"), col("executorId"),
      col("partitionId"), col("inputBytesRead"), col("inputRecordsRead"),
      col("runTime"), col("executorCpuTime"), col("peakExecutionMemory"),
      col("outputRecordsWritten"), col("outputBytesWritten"),
      col("shuffleRecordsRead"), col("shuffleBytesRead"),
      col("shuffleRecordsWritten"), col("shuffleBytesWritten"),
      timestamp_millis(col("metricTime")).as("metricTime"))

  /** Stage-agg passthrough projection (already-aggregated records). */
  def projectStageAgg(raw: DataFrame): DataFrame =
    raw.select(
      col("appName"), col("appId"), col("jobId"), col("stageId"),
      col("inputBytesReadSkewness"), col("maxInputBytesRead"),
      col("shuffleBytesReadSkewness"), col("maxShuffleBytesRead"),
      timestamp_millis(col("metricTime")).as("metricTime"))

  /** A4: stageId→jobId lookup enrichment. The dimension is tiny (live
    * stages), so the join is explicitly broadcast — the fact stream never
    * shuffles. Existing non-null jobId wins (reference probes only when
    * the listener didn't already know the job).
    */
  def enrichJobId(tasks: DataFrame, stageToJob: DataFrame): DataFrame = {
    val dim = broadcast(stageToJob.select(
      col("stageId").as("__lookup_stage"), col("jobId").as("__lookup_job")))
    tasks.join(dim, tasks("stageId") === dim("__lookup_stage"), "left")
      .withColumn("jobId", coalesce(col("jobId"), col("__lookup_job")))
      .drop("__lookup_stage", "__lookup_job")
  }

  /** A5: the 19→8-column light projection buffered for aggregation. */
  def lightProjection(tasks: DataFrame): DataFrame =
    tasks.select("appName", "appId", "jobId", "stageId", "taskId",
      "inputBytesRead", "shuffleBytesRead", "metricTime")

  /** A9: identity/context injection at flush — fill whatever the event
    * didn't carry (reference injects appName/appId/executorId from the
    * SparkEnv once known).
    */
  def injectIdentity(df: DataFrame, appName: String, appId: String,
      executorId: String = "driver"): DataFrame =
    df.withColumn("appName", coalesce(col("appName"), lit(appName)))
      .withColumn("appId", coalesce(col("appId"), lit(appId)))
      .withColumn("executorId", coalesce(col("executorId"), lit(executorId)))

  /** A10: parse taskId/stageId out of the MDC taskName
    * ("task 1.0 in stage 2.0 (TID 42)"); no match → null (the reference's
    * split-by-space would throw — deviation documented).
    */
  def parseMdc(logs: DataFrame, mdcCol: String = "mdcTaskName"): DataFrame =
    logs
      .withColumn("taskId",
        nullif(regexp_extract(col(mdcCol), "task (\\d+\\.\\d+)", 1), lit("")))
      .withColumn("stageId",
        nullif(regexp_extract(col(mdcCol), "stage (\\d+\\.\\d+)", 1), lit("")))

  /** Raw log event → the LogRecord table shape (A11 rebuild/enrich). */
  def projectLogRecords(raw: DataFrame): DataFrame =
    parseMdc(raw)
      .select(
        col("appName"), col("appId"), col("executorId"),
        col("taskId"), col("stageId"),
        timestamp_millis(col("logTime")).as("logTime"),
        col("level"), col("loggerName"), col("threadName"),
        col("message"), col("mdcTaskName"),
        col("thrownName"), col("thrownMessage"))

  /** Date partition column for the sinks (A16: typed, partitioned store —
    * time-partitioning gives the partition pruning the reference gets
    * from per-index time filters).
    */
  def withDt(df: DataFrame, tsCol: String): DataFrame =
    df.withColumn("dt", date_format(col(tsCol), "yyyy-MM-dd"))

  /** A15 (dormant `date` processor): server-side ingest timestamp. The
    * clock is injected for determinism (SURVEY §7.4); pass
    * `current_timestamp()`-derived value at the call site in production.
    */
  def serverTimestamp(df: DataFrame, now: java.sql.Timestamp,
      colName: String = "ingestTime"): DataFrame =
    df.withColumn(colName, lit(now))

  /** A15 (dormant `delete_entries` processor): drop noise fields (the
    * reference lists threadId/threadName/threadPriority).
    */
  def dropFields(df: DataFrame, fields: String*): DataFrame =
    df.drop(fields: _*)

  /** Discriminator constants re-exported for routing call sites. */
  val TaskMetricsType: String = Schemas.TaskMetricsType
  val StageAggMetricsType: String = Schemas.StageAggMetricsType
}
