package graft.ingest

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable

import org.apache.logging.log4j.core.LogEvent
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.Property
import org.apache.spark.scheduler._

/** In-process collectors — the self-observation plane (SURVEY §7.1 item
  * 6). Parity with the reference's two extension points:
  *
  *  - [[CollectorListener]] ≙ CustomMetricsListener
  *    (source/collector/.../CustomMetricsListener.scala:16): SparkListener
  *    on the scheduler bus; A3 projection of TaskEnd (:111-134), A4
  *    stageId→jobId map (:31,59-65,81,115), A7 dual size/time buffer
  *    (ObservabilityClient.scala:299-306), flush on job/app end (:41-44,70-72).
  *  - [[CollectorAppender]] ≙ CollectorAppender
  *    (source/collector/.../CollectorAppender.scala:26-45): Log4j2
  *    appender capturing log events + MDC taskName.
  *
  * Where the reference POSTs signed JSON arrays to OSI, these spool JSON
  * line batches to a directory that [[Pipelines]] ingests as a file
  * stream — same decoupling (the app never blocks on the sink), with the
  * file-source checkpoint giving exactly-once downstream.
  *
  * The per-stage skew aggregation deliberately does NOT happen here: the
  * pipeline computes it grouped by (appId, jobId, stageId), which fixes
  * the reference's shared-buffer cross-contamination under concurrent
  * stages (SURVEY §2.1 A6 notes) and keeps the listener allocation-light.
  */
object Collector {

  private[ingest] def jstr(s: String): String =
    if (s == null) "null"
    else "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Size/time dual-trigger spool buffer (A7; defaults mirror
    * Utils.scala:103-113 — 100 records / 10 s).
    */
  final class SpoolBuffer(
      spoolDir: String,
      prefix: String,
      batchSize: Int,
      timeThresholdMs: Long,
      clock: () => Long) {
    private val buf = mutable.ListBuffer.empty[String]
    private var lastFlush = clock()
    private val seq = new AtomicLong(0)
    // unique per-instance token: restarts / concurrent collectors sharing
    // a spool dir must never collide on batch file names
    private val runToken = java.util.UUID.randomUUID().toString.take(8)
    Files.createDirectories(Paths.get(spoolDir))

    def add(line: String): Unit = synchronized {
      buf += line
      val now = clock()
      if (buf.size >= batchSize || now - lastFlush >= timeThresholdMs) flushLocked(now)
    }

    def flush(): Unit = synchronized { flushLocked(clock()) }

    /** Re-anchor the time trigger without writing (the reference resets
      * its client's lastFlush on application start so a slow Spark init
      * never flushes the first metric alone —
      * CustomMetricsListener.scala:50-53, ObservabilityClient.scala:135-138).
      */
    def setLastFlush(t: Long): Unit = synchronized { lastFlush = t }

    private def flushLocked(now: Long): Unit = {
      if (buf.nonEmpty) {
        val tmp = Paths.get(spoolDir, s".$prefix-$runToken-${seq.getAndIncrement()}.json.tmp")
        Files.write(tmp, buf.mkString("\n").getBytes(StandardCharsets.UTF_8),
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
        // atomic rename so the streaming file source never reads partials
        Files.move(tmp, Paths.get(spoolDir,
          tmp.getFileName.toString.stripPrefix(".").stripSuffix(".tmp")))
        buf.clear()
      }
      lastFlush = now
    }
  }

  /** The `spark.metrics.*` config vocabulary of the reference's
    * listener (GETTING-STARTED.md:336-340, Utils.scala:88-113):
    * `endpoint` names the delivery target, `batchSize` (default 100)
    * and `timeThreshold` (default 10, in SECONDS — the reference
    * compares whole seconds since the last flush) bound the spool
    * batches. In this engine the delivery target is the spool
    * DIRECTORY that [[Pipelines]] tails as a file stream, so an
    * http(s) endpoint is a configuration error here — fail fast at
    * listener construction with a pointer at [[HttpDelivery]], the
    * network-sink path.
    */
  private[ingest] def spoolDirFromConf(conf: org.apache.spark.SparkConf): String = {
    val ep = conf.get("spark.metrics.endpoint",
      s"${System.getProperty("java.io.tmpdir")}/graft-metrics-spool")
    require(!ep.startsWith("http://") && !ep.startsWith("https://"),
      "spark.metrics.endpoint must be a spool directory in this engine " +
        s"(got '$ep'); for an HTTP sink deliver the ingested stream with " +
        "graft.ingest.HttpDelivery instead")
    ep
  }
}

/** SparkListener collector: task metrics → spool (A1/A3/A4/A5/A7).
  *
  * Two attach paths, matching the reference listener's:
  *
  *  - programmatic: construct with an explicit spool dir and register
  *    via `sparkContext.addSparkListener`;
  *  - config-only: `--conf spark.extraListeners=graft.ingest.CollectorListener`
  *    plus the `spark.metrics.*` vocabulary (endpoint/batchSize/
  *    timeThreshold — GETTING-STARTED.md:336-340). Spark's extension
  *    loader instantiates extra listeners reflectively through a
  *    single-`SparkConf`-argument constructor when one exists, which
  *    is what the auxiliary constructor below provides; `timeThreshold`
  *    is in SECONDS like the reference's (Utils.scala:107-113).
  */
final class CollectorListener(
    spoolDir: String,
    appNameDefault: String = "unknown",
    appIdDefault: String = "unknown",
    batchSize: Int = 100,
    timeThresholdMs: Long = 10000L,
    clock: () => Long = () => System.currentTimeMillis())
  extends SparkListener {

  /** The `spark.extraListeners` construction path (see class doc). */
  def this(conf: org.apache.spark.SparkConf) = this(
    spoolDir = Collector.spoolDirFromConf(conf),
    appNameDefault = conf.get("spark.app.name", "unknown"),
    appIdDefault = conf.get("spark.app.id", "unknown"),
    batchSize = conf.get("spark.metrics.batchSize", "100").toInt,
    timeThresholdMs = conf.get("spark.metrics.timeThreshold", "10").toLong * 1000L)

  import Collector.jstr

  private val spool = new Collector.SpoolBuffer(
    spoolDir, "metrics", batchSize, timeThresholdMs, clock)
  // stageId → jobId, built on job start, evicted on stage completion
  // (CustomMetricsListener.scala:31,59-65,81)
  private val stageToJob = mutable.HashMap.empty[Int, String]
  @volatile private var appName = appNameDefault
  @volatile private var appId = appIdDefault

  override def onApplicationStart(e: SparkListenerApplicationStart): Unit = {
    appName = e.appName
    e.appId.foreach(appId = _)
    // re-anchor the time trigger: a slow app init must not flush the
    // first metric alone (CustomMetricsListener.scala:50-53)
    spool.setLastFlush(clock())
  }

  override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
    e.stageIds.foreach(stageToJob(_) = e.jobId.toString)
  }

  override def onStageCompleted(e: SparkListenerStageCompleted): Unit = synchronized {
    stageToJob.remove(e.stageInfo.stageId)
  }

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val m = e.taskMetrics
    if (m != null && e.taskInfo != null) {
      val jobId = synchronized(stageToJob.get(e.stageId)).getOrElse("unknown")
      val line =
        s"""{"metricsType":"taskMetrics","appName":${jstr(appName)},""" +
        s""""appId":${jstr(appId)},"jobId":${jstr(jobId)},""" +
        s""""stageId":${e.stageId},"stageAttemptId":${e.stageAttemptId},""" +
        s""""taskId":${jstr(e.taskInfo.id)},"executorId":${jstr(e.taskInfo.executorId)},""" +
        s""""partitionId":${e.taskInfo.index},""" +
        s""""inputBytesRead":${m.inputMetrics.bytesRead},""" +
        s""""inputRecordsRead":${m.inputMetrics.recordsRead},""" +
        s""""runTime":${m.executorRunTime},"executorCpuTime":${m.executorCpuTime},""" +
        s""""peakExecutionMemory":${m.peakExecutionMemory},""" +
        s""""outputRecordsWritten":${m.outputMetrics.recordsWritten},""" +
        s""""outputBytesWritten":${m.outputMetrics.bytesWritten},""" +
        s""""shuffleRecordsRead":${m.shuffleReadMetrics.recordsRead},""" +
        s""""shuffleBytesRead":${m.shuffleReadMetrics.totalBytesRead},""" +
        s""""shuffleRecordsWritten":${m.shuffleWriteMetrics.recordsWritten},""" +
        s""""shuffleBytesWritten":${m.shuffleWriteMetrics.bytesWritten},""" +
        s""""metricTime":${clock()}}"""
      spool.add(line)
    }
  }

  // flush at job + app end (CustomMetricsListener.scala:41-44,70-72)
  override def onJobEnd(e: SparkListenerJobEnd): Unit = spool.flush()
  override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = spool.flush()
  def flush(): Unit = spool.flush()
}

/** Log4j2 appender collector: log events + MDC → spool (A2/A10 input).
  * Two attach paths, matching the reference appender's
  * (CollectorAppender.scala:26-27 `@Plugin`, :59-62 `createAppender`;
  * mandated log4j2 config README.md:287-300):
  *
  *  - programmatic: instantiate, `start()`, attach to a logger config;
  *  - config-file: declared in log4j2.xml as `<GraftCollector
  *    name="..." spoolDir="..."/>` under `<Configuration
  *    packages="graft.ingest">` — the `@Plugin` annotation below plus
  *    the companion's `@PluginFactory` make Log4j2's plugin scan build
  *    it, so an application that can only edit its log4j2.xml attaches
  *    the collector with zero code.
  */
@org.apache.logging.log4j.core.config.plugins.Plugin(
  name = "GraftCollector", category = "Core", elementType = "appender",
  printObject = true)
final class CollectorAppender(
    spoolDir: String,
    batchSize: Int = 100,
    timeThresholdMs: Long = 10000L,
    appName: String = "unknown",
    appId: String = "unknown",
    executorId: String = "driver",
    clock: () => Long = () => System.currentTimeMillis(),
    appenderName: String = "graft-collector")
  extends AbstractAppender(appenderName, null, null, true, Property.EMPTY_ARRAY) {

  import Collector.jstr

  private val spool = new Collector.SpoolBuffer(
    spoolDir, "logs", batchSize, timeThresholdMs, clock)

  override def append(event: LogEvent): Unit = {
    val lvl = event.getLevel
    val thrown = Option(event.getThrown)
    val mdcTaskName = Option(event.getContextData)
      .flatMap(cd => Option(cd.getValue[String]("taskName"))).orNull
    val line =
      s"""{"appName":${jstr(appName)},"appId":${jstr(appId)},""" +
      s""""executorId":${jstr(executorId)},"logTime":${event.getTimeMillis},""" +
      s""""loggerName":${jstr(event.getLoggerName)},""" +
      s""""threadName":${jstr(event.getThreadName)},""" +
      s""""message":${jstr(event.getMessage.getFormattedMessage)},""" +
      s""""level":{"intLevel":${lvl.intLevel()},"name":${jstr(lvl.name())},""" +
      s""""standardLevel":${jstr(lvl.getStandardLevel.name())}},""" +
      s""""mdcTaskName":${jstr(mdcTaskName)},""" +
      s""""thrownName":${jstr(thrown.map(_.getClass.getName).orNull)},""" +
      s""""thrownMessage":${jstr(thrown.map(t => String.valueOf(t.getMessage)).orNull)}}"""
    spool.add(line)
  }

  def flush(): Unit = spool.flush()
}

/** Log4j2 `@PluginFactory` for the config-file attach path. Scala
  * companion-object methods compile to static forwarders with their
  * annotations, which is exactly what Log4j2's factory resolution
  * needs (spec-verified end to end from an XML config).
  */
object CollectorAppender {
  import org.apache.logging.log4j.core.config.plugins.{PluginAttribute, PluginFactory}

  @PluginFactory
  def createAppender(
      @PluginAttribute("name") name: String,
      @PluginAttribute("spoolDir") spoolDir: String,
      @PluginAttribute(value = "batchSize", defaultInt = 100) batchSize: Int,
      @PluginAttribute(value = "timeThreshold", defaultLong = 10000L) timeThreshold: Long,
      @PluginAttribute(value = "appName", defaultString = "unknown") appName: String,
      @PluginAttribute(value = "appId", defaultString = "unknown") appId: String,
      @PluginAttribute(value = "executorId", defaultString = "driver") executorId: String)
      : CollectorAppender = {
    require(spoolDir != null && spoolDir.nonEmpty,
      "GraftCollector requires a spoolDir attribute")
    new CollectorAppender(spoolDir, batchSize, timeThreshold, appName,
      appId, executorId,
      appenderName = if (name == null || name.isEmpty) "graft-collector" else name)
  }
}
