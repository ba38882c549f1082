package graft.ingest

import java.nio.file.Files

import scala.concurrent.duration.DurationInt

import org.apache.logging.log4j.{LogManager, ThreadContext}
import org.apache.logging.log4j.core.LoggerContext
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.model.Schemas

/** End-to-end self-observation: the engine watches its OWN test jobs via
  * the in-process collectors, spools, ingests through the streaming
  * pipelines, and lands rows in all three tables.
  */
class CollectorSpec extends SparkTestBase {
  import spark.implicits._

  test("SparkListener collector observes real jobs end-to-end into tables") {
    val root = Files.createTempDirectory("graft-collector")
    val spool = root.resolve("spool").toString
    val listener = new CollectorListener(spool,
      appNameDefault = "graft-test", appIdDefault = spark.sparkContext.applicationId,
      batchSize = 1000, timeThresholdMs = Long.MaxValue / 2)
    spark.sparkContext.addSparkListener(listener)
    try {
      // a real shuffling job → real TaskEnd events with shuffle metrics
      spark.range(0, 100000, 1, 8).toDF("v")
        .groupBy(($"v" % 7).as("k")).count().collect()
      // listener bus is async; poll until the task events drain + flush
      val deadline = System.currentTimeMillis() + 30000
      var haveBatch = false
      while (!haveBatch && System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
        listener.flush()
        val s = Files.list(root.resolve("spool"))
        try haveBatch = s.findAny().isPresent finally s.close()
      }
      assert(haveBatch, "no spool batch written")

      val conf = Pipelines.Config(
        sourceDir = spool,
        sinkRoot = root.resolve("tables").toString,
        checkpointRoot = root.resolve("ckpt").toString,
        availableNow = true)
      Pipelines.startMetrics(spark, conf).foreach(_.awaitTermination())

      val tasks = spark.read.parquet(conf.tablePath(Schemas.TaskMetricsTable))
      assert(tasks.count() > 0)
      // A3 projection carried real metrics; A4 lookup resolved a jobId
      assert(tasks.filter($"jobId" =!= "unknown").count() > 0)
      assert(tasks.filter($"shuffleBytesRead" > 0).count() > 0,
        "shuffle job should report shuffle read bytes")
      assert(tasks.select($"appId").head().getString(0) ==
        spark.sparkContext.applicationId)
    } finally {
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  test("Log4j2 appender collector captures MDC and flows into spark_logs") {
    val root = Files.createTempDirectory("graft-applogs")
    val spool = root.resolve("spool").toString
    val appender = new CollectorAppender(spool, batchSize = 1000,
      timeThresholdMs = Long.MaxValue / 2,
      appName = "graft-test", appId = "app-self")
    appender.start()
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val config = ctx.getConfiguration
    config.getRootLogger.addAppender(appender, org.apache.logging.log4j.Level.INFO, null)
    ctx.updateLoggers()
    try {
      val log = LogManager.getLogger("graft.selftest")
      ThreadContext.put("taskName", "task 5.0 in stage 7.0 (TID 99)")
      log.error("simulated task failure for collector test")
      ThreadContext.remove("taskName")
      log.error("plain error without MDC")
      appender.flush()

      val conf = Pipelines.Config(
        sourceDir = spool,
        sinkRoot = root.resolve("tables").toString,
        checkpointRoot = root.resolve("ckpt").toString,
        availableNow = true)
      Pipelines.startLogs(spark, conf).awaitTermination()

      val logs = spark.read.parquet(conf.tablePath(Schemas.LogsTable))
        .filter($"loggerName" === "graft.selftest")
      assert(logs.count() == 2)
      val withMdc = logs.filter($"mdcTaskName".isNotNull).head()
      assert(withMdc.getAs[String]("taskId") == "5.0")
      assert(withMdc.getAs[String]("stageId") == "7.0")
      assert(withMdc.getAs[org.apache.spark.sql.Row]("level")
        .getAs[String]("name") == "ERROR")
    } finally {
      config.getRootLogger.removeAppender("graft-collector")
      ctx.updateLoggers()
      appender.stop()
    }
  }
}
