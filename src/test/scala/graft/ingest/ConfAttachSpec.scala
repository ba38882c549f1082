package graft.ingest

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.logging.log4j.ThreadContext
import org.apache.logging.log4j.core.LoggerContext
import org.apache.logging.log4j.core.config.ConfigurationSource
import org.apache.logging.log4j.core.config.properties.PropertiesConfigurationFactory
import org.apache.spark.SparkConf
import org.apache.spark.scheduler.SparkListener
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The config-only attach paths a reference user holds in their submit
  * scripts and log4j2 files:
  *
  *  - `--conf spark.extraListeners=graft.ingest.CollectorListener` plus
  *    the `spark.metrics.*` vocabulary (GETTING-STARTED.md:336-340).
  *    Spark's extension loader instantiates each extraListeners class
  *    reflectively, preferring a single-SparkConf-argument constructor
  *    — this spec performs exactly that construction (the contract the
  *    loader applies), then registers the instance on the live context
  *    and proves it observes a real shuffle job.
  *  - a log4j2.properties declaring the appender (the reference ships
  *    examples/log4j2.properties with `appender.obs.type = SparkObs`;
  *    ours is `GraftCollector`) — the properties-format twin of
  *    XmlConfigAttachSpec.
  */
class ConfAttachSpec extends SparkTestBase {
  import spark.implicits._

  private def sparkStyleConstruct(conf: SparkConf): SparkListener =
    // what Spark's Utils.loadExtensions does for spark.extraListeners:
    // Class.forName(name).getConstructor(classOf[SparkConf]).newInstance(conf)
    Class.forName("graft.ingest.CollectorListener")
      .getConstructor(classOf[SparkConf])
      .newInstance(conf)
      .asInstanceOf[SparkListener]

  test("extraListeners-style construction observes a real job with conf-driven batching") {
    val spool = Files.createTempDirectory("graft-conf-spool").toString
    val conf = new SparkConf(false)
      .set("spark.metrics.endpoint", spool)
      .set("spark.metrics.batchSize", "1000")
      .set("spark.metrics.timeThreshold", "3600") // seconds, like the reference
      .set("spark.app.name", "conf-attach")
    val listener = sparkStyleConstruct(conf)
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.range(0, 20000, 1, 4).toDF("v")
        .groupBy(($"v" % 5).as("k")).count().collect()
      val deadline = System.currentTimeMillis() + 30000
      var lines = Seq.empty[String]
      while (lines.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
        listener.asInstanceOf[CollectorListener].flush()
        val s = Files.list(Paths.get(spool))
        try lines = s.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".json"))
          .flatMap(p => Files.readAllLines(p).asScala).toSeq
        finally s.close()
      }
      assert(lines.nonEmpty, "no spool batch written by the conf-built listener")
      assert(lines.exists(_.contains("\"metricsType\":\"taskMetrics\"")))
      assert(lines.exists(_.contains("\"shuffleBytesRead\"")))
    } finally {
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  test("spark.metrics vocabulary: batchSize triggers the flush, timeThreshold is seconds") {
    val spool = Files.createTempDirectory("graft-vocab-spool").toString
    val conf = new SparkConf(false)
      .set("spark.metrics.endpoint", spool)
      .set("spark.metrics.batchSize", "2")
      .set("spark.metrics.timeThreshold", "3600")
    // drive the buffer directly (deterministic, no listener bus)
    val buf = new Collector.SpoolBuffer(spool, "metrics",
      conf.get("spark.metrics.batchSize").toInt,
      conf.get("spark.metrics.timeThreshold").toLong * 1000L,
      () => 0L) // frozen clock: only the size trigger can fire
    def batches(): Long = {
      val s = Files.list(Paths.get(spool))
      try s.iterator().asScala.count(_.getFileName.toString.endsWith(".json"))
      finally s.close()
    }
    buf.add("""{"a":1}""")
    assert(batches() == 0, "one record must not flush below batchSize=2")
    buf.add("""{"a":2}""")
    assert(batches() == 1, "second record must trip the size trigger")
  }

  test("an http(s) spark.metrics.endpoint fails fast with HttpDelivery guidance") {
    val conf = new SparkConf(false)
      .set("spark.metrics.endpoint", "https://pipeline.example.com/ingest")
    val e = intercept[java.lang.reflect.InvocationTargetException] {
      sparkStyleConstruct(conf)
    }
    assert(e.getCause.isInstanceOf[IllegalArgumentException])
    assert(e.getCause.getMessage.contains("HttpDelivery"))
  }

  test("log4j2.properties with packages=graft.ingest builds GraftCollector and spools") {
    val spool = Files.createTempDirectory("graft-props-spool").toString
    val props =
      s"""packages = graft.ingest
         |rootLogger.level = error
         |
         |appender.obs.type = GraftCollector
         |appender.obs.name = graftSpool
         |appender.obs.spoolDir = $spool
         |appender.obs.batchSize = 100
         |appender.obs.timeThreshold = 600000
         |appender.obs.appName = propsapp
         |appender.obs.appId = app-props
         |appender.obs.executorId = exec-2
         |
         |logger.t.name = graft.propstest
         |logger.t.level = info
         |logger.t.additivity = false
         |logger.t.appenderRef.obs.ref = graftSpool
         |""".stripMargin
    val src = new ConfigurationSource(
      new ByteArrayInputStream(props.getBytes(StandardCharsets.UTF_8)))
    val ctx = new LoggerContext("graft-props-test")
    val cfg = new PropertiesConfigurationFactory().getConfiguration(ctx, src)
    ctx.start(cfg)
    try {
      val appender = ctx.getConfiguration.getAppender[CollectorAppender]("graftSpool")
      assert(appender != null, "properties config did not build GraftCollector")
      val log = ctx.getLogger("graft.propstest")
      ThreadContext.put("taskName", "task 1.0 in stage 2.0 (TID 3)")
      log.info("properties-attached hello")
      ThreadContext.remove("taskName")
      appender.flush()
      val s = Files.list(Paths.get(spool))
      val lines =
        try s.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".json"))
          .flatMap(p => Files.readAllLines(p).asScala).toSeq
        finally s.close()
      assert(lines.exists(_.contains("\"message\":\"properties-attached hello\"")), lines.mkString("\n"))
      assert(lines.exists(_.contains("\"appName\":\"propsapp\"")))
      assert(lines.exists(_.contains("task 1.0 in stage 2.0")))
    } finally {
      ctx.stop()
    }
  }
}
