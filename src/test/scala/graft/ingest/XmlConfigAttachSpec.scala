package graft.ingest

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.logging.log4j.ThreadContext
import org.apache.logging.log4j.core.LoggerContext
import org.apache.logging.log4j.core.config.{ConfigurationFactory, ConfigurationSource}
import org.scalatest.funsuite.AnyFunSuite

/** The config-file attach path: a log4j2.xml declaring `<GraftCollector>`
  * (no code) must build the appender through the `@Plugin`/`@PluginFactory`
  * pair and land events in the spool — the reference's mandated
  * integration (its README tells apps to add the appender to their
  * log4j2 config; CollectorAppender.scala:26-27,59-62).
  */
class XmlConfigAttachSpec extends AnyFunSuite {

  test("log4j2.xml with packages=graft.ingest builds GraftCollector and spools events") {
    val spool = Files.createTempDirectory("graft-xml-spool").toString
    val xml =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<Configuration status="WARN" packages="graft.ingest">
         |  <Appenders>
         |    <GraftCollector name="graftSpool" spoolDir="$spool"
         |      batchSize="100" timeThreshold="600000" appName="xmlapp"
         |      appId="app-xml" executorId="exec-9"/>
         |  </Appenders>
         |  <Loggers>
         |    <Logger name="graft.xmltest" level="info" additivity="false">
         |      <AppenderRef ref="graftSpool"/>
         |    </Logger>
         |    <Root level="error"/>
         |  </Loggers>
         |</Configuration>""".stripMargin
    val src = new ConfigurationSource(
      new ByteArrayInputStream(xml.getBytes(StandardCharsets.UTF_8)))
    // a dedicated context so the test never disturbs Spark's logging
    val ctx = new LoggerContext("graft-xml-test")
    val cfg = ConfigurationFactory.getInstance().getConfiguration(ctx, src)
    ctx.start(cfg)
    try {
      val appender = ctx.getConfiguration.getAppender[CollectorAppender]("graftSpool")
      assert(appender != null, "plugin factory did not build GraftCollector")

      val log = ctx.getLogger("graft.xmltest")
      ThreadContext.put("taskName", "task 3.0 in stage 4.0 (TID 11)")
      log.info("xml-attached hello")
      ThreadContext.remove("taskName")
      log.warn("second line")
      appender.flush()

      val lines = Files.list(Paths.get(spool)).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".json"))
        .flatMap(p => Files.readAllLines(p).asScala)
        .toSeq
      assert(lines.exists(_.contains("\"message\":\"xml-attached hello\"")), lines.mkString("\n"))
      assert(lines.exists(_.contains("\"appName\":\"xmlapp\"")))
      assert(lines.exists(_.contains("\"executorId\":\"exec-9\"")))
      assert(lines.exists(_.contains("task 3.0 in stage 4.0")))
      assert(lines.count(_.nonEmpty) == 2)
    } finally {
      ctx.stop()
    }
  }
}
