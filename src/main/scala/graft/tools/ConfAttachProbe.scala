package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** End-to-end probe of the config-only collector attach: builds a
  * FRESH SparkSession whose conf carries
  * `spark.extraListeners=graft.ingest.CollectorListener` plus the
  * `spark.metrics.*` vocabulary, runs a real shuffle job, stops the
  * session (flushing the listener), and prints the spooled task-metric
  * line count. This is the one integration the test suite cannot
  * exercise (suites share one live SparkContext; extraListeners only
  * construct at context creation), so it lives as a runMain probe:
  *
  *   sbt "runMain graft.tools.ConfAttachProbe"
  *
  * Expected output: a `[conf-attach] spooled N task-metric lines`
  * line with N > 0.
  */
object ConfAttachProbe {
  def main(args: Array[String]): Unit = {
    val spool = Files.createTempDirectory("graft-extra-listeners").toString
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("conf-attach-probe")
      .config("spark.ui.enabled", "false")
      .config("spark.extraListeners", "graft.ingest.CollectorListener")
      .config("spark.metrics.endpoint", spool)
      .config("spark.metrics.batchSize", "1000")
      .config("spark.metrics.timeThreshold", "3600")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.range(0, 50000, 1, 4).toDF("v")
      .groupBy(($"v" % 7).as("k")).count().collect()
    // stop() fires onApplicationEnd → the listener flushes its spool
    spark.stop()

    import scala.jdk.CollectionConverters._
    val s = Files.list(Paths.get(spool))
    val lines =
      try s.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".json"))
        .flatMap(p => Files.readAllLines(p).asScala).toSeq
      finally s.close()
    val metrics = lines.count(_.contains("\"metricsType\":\"taskMetrics\""))
    println(s"[conf-attach] spooled $metrics task-metric lines")
    if (metrics == 0) sys.exit(1)
  }
}
