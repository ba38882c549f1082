package graft.search

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.PipelineConfig

/** Cross-artifact coherence of the reference's THREE config surfaces —
  * index templates (what each index declares), the dashboard export's
  * index-patterns (what the UI believes each index carries), and the
  * ingestion pipeline (what actually lands there). The three files were
  * produced by the reference team independently; these specs pin how
  * they fit together, which is exactly what a user migrating all three
  * onto this engine relies on:
  *
  *  - every index-pattern resolves to the template whose glob it names;
  *  - every pattern aggregates time on `@timestamp`, a field NO
  *    template declares — it is the ingest-plane arrival timestamp
  *    (Data Prepper's date processor; the dev pipeline documents
  *    `destination: "@timestamp"`, this engine's DateProcessor default);
  *  - the metrics patterns list EXACTLY the template fields minus the
  *    routed-away discriminator (`metricsType`) and the collector-side
  *    `metricTime` that `@timestamp` supersedes — zero dynamic extras;
  *  - the logs pattern additionally carries dynamic-mapped runtime
  *    fields under four roots the template never declared (including
  *    the reference's own naming skew: the template declares `fqcn`,
  *    real Log4j2 events carry `loggerFqcn`).
  */
class ConfigCoherenceSpec extends AnyFunSuite {

  private val res = "/root/reference/deployment/infra/resources"
  private val tplDir = s"$res/lambda/opensearch-bootstrap/resources/templates"
  private val ndjson = s"$res/lambda/opensearch-bootstrap/resources/dashboards/data-skew.ndjson"

  private def haveArtifacts: Boolean =
    Files.exists(Paths.get(ndjson)) && Files.exists(Paths.get(tplDir))

  private lazy val templates = Seq("spark-logs", "spark-task-metrics",
    "spark-stage-agg-metrics").map { n =>
    n -> IndexTemplates.parse(
      new String(Files.readAllBytes(Paths.get(s"$tplDir/$n.json"))))
  }.toMap

  private lazy val patterns: Seq[SavedObjects.IndexPattern] = {
    import scala.jdk.CollectionConverters._
    Files.readAllLines(Paths.get(ndjson)).asScala.toSeq
      .flatMap(SavedObjects.parseIndexPatternLine)
  }

  test("every export index-pattern routes to the template sharing its glob; all aggregate time on @timestamp") {
    assume(haveArtifacts, "reference artifacts not present")
    assert(patterns.size == 3)
    patterns.foreach { p =>
      val t = IndexTemplates.templateFor(templates.values.toSeq,
        p.title.stripSuffix("*"))
      assert(t.isDefined, s"${p.title}: no governing template")
      assert(t.get.patterns == Seq(p.title),
        s"${p.title}: template glob mismatch")
      assert(p.timeField == Some("@timestamp"))
      // no template declares @timestamp: it is the ingest-plane arrival
      // time, the date processor's default destination in this engine
      assert(!t.get.fields.exists(_.path == "@timestamp"))
    }
    val cfg = PipelineConfig.parse(
      """p:
        |  processor:
        |    - date:
        |        from_time_received: true
        |  sink:
        |    - opensearch:
        |        index: "x"
        |""".stripMargin)
    assert(cfg.processors == Seq(PipelineConfig.DateProcessor("@timestamp")))
  }

  /** A pattern field is explained by its template when the template
    * declares it (directly, or as the parent of a listed `.keyword`
    * multi-field) or it is the ingest `@timestamp`.
    */
  private def unexplained(p: SavedObjects.IndexPattern,
      t: IndexTemplates.IndexTemplate): Seq[String] = {
    val declared = t.fields.map(_.path).toSet
    p.fields.map(_._1)
      .filterNot(_.startsWith("_")) // _id/_source/_score internals
      .filterNot { n =>
        val base = if (n.endsWith(".keyword")) n.dropRight(8) else n
        declared(base) || base == "@timestamp"
      }
  }

  test("metrics patterns list exactly the template fields minus metricsType/metricTime; appName.keyword is template-declared") {
    assume(haveArtifacts, "reference artifacts not present")
    Seq("spark-task-metrics", "spark-stage-agg-metrics").foreach { n =>
      val t = templates(n)
      val p = patterns.find(_.title == s"$n*").get
      assert(unexplained(p, t).isEmpty, s"$n: dynamic extras in a metrics pattern")
      val listed = p.fields.map(_._1).filterNot(_.startsWith("_")).toSet
      val hidden = t.fields.map(_.path).filterNot(listed).sorted
      // metricsType: consumed by the pipeline's routing (unmapped in the
      // template); metricTime: superseded by the ingest @timestamp
      assert(hidden == Seq("metricTime", "metricsType"), s"$n: $hidden")
      assert(listed.contains("appName.keyword") && t.hasKeyword("appName"))
    }
  }

  test("logs pattern: template explains everything except logTime (hidden) and the dynamic runtime roots") {
    assume(haveArtifacts, "reference artifacts not present")
    val t = templates("spark-logs")
    val p = patterns.find(_.title == "spark-logs*").get
    val dynRoots = Seq("loggerFqcn", "mdc.", "message.", "source.")
    val stray = unexplained(p, t).filterNot(n =>
      dynRoots.exists(r => n == r.stripSuffix(".") || n.startsWith(r)))
    assert(stray.isEmpty, s"unexplained logs fields: $stray")
    val listed = p.fields.map(_._1).filterNot(_.startsWith("_")).toSet
    val hidden = t.fields.map(_.path)
      .filterNot(f => listed(f) || listed(f + ".keyword"))
    assert(hidden == Seq("logTime"))
    // the naming skew the dynamic roots come from: the template
    // anticipated `fqcn`, real events carry `loggerFqcn`
    assert(t.fields.exists(_.path == "fqcn") && listed.contains("loggerFqcn"))
  }
}
