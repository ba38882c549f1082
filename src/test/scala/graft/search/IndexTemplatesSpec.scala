package graft.search

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Transforms
import graft.model.Schemas
import graft.search.IndexTemplates._

/** IndexTemplates: the reference's three bootstrap index templates,
  * parsed from the REAL files, and the engine's ingest output schemas
  * proven conformant with what each index declares.
  */
class IndexTemplatesSpec extends AnyFunSuite {

  private val tplDir = "/root/reference/deployment/infra/resources/" +
    "lambda/opensearch-bootstrap/resources/templates"

  private def load(name: String): IndexTemplate = {
    assume(Files.exists(Paths.get(s"$tplDir/$name.json")),
      "reference templates not present")
    IndexTemplates.parse(
      new String(Files.readAllBytes(Paths.get(s"$tplDir/$name.json"))))
  }

  test("the real task-metrics template parses: pattern, types, keyword multi-field, unmapped discriminator") {
    val t = load("spark-task-metrics")
    assert(t.patterns == Seq("spark-task-metrics*"))
    assert(t.shards == 1 && t.replicas == 1)
    val byPath = t.fields.map(f => f.path -> f.esType).toMap
    assert(byPath("appId") == "keyword")
    assert(byPath("appName") == "text")
    assert(byPath("runTime") == "long")
    assert(byPath("metricTime") == "date")
    // metricsType is enabled:false — stored, never indexed
    assert(byPath("metricsType") == "unmapped")
    // appName declares the .keyword multi-field the saved objects
    // aggregate on (appName.keyword); appId is already keyword
    assert(t.hasKeyword("appName") && !t.hasKeyword("appId"))
    // the governed-index glob
    assert(t.governs("spark-task-metrics") &&
      t.governs("spark-task-metrics-2024.01.10") &&
      !t.governs("spark-logs"))
    // the mapping as a Spark read schema
    assert(t.schema("metricTime").dataType == TimestampType)
    assert(t.schema("runTime").dataType == LongType)
    assert(t.schema("appId").dataType == StringType)
  }

  test("Schemas.taskMetrics conforms to the task-metrics template; the only template-only field is the routed-away discriminator") {
    val t = load("spark-task-metrics")
    val report = conformance(Schemas.taskMetrics, t)
    assert(report.collect { case Finding(p, TypeMismatch, _, _) => p }.isEmpty)
    assert(report.collect { case Finding(p, Undeclared, _, _) => p }.isEmpty)
    // metricsType is consumed by A12 routing before the typed
    // projection — exactly the field the frame legitimately lacks
    assert(report.collect { case Finding(p, MissingInFrame, _, _) => p } ==
      Seq("metricsType"))
    // Int columns feed long mappings (stageId/partitionId widen)
    assert(report.exists(f => f.path == "stageId" && f.status == Ok &&
      f.actual == Some("int") && f.declared == Some("long")))
  }

  test("Schemas.stageAggMetrics conforms to the stage-agg template the same way") {
    val t = load("spark-stage-agg-metrics")
    assert(t.patterns == Seq("spark-stage-agg-metrics*"))
    val report = conformance(Schemas.stageAggMetrics, t)
    assert(report.forall(f =>
      f.status == Ok || (f.status == MissingInFrame && f.path == "metricsType")))
    assert(report.exists(f => f.path == "inputBytesReadSkewness" &&
      f.status == Ok && f.declared == Some("double")))
  }

  test("the deep log wire schema conforms to the spark-logs template: map-covered MDC, epoch-millis date, layout noise accounted for") {
    val t = load("spark-logs")
    val report = conformance(Transforms.rawLogSchemaDeep, t)
    val by = report.groupBy(_.status).view
      .mapValues(_.map(_.path).toSet).toMap

    assert(by.getOrElse(TypeMismatch, Set.empty) == Set.empty)
    // contextData is ONE map column covering the template's whole
    // Jackson-serialized StringMap subtree
    assert(report.exists(f => f.path == "contextData" && f.status == Ok &&
      f.declared == Some("object")))
    assert(!report.exists(_.path.startsWith("contextData.")))
    // logTime arrives as epoch millis — a legal date coercion
    assert(report.exists(f => f.path == "logTime" && f.status == Ok &&
      f.declared == Some("date") && f.actual == Some("bigint")))
    // template-only fields are exactly the Log4j2 layout noise the A5
    // light projection (and the dev pipeline's delete_entries) drops,
    // plus the stack-frame `format` int and the cause-level keyword
    // variants the synthetic proxies never carried
    assert(by.getOrElse(MissingInFrame, Set.empty) == Set(
      "endOfBatch", "fqcn", "includeLocation", "nanoTime",
      "parameterCount", "populated",
      "thrownProxy.extendedStackTrace.stackTraceElement.format",
      "thrownProxy.causeProxy.extendedStackTrace.stackTraceElement.format"))
    // frame-only fields: the injected identity (appears in the
    // template too — appId/appName/executorId are declared) and the
    // cause-proxy message fields the template never sampled
    assert(by.getOrElse(Undeclared, Set.empty) == Set(
      "thrownProxy.causeProxy.message",
      "thrownProxy.causeProxy.localizedMessage"))
  }

  test("templateFor routes an index name to its governing template") {
    val ts = Seq(load("spark-logs"), load("spark-task-metrics"),
      load("spark-stage-agg-metrics"))
    assert(templateFor(ts, "spark-logs-000001").get.patterns ==
      Seq("spark-logs*"))
    assert(templateFor(ts, "spark-stage-agg-metrics").get.patterns ==
      Seq("spark-stage-agg-metrics*"))
    assert(templateFor(ts, "unrelated-index").isEmpty)
  }

  test("templateFor tie-breaks on the pattern that MATCHED, not a template's unrelated low-sorting glob") {
    def tmpl(pats: String*) = IndexTemplates.parse(
      s"""{"index_patterns": [${pats.map("\"" + _ + "\"").mkString(",")}],
         | "template": {"mappings": {"properties": {}}}}""".stripMargin)
    // both govern "zz9": t1 via "zz*", t2 via "z*". t1's NON-matching
    // "aaa*" sorts below everything — the old all-patterns min would
    // hand t1 the route on a pattern that didn't match; the matching
    // min is t2's "z*".
    val t1 = tmpl("aaa*", "zz*")
    val t2 = tmpl("z*")
    assert(IndexTemplates.templateFor(Seq(t1, t2), "zz9").get.patterns ==
      Seq("z*"))
    // determinism: argument order must not matter
    assert(IndexTemplates.templateFor(Seq(t2, t1), "zz9").get.patterns ==
      Seq("z*"))
    // and t1 still wins names only it governs
    assert(IndexTemplates.templateFor(Seq(t1, t2), "aaa7").get.patterns ==
      Seq("aaa*", "zz*"))
  }

  test("compatibility rules: arrays unwrap, unmapped accepts anything, narrowing rejects") {
    assert(compatible("long", ArrayType(LongType)))
    assert(compatible("text", ArrayType(StringType)))
    assert(compatible("unmapped", MapType(StringType, StringType)))
    assert(!compatible("integer", LongType)) // would overflow 32 bits
    assert(!compatible("boolean", StringType))
    assert(compatible("date", StringType) && compatible("date", LongType))
  }

  test("an enabled:false OBJECT is one unmapped subtree: children never walked, any frame shape absorbed") {
    val t = IndexTemplates.parse(
      """{"index_patterns":["x*"],"template":{"mappings":{"properties":{
        |"ctx":{"enabled":false,"properties":{"a":{"type":"long"}}},
        |"id":{"type":"keyword"}}}}}""".stripMargin)
    // ES stores ctx.* in _source but indexes none of it — one field
    assert(t.fields.map(f => f.path -> f.esType) ==
      Seq("ctx" -> "unmapped", "id" -> "keyword"))
    // a frame carrying ANY structure under ctx conforms
    val schema = StructType(Seq(
      StructField("ctx", StructType(Seq(
        StructField("a", StringType), StructField("b", BooleanType)))),
      StructField("id", StringType)))
    val report = conformance(schema, t)
    assert(report.forall(_.status == Ok), report.filterNot(_.status == Ok))
  }

  test("malformed templates fail fast") {
    assertThrows[IllegalArgumentException] {
      IndexTemplates.parse("""{"template":{"mappings":{"properties":{}}}}""")
    }
    assertThrows[IllegalArgumentException] {
      IndexTemplates.parse(
        """{"index_patterns":["x*"],"template":{"mappings":{
          |"properties":{"f":{"type":"geo_shape"}}}}}""".stripMargin)
    }
  }
}
