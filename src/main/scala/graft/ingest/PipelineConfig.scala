package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Parser for the reference's ingestion-pipeline YAML config — the
  * Data Prepper subset its pipelines use (cf. deployment/infra/
  * resources/pipelines/{metrics,logs}-pipeline.yaml and
  * deployment/dev/pipelines.yaml): a freely-NAMED pipeline block (the
  * deployed files say `pipeline:`, the dev compose file
  * `dev-pipeline:` — the first top-level mapping with a source/sink
  * wins), an `http` source with a path, an optional `route` list of
  * named JSON-pointer conditions
  * (`- task-metrics: '/metricsType == "taskMetrics"'`), an optional
  * `processor` chain (`date` from-time-received / `delete_entries` /
  * single-field `grok` — the reference dev file's processor
  * vocabulary, compiled onto the A15 [[Transforms]] primitives), and
  * opensearch sinks each naming an `index` and optionally the `routes`
  * that feed it. The semantics these files declare are what
  * [[Pipelines]] hard-codes ([[Transforms.route]] on `metricsType`,
  * one sink per record family); this importer closes the config
  * surface the same way [[graft.search.SavedObjects]] closes the
  * dashboard-export one: hand the engine the YAML a reference user
  * already has, get the same routing as code.
  *
  * Condition vocabulary (everything the reference files use, plus the
  * obvious negation): `/field == "string"`, `/field != "string"`, and
  * unquoted numeric literals for both operators. A nested pointer
  * `/a/b` addresses a struct field `a.b`. Anything else throws —
  * pipeline config is infrastructure, so unlike the tolerant dashboard
  * import a typo must fail fast, not silently drop a route.
  *
  * Routing semantics (Data Prepper's): a sink with `routes` receives
  * records matching ANY of its named routes (OR); a sink with no
  * `routes` receives EVERY record. Route conditions are not exclusive
  * — one record can land in several sinks. `routedFrames` compiles
  * this to one filter per sink over a shared frame: each sink is a
  * predicate-pushed scan, no shuffle introduced by routing itself.
  *
  * Parsing uses jackson-dataformat-yaml (on Spark's classpath — the
  * same no-new-dependency posture as json4s for the saved-object
  * import).
  */
object PipelineConfig {

  /** Resolve a JSON-pointer field stepwise: the first segment is a
    * (backtick-quoted) top-level column, every further segment an
    * extraction — struct field OR map key — so a pointer into a
    * `map<string,...>` column, or one whose key contains a literal dot
    * (the reference dev pipeline's dormant grok key
    * `contextData/map/mdc.taskName`, deployment/dev/pipelines.yaml),
    * addresses correctly where a single dotted `col()` cannot.
    */
  private[ingest] def resolvePointer(pointer: String): Column = {
    val segs = pointer.stripPrefix("/").split('/')
    require(segs.nonEmpty && segs.forall(_.nonEmpty),
      s"malformed JSON pointer '$pointer': expected /segment[/segment...] " +
        "with non-empty segments (got an empty or degenerate pointer)")
    segs.tail.foldLeft(col(s"`${segs.head}`"))(_.apply(_))
  }

  /** One named route condition: `name: '/field op "value"'`. `field`
    * is dot-joined (the historical storage form); [[predicate]]
    * resolves it segment-by-segment, so a pointer step into a map
    * column works — the one shape this form cannot express is a route
    * key with a LITERAL dot (grok, which keeps the raw pointer, can).
    */
  final case class Route(name: String, field: String, op: String,
      value: Either[String, Double]) {
    def predicate: Column = {
      val segs = field.split('.')
      val c = segs.tail.foldLeft(col(s"`${segs.head}`"))(_.apply(_))
      val v = value.fold(lit, lit)
      op match {
        case "==" => c === v
        case "!=" =>
          // Data Prepper's != matches records where the key differs —
          // including records missing the key (null), hence null-safe
          !(c <=> v)
      }
    }
  }

  /** One sink: the index it writes and the route names feeding it
    * (empty = unrouted sink, receives everything).
    */
  final case class Sink(index: String, routes: Seq[String])

  /** The processor vocabulary the reference's pipelines declare (the
    * dev pipeline's commented-out block, deployment/dev/pipelines.yaml
    * — the dormant A15 processors): `date` with `from_time_received`
    * (server-side ingest timestamp), `delete_entries` (drop noise
    * fields), and a single-field `grok` match. Each compiles onto the
    * [[Transforms]] primitive already gated for that row.
    */
  sealed trait Processor
  final case class DateProcessor(destination: String) extends Processor
  final case class DeleteEntries(keys: Seq[String]) extends Processor
  final case class Grok(field: String, pattern: String) extends Processor

  final case class Config(sourcePath: Option[String], routes: Seq[Route],
      sinks: Seq[Sink], processors: Seq[Processor] = Seq.empty) {

    /** Run the declared processor chain, in declaration order. `now`
      * anchors the `date` processor's ingest timestamp (injectable for
      * determinism, [[Transforms.serverTimestamp]]'s contract; defaults
      * to wall-clock like a live pipeline). Grok emits one STRING
      * column per named capture (Data Prepper's untyped grok output);
      * a non-matching record gets nulls, [[Transforms.parseMdc]]'s
      * posture, not the throw of the reference's split-by-space.
      */
    def applyProcessors(df: DataFrame,
        now: Option[java.sql.Timestamp] = None): DataFrame =
      processors.foldLeft(df) {
        case (d, DateProcessor(dest)) =>
          Transforms.serverTimestamp(d, now.getOrElse(
            new java.sql.Timestamp(System.currentTimeMillis())), dest)
        case (d, DeleteEntries(keys)) => Transforms.dropFields(d, keys: _*)
        case (d, Grok(field, pattern)) =>
          val (rx, names) = grokToRegex(pattern)
          // stepwise pointer resolution: grok keeps the RAW pointer, so
          // map keys and dotted names (mdc.taskName) address correctly
          val src = resolvePointer(field)
          names.zipWithIndex.foldLeft(d) { case (dd, (n, i)) =>
            dd.withColumn(n,
              when(src.rlike(rx), regexp_extract(src, rx, i + 1)))
          }
      }

    /** The records a sink receives, given the full ingest frame. */
    def sinkFilter(df: DataFrame, sink: Sink): DataFrame =
      if (sink.routes.isEmpty) df
      else {
        val byName = routes.map(r => r.name -> r).toMap
        val preds = sink.routes.map { n =>
          byName.getOrElse(n, throw new IllegalArgumentException(
            s"sink '${sink.index}' references undeclared route '$n'"))
            .predicate
        }
        df.filter(preds.reduce(_ || _))
      }

    /** Every sink's routed frame, keyed by its index name. */
    def routedFrames(df: DataFrame): Seq[(String, DataFrame)] =
      sinks.map(s => s.index -> sinkFilter(df, s))
  }

  private val CondRx =
    """^\s*/([\w/]+)\s*(==|!=)\s*(?:"([^"]*)"|(-?\d+(?:\.\d+)?))\s*$""".r

  private val GrokCaptureRx = """%\{(\w+):(\w+)\}""".r

  /** Convert a grok expression to (java regex, capture names): every
    * `%{TYPE:name}` becomes a capturing group of that type's pattern;
    * the surrounding literal text passes through verbatim (the
    * reference's pattern carries its own `\(`/`\)` escapes). Supported
    * types are the common grok core — unknown types throw (config
    * error, fail fast).
    */
  private[ingest] def grokToRegex(pattern: String): (String, Seq[String]) = {
    val names = GrokCaptureRx.findAllMatchIn(pattern).map(_.group(2)).toSeq
    val rx = GrokCaptureRx.replaceAllIn(pattern, m => {
      val sub = m.group(1) match {
        case "NUMBER" => """[0-9]+(?:\.[0-9]+)?"""
        case "INT" => """[+-]?[0-9]+"""
        case "WORD" => """\w+"""
        case "NOTSPACE" => """\S+"""
        case "DATA" => """.*?"""
        case "GREEDYDATA" => """.*"""
        case other => throw new IllegalArgumentException(
          s"unsupported grok type %{$other:...}")
      }
      java.util.regex.Matcher.quoteReplacement(s"($sub)")
    })
    (rx, names)
  }

  /** Parse one route condition string. Throws on anything outside the
    * supported vocabulary.
    */
  private[ingest] def parseCondition(name: String, cond: String): Route =
    cond match {
      case CondRx(path, op, str, num) =>
        Route(name, path.replace('/', '.'), op,
          if (str != null) Left(str) else Right(num.toDouble))
      case _ => throw new IllegalArgumentException(
        s"route '$name': unsupported condition '$cond' " +
          "(expected /field == \"value\" | /field != \"value\" | numeric)")
    }

  /** Parse a pipeline YAML document. The pipeline block is the FIRST
    * top-level mapping that declares a `source` or `sink` — Data
    * Prepper names pipelines freely (the deployed files say
    * `pipeline:`, the dev compose file `dev-pipeline:`). Throws when no
    * such block exists, on a route entry that is not a single
    * name→condition mapping, or on an opensearch sink without an
    * `index`.
    */
  def parse(yaml: String): Config = {
    import com.fasterxml.jackson.databind.ObjectMapper
    import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
    import scala.jdk.CollectionConverters._
    val root = new ObjectMapper(new YAMLFactory()).readTree(yaml)
    val p = root.properties().asScala
      .map(_.getValue)
      .find(v => v.isObject &&
        (v.has("source") || v.has("sink")))
      .getOrElse(throw new IllegalArgumentException(
        "config has no pipeline block (a mapping with source/sink)"))
    val sourcePath = Option(p.path("source").path("http").path("path"))
      .filter(_.isTextual).map(_.asText)
    // fail-fast on a PRESENT-but-malformed block: a scalar `routes:`
    // silently turning a routed sink into a catch-all (or a mis-shaped
    // `route:`/`processor:` silently vanishing) would route data to the
    // wrong index, the worst failure mode config can have
    def arrayOrAbsent(node: com.fasterxml.jackson.databind.JsonNode,
        what: String): Option[com.fasterxml.jackson.databind.JsonNode] =
      node match {
        case n if n.isMissingNode || n.isNull => None
        case n if n.isArray => Some(n)
        case n => throw new IllegalArgumentException(
          s"$what must be a YAML list, got: $n")
      }
    val routes = arrayOrAbsent(p.path("route"), "route").map {
      _.elements().asScala.map { e =>
        val fields = e.properties().asScala.toSeq
        require(fields.size == 1,
          s"route entry must be one name→condition mapping: $e")
        val kv = fields.head
        parseCondition(kv.getKey, kv.getValue.asText)
      }.toSeq
    }.getOrElse(Seq.empty)
    val sinks = arrayOrAbsent(p.path("sink"), "sink").map {
      _.elements().asScala.flatMap { e =>
        val os = e.path("opensearch")
        if (os.isMissingNode) None
        else {
          val idx = os.path("index")
          require(idx.isTextual,
            s"opensearch sink without an 'index': $e")
          val rs = arrayOrAbsent(os.path("routes"),
              s"sink '${idx.asText}' routes")
            .map(_.elements().asScala.map(_.asText).toSeq)
            .getOrElse(Seq.empty)
          Some(Sink(idx.asText, rs))
        }
      }.toSeq
    }.getOrElse(Seq.empty)
    val processors = arrayOrAbsent(p.path("processor"), "processor").map {
      _.elements().asScala.map { e =>
        val fields = e.properties().asScala.toSeq
        require(fields.size == 1,
          s"processor entry must be one type mapping: $e")
        val kv = fields.head
        val body = kv.getValue
        kv.getKey match {
          case "date" =>
            require(body.path("from_time_received").asBoolean(false),
              "date processor supports only from_time_received: true")
            DateProcessor(Option(body.path("destination"))
              .filter(_.isTextual).map(_.asText).getOrElse("@timestamp"))
          case "delete_entries" =>
            DeleteEntries(body.path("with_keys") match {
              case k if k.isArray =>
                k.elements().asScala.map(_.asText).toSeq
              case _ => Seq.empty
            })
          case "grok" =>
            val m = body.path("match")
            require(m.isObject, "grok processor needs a 'match' mapping")
            val entries = m.properties().asScala.toSeq
            require(entries.size == 1,
              "grok: exactly one match field supported")
            val me = entries.head
            val pats = me.getValue
            val pat =
              (if (pats.isArray) pats.elements().asScala.toSeq.headOption
               else Some(pats)).map(_.asText).getOrElse(
                throw new IllegalArgumentException("grok: empty pattern list"))
            grokToRegex(pat) // validate at parse, not first use
            Grok(me.getKey, pat)
          case other => throw new IllegalArgumentException(
            s"unsupported processor '$other'")
        }
      }.toSeq
    }.getOrElse(Seq.empty)
    Config(sourcePath, routes, sinks, processors)
  }
}
