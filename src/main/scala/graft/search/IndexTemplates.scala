package graft.search

import org.apache.spark.sql.types._

/** Parser for OpenSearch index templates — the reference bootstraps its
  * three indices from mapping templates (deployment/infra/resources/
  * lambda/opensearch-bootstrap/resources/templates/
  * {spark-logs,spark-task-metrics,spark-stage-agg-metrics}.json; the
  * bootstrap lambda PUTs each under `_index_template`,
  * opensearch-bootstrap/bootstrap.py). A template declares the glob of
  * index names it governs (`index_patterns`), a field mapping tree
  * (`mappings.properties`), and shard/replica settings.
  *
  * This module closes that config surface the way [[SavedObjects]]
  * closes the dashboard export and [[graft.ingest.PipelineConfig]] the
  * pipeline YAML: parse the file a reference user already has and turn
  * its mapping into Spark terms — a [[IndexTemplate.schema StructType]]
  * for reading documents shaped like the index, and a schema
  * [[IndexTemplates.conformance conformance]] report proving an ingest
  * frame matches what the index declares (the engine's A1/A2/A11 output
  * schemas are spec-gated against the three REAL templates).
  *
  * Type mapping (ES → Spark): `keyword`/`text` → String, `long` →
  * Long, `integer` → Integer, `double` → Double, `float` → Float,
  * `boolean` → Boolean, `date` → Timestamp (the reference's collector
  * posts epoch millis), object nodes (bare `properties`) → Struct.
  * A field with `"enabled": false` (the templates' `metricsType` —
  * stored in _source, never indexed) is UNMAPPED: kept as String in
  * the schema, compatible with anything in conformance.
  *
  * Conformance is structural and coercion-aware, per ES index-time
  * rules rather than strict equality: a `date` column may arrive as
  * timestamp, epoch-long or ISO string; `long` accepts any narrower
  * integral; Spark ARRAY columns unwrap (every ES field is implicitly
  * multi-valued); a Spark MAP column covers the whole template subtree
  * under its path (the logs template's `contextData` tree is Jackson's
  * serialization of Log4j2's StringMap — the deep wire schema models
  * it as map<string,string>, which ES coerces member-wise).
  */
object IndexTemplates {

  /** One leaf of the mapping tree: dotted path + its ES type
    * (`"unmapped"` for `enabled:false` fields).
    */
  final case class FieldMapping(path: String, esType: String)

  final case class IndexTemplate(
      patterns: Seq[String],
      fields: Seq[FieldMapping],
      keywordPaths: Set[String],
      shards: Int,
      replicas: Int) {

    /** Does this template govern `indexName`? (ES submits each new
      * index's name against every template's `index_patterns` globs.)
      */
    def governs(indexName: String): Boolean =
      patterns.exists(SavedObjects.indexTitleMatches(_, indexName))

    /** Does `path` declare a `.keyword` multi-field? (The export's
      * saved objects aggregate on `appName.keyword` etc. — the
      * template is where that sub-field is declared.)
      */
    def hasKeyword(path: String): Boolean = keywordPaths.contains(path)

    /** The mapping tree as a Spark read schema: object nodes become
      * structs, leaves their mapped Spark type, in declaration order.
      */
    lazy val schema: StructType = {
      def build(fs: Seq[(List[String], String)]): StructType =
        StructType(
          fs.foldLeft(Vector.empty[(String, Seq[(List[String], String)])]) {
            case (acc, (head :: tail, t)) =>
              acc.indexWhere(_._1 == head) match {
                case -1 => acc :+ (head -> Seq(tail -> t))
                case i => acc.updated(i, head -> (acc(i)._2 :+ (tail -> t)))
              }
            case (acc, (Nil, _)) => acc
          }.map { case (name, children) =>
            children match {
              case Seq((Nil, t)) => StructField(name, sparkType(t))
              case cs => StructField(name, build(cs))
            }
          })
      build(fields.map(f => f.path.split('.').toList -> f.esType))
    }
  }

  /** ES type → Spark type (see object doc). Unknown types throw —
    * a template is config, typos must fail fast.
    */
  def sparkType(esType: String): DataType = esType match {
    case "keyword" | "text" | "unmapped" => StringType
    case "long" => LongType
    case "integer" => IntegerType
    case "double" => DoubleType
    case "float" => FloatType
    case "boolean" => BooleanType
    case "date" => TimestampType
    case other => throw new IllegalArgumentException(
      s"unsupported mapping type '$other'")
  }

  /** Index-time coercion compatibility: may a Spark column of type
    * `dt` feed a template field of ES type `esType`?
    */
  private[search] def compatible(esType: String, dt: DataType): Boolean =
    (esType, dt) match {
      case ("unmapped", _) => true
      case (_, ArrayType(e, _)) => compatible(esType, e) // multi-valued
      case ("keyword" | "text", StringType) => true
      case ("long", LongType | IntegerType | ShortType | ByteType) => true
      case ("integer", IntegerType | ShortType | ByteType) => true
      case ("double", DoubleType | FloatType | LongType | IntegerType) => true
      case ("float", FloatType) => true
      case ("boolean", BooleanType) => true
      case ("date", TimestampType | TimestampNTZType | DateType |
                    LongType | StringType) => true
      case _ => false
    }

  sealed trait Status
  /** Frame column matches the declared mapping. */
  case object Ok extends Status
  /** Template declares it, the frame lacks it — legal in ES (absent
    * fields are simply not indexed), reported for visibility.
    */
  case object MissingInFrame extends Status
  /** The frame carries it, the template does not — ES would
    * dynamic-map it on first write.
    */
  case object Undeclared extends Status
  /** Present on both sides with an incompatible type — ES would
    * reject the document at index time.
    */
  case object TypeMismatch extends Status

  final case class Finding(path: String, status: Status,
      declared: Option[String], actual: Option[String])

  /** Structural conformance of a frame schema against a template: one
    * finding per union-ed dotted path, [[Ok]] rows included (so a spec
    * can assert the COMPLETE report). Struct columns recurse; an array
    * unwraps to its element; a map column covers the entire template
    * subtree below its path with one finding.
    */
  def conformance(schema: StructType, t: IndexTemplate): Seq[Finding] = {
    def flatten(st: StructType, prefix: String): Seq[(String, DataType)] =
      st.fields.toSeq.flatMap { f =>
        val p = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        f.dataType match {
          case s: StructType => flatten(s, p)
          case ArrayType(s: StructType, _) => flatten(s, p)
          case dt => Seq(p -> dt)
        }
      }
    val frame = flatten(schema, "")
    val frameByPath = frame.toMap
    val declared = t.fields.map(f => f.path -> f.esType).toMap
    // a map column absorbs every declared path strictly below it
    val mapRoots = frame.collect { case (p, _: MapType) => p }
    def underMap(path: String): Option[String] =
      mapRoots.find(r => path.startsWith(r + "."))

    // a declared enabled:false subtree absorbs every frame path under
    // it (ES stores but never indexes the children — any shape is fine)
    val unmappedRoots = t.fields.collect {
      case FieldMapping(p, "unmapped") => p
    }
    val frameFindings = frame.map { case (p, dt) =>
      declared.get(p) match {
        case Some(es) if compatible(es, dt) =>
          Finding(p, Ok, Some(es), Some(dt.simpleString))
        case Some(es) =>
          Finding(p, TypeMismatch, Some(es), Some(dt.simpleString))
        case None if dt.isInstanceOf[MapType] &&
            t.fields.exists(_.path.startsWith(p + ".")) =>
          // the subtree-covering map: one Ok row for the root
          Finding(p, Ok, Some("object"), Some(dt.simpleString))
        case None if unmappedRoots.exists(r => p.startsWith(r + ".")) =>
          Finding(p, Ok, Some("unmapped"), Some(dt.simpleString))
        case None => Finding(p, Undeclared, None, Some(dt.simpleString))
      }
    }
    val missing = t.fields.collect {
      case FieldMapping(p, es)
          if !frameByPath.contains(p) && underMap(p).isEmpty &&
            // an unmapped root carried as a frame STRUCT surfaces only
            // its children in the flattened view — present, not missing
            !frame.exists(_._1.startsWith(p + ".")) =>
        Finding(p, MissingInFrame, Some(es), None)
    }
    frameFindings ++ missing
  }

  /** The template governing `indexName`, smallest matching pattern
    * first for determinism (mirrors [[SavedObjects]]' table routing).
    * The tie-break key is the smallest pattern that actually MATCHES
    * the index name — a multi-pattern template must not win the route
    * on the strength of a pattern that didn't match (its `.min` over
    * ALL patterns could be an unrelated low-sorting glob).
    */
  def templateFor(templates: Seq[IndexTemplate],
      indexName: String): Option[IndexTemplate] =
    templates.filter(_.governs(indexName))
      .sortBy(_.patterns.filter(
        SavedObjects.indexTitleMatches(_, indexName)).min)
      .headOption

  /** Parse one `_index_template` JSON document (the bootstrap files'
    * exact shape: `index_patterns` + `template.{mappings,settings}`).
    */
  def parse(json: String): IndexTemplate = {
    import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
    import scala.jdk.CollectionConverters._
    val root = new ObjectMapper().readTree(json)
    val patterns = root.path("index_patterns") match {
      case n if n.isArray => n.elements().asScala.map(_.asText).toSeq
      case _ => throw new IllegalArgumentException(
        "index template without index_patterns")
    }
    val fields = Vector.newBuilder[FieldMapping]
    val keywords = Set.newBuilder[String]
    def walk(props: JsonNode, prefix: String): Unit =
      props.properties().asScala.foreach { e =>
        val name = e.getKey
        val node = e.getValue
        val path = if (prefix.isEmpty) name else s"$prefix.$name"
        // enabled:false wins over properties: ES stores the whole
        // subtree in _source but indexes none of it — one unmapped
        // field at the root, children never walked
        if (node.path("enabled").isBoolean &&
            !node.path("enabled").asBoolean) {
          fields += FieldMapping(path, "unmapped")
        } else if (node.has("properties")) walk(node.path("properties"), path)
        else {
          val t = node.path("type")
          require(t.isTextual, s"mapping leaf '$path' has no type")
          sparkType(t.asText()) // validate at parse
          fields += FieldMapping(path, t.asText())
          if (node.path("fields").has("keyword")) keywords += path
        }
      }
    val mappings = root.path("template").path("mappings").path("properties")
    require(mappings.isObject, "index template without mappings.properties")
    walk(mappings, "")
    val idx = root.path("template").path("settings").path("index")
    def intSetting(name: String, dflt: Int): Int = {
      val n = idx.path(name)
      if (n.isMissingNode) dflt else n.asText.toInt
    }
    IndexTemplate(patterns, fields.result(), keywords.result(),
      intSetting("number_of_shards", 1), intSetting("number_of_replicas", 1))
  }
}
