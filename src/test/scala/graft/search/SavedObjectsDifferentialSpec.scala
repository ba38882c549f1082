package graft.search

import java.sql.Timestamp

import scala.util.Random

import graft.SparkTestBase

/** Randomized differential for the multi-index export router — the one
  * central compiler that lacked one (kuery, pipeline-config, composite
  * and the graph ops all have theirs). Random exports (index-pattern
  * lines with exact/glob/orphan titles and optional time fields ×
  * panels with valid/dangling/absent references, optional kueries and
  * optional terms buckets × optional default frame × optional global
  * time picker) run through [[SavedObjects.runExport]] and must equal
  * an independent resolver evaluated over plain Scala rows: exact
  * table-name key first, then smallest glob-matching name, then the
  * default, else a tolerant skip; the picker cuts each routed panel on
  * ITS pattern's declared time field only.
  */
class SavedObjectsDifferentialSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new Random(10152026L)

  // -------------------------------------------------------------- data
  private val t0 = 1704067200000L // 2024-01-01T00:00:00Z
  private val now = new Timestamp(t0 + 10L * 86400000L) // day 10
  private val kPool = Seq("alpha", "beta", "gamma", "delta")

  private type Row3 = (String, Long, Timestamp)
  private def makeRows(seed: Int, n: Int): Seq[Row3] = {
    val r = new Random(seed)
    Seq.fill(n)((kPool(r.nextInt(kPool.size)), r.nextInt(100).toLong,
      new Timestamp(t0 + r.nextInt(10) * 86400000L))) // days 0..9
  }

  private val tableRows: Map[String, Seq[Row3]] = Map(
    "spark-task-metrics-2024" -> makeRows(1, 40),
    "spark-logs-app" -> makeRows(2, 25),
    "metrics" -> makeRows(3, 30),
    "otel-logs" -> makeRows(4, 15))

  // ----------------------------------------------------- export source
  private case class Pat(id: String, title: String, timeField: Option[String])
  private case class Vis(title: String, ref: Option[String],
      kuery: Option[String], terms: Boolean)

  // JSON built with json4s, not string splicing — the kuery rides two
  // nesting levels deep (a JSON string inside a JSON string), which
  // hand-escaping would get wrong long before the router could
  private def patLine(p: Pat): String = {
    import org.json4s._
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods.{compact, render}
    val attrs0: JObject = "title" -> p.title
    val attrs = p.timeField.fold(attrs0)(f => attrs0 ~ ("timeFieldName" -> f))
    compact(render(
      ("type" -> "index-pattern") ~ ("id" -> p.id) ~ ("attributes" -> attrs)))
  }

  private def visLine(v: Vis): String = {
    import org.json4s._
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods.{compact, render}
    val countAgg: JObject = ("id" -> "1") ~ ("enabled" -> true) ~
      ("type" -> "count") ~ ("params" -> (("customLabel" -> "n"): JObject)) ~
      ("schema" -> "metric")
    val termsAgg: JObject = ("id" -> "2") ~ ("enabled" -> true) ~
      ("type" -> "terms") ~
      ("params" -> (("field" -> "k") ~ ("size" -> 10))) ~
      ("schema" -> "bucket")
    val aggs = if (v.terms) List(countAgg, termsAgg) else List(countAgg)
    val visState = compact(render(("type" -> "table") ~ ("aggs" -> aggs)))
    val attrs0: JObject = ("title" -> v.title) ~ ("visState" -> visState)
    val attrs = v.kuery.fold(attrs0) { kq =>
      val source = compact(render(
        "query" -> (("query" -> kq) ~ ("language" -> "kuery"))))
      attrs0 ~ ("kibanaSavedObjectMeta" ->
        (("searchSourceJSON" -> source): JObject))
    }
    val doc0: JObject = ("type" -> "visualization") ~ ("attributes" -> attrs)
    val doc = v.ref.fold(doc0)(r => doc0 ~ ("references" -> List(
      ("id" -> r) ~
        ("name" -> "kibanaSavedObjectMeta.searchSourceJSON.index") ~
        ("type" -> "index-pattern"))))
    compact(render(doc))
  }

  // ------------------------------------------------ independent oracle
  private def globMatches(title: String, name: String): Boolean =
    name.matches(title.split("\\*", -1)
      .map(java.util.regex.Pattern.quote).mkString(".*"))

  /** The routing contract restated independently: exact key, else the
    * lexicographically smallest glob-matching table name, else default.
    */
  private def route(pats: Map[String, Pat], v: Vis,
      tables: Map[String, Seq[Row3]],
      default: Option[String]): Option[(Option[Pat], String)] = {
    val viaRef = for {
      r <- v.ref
      p <- pats.get(r)
      name <- if (tables.contains(p.title)) Some(p.title)
        else tables.keys.toSeq.sorted.find(globMatches(p.title, _))
    } yield (Some(p): Option[Pat], name)
    viaRef.orElse(default.map(d =>
      (v.ref.flatMap(pats.get), d))) // default keeps the pattern for the picker
  }

  private def expected(pats: Map[String, Pat], vs: Seq[Vis],
      tables: Map[String, Seq[Row3]], default: Option[String],
      globalDays: Option[Int]): Map[(String, String, String), Long] = {
    val out = scala.collection.mutable.Map[(String, String, String), Long]()
    vs.foreach { v =>
      route(pats, v, tables, default).foreach { case (pat, name) =>
        var rows = tables(name)
        for (d <- globalDays; tf <- pat.flatMap(_.timeField)) {
          require(tf == "ts")
          val lo = now.getTime - d * 86400000L
          rows = rows.filter(r => r._3.getTime >= lo && r._3.getTime <= now.getTime)
        }
        v.kuery.foreach { kq =>
          val want = kq.split("\"")(1) // k.keyword: "<want>"
          rows = rows.filter(_._1 == want)
        }
        if (v.terms)
          rows.groupBy(_._1).foreach { case (k, rs) =>
            out((v.title, k, "n")) = rs.size.toLong
          }
        else out((v.title, "all", "n")) = rows.size.toLong
      }
    }
    out.toMap
  }

  test("120 random exports: runExport routing == independent resolver") {
    val frames = tableRows.map { case (n, rows) => n -> rows.toDF("k", "v", "ts") }
    val titlePool = tableRows.keys.toSeq ++ Seq(
      "spark-*", "*logs*", "*metrics*", "spark-task-*", "*-app",
      "zzz*", "absent", "otel-*")
    (1 to 120).foreach { trial =>
      val pats = (0 until 1 + rnd.nextInt(3)).map { i =>
        Pat(s"ip$i", titlePool(rnd.nextInt(titlePool.size)),
          if (rnd.nextBoolean()) Some("ts") else None)
      }.map(p => p.id -> p).toMap
      val vs = (0 until 1 + rnd.nextInt(4)).map { i =>
        Vis(s"p$i",
          rnd.nextInt(100) match {
            case x if x < 70 => Some(s"ip${rnd.nextInt(3)}") // may dangle
            case x if x < 85 => Some("ip-gone")
            case _ => None
          },
          if (rnd.nextInt(3) == 0)
            Some(s"""k.keyword: "${kPool(rnd.nextInt(kPool.size))}"""")
          else None,
          terms = rnd.nextInt(10) < 3)
      }
      val defaultName =
        if (rnd.nextBoolean())
          Some(tableRows.keys.toSeq.sorted.apply(rnd.nextInt(tableRows.size)))
        else None
      val globalDays = if (rnd.nextInt(5) < 2) Some(5) else None
      val lines = pats.values.map(patLine).toSeq ++ vs.map(visLine)

      val want = expected(pats, vs, tableRows, defaultName, globalDays)
      val (got0, cleanup) = SavedObjects.runExportManaged(
        frames, lines, now = Some(now),
        default = defaultName.map(frames),
        globalRange = globalDays.map(d => (s"now-${d}d", "now")))
      val got = got0
        .select($"panel", $"bucket", $"metric", $"val")
        .as[(String, String, String, Long)].collect()
        .map { case (p, b, m, v) => (p, b, m) -> v }.toMap
      cleanup()
      assert(got == want,
        s"trial $trial diverged\n patterns=$pats\n panels=$vs\n " +
          s"default=$defaultName globalDays=$globalDays\n " +
          s"got=$got\n want=$want")
    }
  }
}
