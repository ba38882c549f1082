package graft.search

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** SavedObjects importer: parse/dispatch on hand-built lines plus the
  * real thing — the reference's entire exported dashboard ndjson (34
  * saved objects), every visualization panel of which must import and
  * EXECUTE against a task-metrics-shaped frame. This is the gate for
  * "a user hands over their dashboard export and it runs".
  */
class SavedObjectsSpec extends SparkTestBase {
  import spark.implicits._

  private val refNdjson =
    "/root/reference/deployment/infra/resources/lambda/opensearch-bootstrap/" +
      "resources/dashboards/data-skew.ndjson"

  test("parses panels, skips controls/index-patterns/searches") {
    val lines = Seq(
      """{"type":"index-pattern","attributes":{"title":"x*"}}""",
      """{"type":"visualization","attributes":{"title":"ctl","visState":"{\"type\":\"input_control_vis\",\"params\":{}}"}}""",
      """{"type":"visualization","attributes":{"title":"m","visState":"{\"type\":\"metric\",\"aggs\":[{\"id\":\"1\",\"enabled\":true,\"type\":\"sum\",\"params\":{\"field\":\"v\"},\"schema\":\"metric\"}]}"}}""")
    val panels = SavedObjects.parseNdjson(lines)
    assert(panels.map(_.title) == Seq("m"))
    assert(panels.head.metrics == Seq(
      SavedObjects.MetricAgg("1", "sum", "v", "sum(v)", Seq(50))))
  }

  test("terms ordering follows the referenced metric id per level") {
    // groups: a(total 60), b(total 100), c(total 10) -> top-2 by sum =
    // b, a; _count order would instead pick a (3 rows) and c (2 rows)
    val df = Seq(
      ("a", 10.0), ("a", 20.0), ("a", 30.0),
      ("b", 100.0), ("c", 4.0), ("c", 6.0)).toDF("k", "v")
    val panel = SavedObjects.Panel("p", None,
      Seq(SavedObjects.MetricAgg("1", "sum", "v", "total", Seq())),
      Seq(SavedObjects.BucketAgg("terms", "k", 2, "1", orderDesc = true,
        Seq.empty, 86400000L)))
    val got = SavedObjects.run(df, panel)
      .select($"bucket", $"val").as[(String, Long)].collect().toSet
    assert(got == Set(("b", 10000L), ("a", 6000L)))
    val byCount = SavedObjects.run(df,
      panel.copy(buckets = panel.buckets.map(_.copy(orderBy = "_count"))))
      .select($"bucket").as[String].collect().toSet
    assert(byCount == Set("a", "c"))
  }

  test("avg- and cardinality-ordered terms rank by the TRUE metric, not its sum partial") {
    // a: 3 rows avg 10, sum 30; b: 1 row avg 20, sum 20 — avg order must
    // pick b first even though a's sum is larger
    val df = Seq(("a", 10.0, "u1"), ("a", 10.0, "u1"), ("a", 10.0, "u1"),
      ("b", 20.0, "u2")).toDF("k", "v", "u")
    val avgPanel = SavedObjects.Panel("p", None,
      Seq(SavedObjects.MetricAgg("1", "avg", "v", "m", Seq())),
      Seq(SavedObjects.BucketAgg("terms", "k", 1, "1", orderDesc = true,
        Seq.empty, 86400000L)))
    assert(SavedObjects.run(df, avgPanel)
      .select($"bucket").as[String].collect().toList == List("b"))
    // c: 2 rows 3 distinct-ish users? — cardinality order: x has 4 rows
    // but 1 distinct user, y has 2 rows with 2 distinct users
    val df2 = Seq(("x", 1.0, "u1"), ("x", 1.0, "u1"), ("x", 1.0, "u1"),
      ("x", 1.0, "u1"), ("y", 1.0, "u2"), ("y", 1.0, "u3")).toDF("k", "v", "u")
    val cardPanel = SavedObjects.Panel("p", None,
      Seq(SavedObjects.MetricAgg("1", "cardinality", "u", "m", Seq())),
      Seq(SavedObjects.BucketAgg("terms", "k", 1, "1", orderDesc = true,
        Seq.empty, 86400000L)))
    assert(SavedObjects.run(df2, cardPanel)
      .select($"bucket").as[String].collect().toList == List("y"))
  }

  test("per-bucket percentiles are exact type-1 quantiles") {
    val df = Seq.tabulate(100)(i => ("g", i / 100.0 + 0.001)).toDF("k", "v")
    val panel = SavedObjects.Panel("p", None,
      Seq(SavedObjects.MetricAgg("1", "percentiles", "v", "pct", Seq(25, 50, 99))),
      Seq(SavedObjects.BucketAgg("terms", "k", 5, "_count", orderDesc = true,
        Seq.empty, 86400000L)))
    val got = SavedObjects.run(df, panel)
      .select($"metric", $"val").as[(String, Long)].collect().toMap
    // cents of row at rank ceil(p*100/100): v_25 = 0.24+0.001 -> 24 ...
    assert(got == Map("pct p25" -> 24L, "pct p50" -> 49L, "pct p99" -> 98L))
  }

  test("the reference's full dashboard export imports and executes") {
    assume(Files.exists(Paths.get(refNdjson)), "reference export not present")
    val lines = Files.readAllLines(Paths.get(refNdjson)).asScala.toSeq
    val panels = SavedObjects.parseNdjson(lines)
    // every agg-bearing visualization imports; the export's 34 objects
    // hold well over a dozen of them
    assert(panels.size >= 15, s"only ${panels.size} panels imported")
    val kinds = panels.flatMap(p =>
      p.metrics.map(_.kind) ++ p.buckets.map(_.kind)).toSet
    assert(Set("cardinality", "sum", "max", "percentiles", "terms",
      "range", "date_histogram").subsetOf(kinds), s"vocabulary seen: $kinds")

    // a task-metrics-shaped frame covering every referenced field:
    // numeric where a value/range agg reads it, timestamp for
    // date_histogram, string otherwise
    val numeric = panels.flatMap(p =>
      p.metrics.filter(m => Set("sum", "max", "min", "avg",
        "percentiles").contains(m.kind)).map(_.field) ++
        p.buckets.filter(_.kind == "range").map(_.field)).toSet
    val times = panels.flatMap(_.buckets
      .filter(_.kind == "date_histogram").map(_.field)).toSet
    val fields = panels.flatMap(p => p.metrics.map(_.field) ++
      p.buckets.map(_.field)).filter(_.nonEmpty).toSet
    var df = spark.range(200).toDF("id")
    fields.foreach { f =>
      val cname = f.stripSuffix(".keyword")
      val c =
        if (times.contains(f))
          to_timestamp(lit(1767225600L) + $"id" * 3600)
        else if (numeric.contains(f)) ($"id" % 37) * 0.7
        else concat(lit(cname.take(2)), ($"id" % 5).cast("string"))
      df = df.withColumn(cname, c)
    }
    panels.foreach { p =>
      val out = SavedObjects.run(df, p)
      assert(out.columns.toSeq == Seq("panel", "bucket", "metric", "val"),
        s"${p.title}: ${out.columns.toSeq}")
      assert(out.count() > 0, s"${p.title} returned no rows")
    }
  }
}
