package graft.search

import java.nio.file.{Files, Paths}

import scala.util.{Random, Try}

import graft.SparkTestBase

/** Fuzz the import surfaces with mutated copies of the REAL export: a
  * corrupted or hand-edited saved-objects file must degrade to
  * skipped lines (the entry points' `Try(...).toOption` posture),
  * never to an exception escaping the import. Two mutation families:
  * raw char-level damage (broken JSON) and structured damage (valid
  * JSON, one field deleted or retyped — probing the extraction logic
  * where a careless cast would live).
  */
class ImportFuzzSpec extends SparkTestBase {
  import spark.implicits._

  private val ndjson = "/root/reference/deployment/infra/resources/" +
    "lambda/opensearch-bootstrap/resources/dashboards/data-skew.ndjson"
  private val rnd = new Random(777L)

  private def realLines: Seq[String] = {
    import scala.jdk.CollectionConverters._
    Files.readAllLines(Paths.get(ndjson)).asScala.toSeq.filter(_.nonEmpty)
  }

  private def charMutate(s: String): String = rnd.nextInt(4) match {
    case 0 => s.take(rnd.nextInt(s.length max 1)) // truncate
    case 1 => // delete one char
      val i = rnd.nextInt(s.length max 1); s.take(i) + s.drop(i + 1)
    case 2 => // replace one char with a structural one
      val i = rnd.nextInt(s.length max 1)
      s.take(i) + "{}[]\",:".charAt(rnd.nextInt(7)) + s.drop(i + 1)
    case _ => s + s.take(rnd.nextInt(20)) // trailing garbage
  }

  /** Valid-JSON structural mutation: delete or retype one random
    * top-level-ish field via coarse regex surgery on a known key.
    */
  private def structMutate(s: String): String = {
    val keys = Seq("type", "attributes", "visState", "title", "references",
      "searchSourceJSON", "id", "fields", "timeFieldName", "panelsJSON")
    val k = keys(rnd.nextInt(keys.size))
    if (rnd.nextBoolean())
      s.replaceFirst("\"" + k + "\"", "\"" + k + "_gone\"") // effectively deletes
    else
      s.replaceFirst("\"" + k + "\"\\s*:\\s*\"", "\"" + k + "\":42,\"x\":\"") // retype
  }

  private def parseAllTolerantly(lines: Seq[String]): Int =
    Seq[String => Option[Any]](
      l => Try(SavedObjects.parseLine(l)).toOption.flatten,
      l => Try(SavedObjects.parseSearchLine(l)).toOption.flatten,
      l => Try(SavedObjects.parseDashboardLine(l)).toOption.flatten,
      l => Try(SavedObjects.parseIndexPatternLine(l)).toOption.flatten,
      l => Try(SavedObjects.parseControlsLine(l)).toOption.flatten
    ).map(f => lines.flatMap(l => f(l)).size).sum

  test("400 mutated export copies: every parse path degrades to a skip, never an escape") {
    assume(Files.exists(Paths.get(ndjson)), "reference export not present")
    val base = realLines
    (1 to 400).foreach { trial =>
      val mutated = base.map(l =>
        if (rnd.nextBoolean()) charMutate(l) else structMutate(l))
      // must complete without any throwable escaping the Try wrappers
      val parsed = parseAllTolerantly(mutated)
      assert(parsed >= 0, s"trial $trial")
    }
  }

  test("a damaged export still imports end-to-end: surviving lines run, broken ones skip") {
    assume(Files.exists(Paths.get(ndjson)), "reference export not present")
    import org.apache.spark.sql.functions._
    val base = realLines
    // break exactly the first half of the lines; leave the rest intact
    val half = base.zipWithIndex.map { case (l, i) =>
      if (i % 2 == 0) charMutate(l) else l
    }
    // adaptive frame: whatever panels survived the damage, give them
    // their fields (the SavedObjectsSpec real-export idiom)
    val panels = SavedObjects.parseNdjson(half)
    val fields = panels.flatMap(p => p.metrics.map(_.field) ++
      p.buckets.map(_.field)).filter(_.nonEmpty).toSet
    val numeric = panels.flatMap(p =>
      p.metrics.filter(m => Set("sum", "max", "min", "avg",
        "percentiles").contains(m.kind)).map(_.field) ++
        p.buckets.filter(_.kind == "range").map(_.field)).toSet
    val times = panels.flatMap(_.buckets
      .filter(_.kind == "date_histogram").map(_.field)).toSet
    var df = spark.range(50).toDF("id")
    fields.foreach { f =>
      val cname = f.stripSuffix(".keyword")
      val c =
        if (times.contains(f)) to_timestamp(lit(1767225600L) + $"id" * 3600)
        else if (numeric.contains(f)) ($"id" % 37) * 0.7
        else concat(lit(cname.take(2)), ($"id" % 5).cast("string"))
      df = df.withColumn(cname, c)
    }
    val synthNow = Some(new java.sql.Timestamp(1767225600000L + 200L * 3600000L))
    val out = SavedObjects.runNdjson(df, half, now = synthNow)
    // tolerant import: SOME frame comes back (fewer panels than the
    // pristine export would yield), and nothing threw
    assert(out.columns.toSet == Set("panel", "bucket", "metric", "val"))
    assert(out.count() >= 0L)
  }
}
