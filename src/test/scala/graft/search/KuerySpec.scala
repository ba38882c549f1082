package graft.search

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class KuerySpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the slow query ran", "en", "src1", 100L, true),
    (2L, "fast path", "en", "src11", 900L, false),
    (3L, "langsam", "de", "src2", 1200L, true),
    (4L, "slow fast mixed", "fr", "src9", 50L, false)
  ).toDF("id", "text", "lang", "source", "n_chars", "flag")

  private def ids(kuery: String, default: Seq[String] = Seq("text")): Seq[Long] =
    docs.filter(Kuery.predicate(docs, kuery, default))
      .select($"id").as[Long].collect().sorted.toSeq

  test("field contains vs .keyword exact vs wildcard") {
    // analyzed contains: 'src1' is inside both src1 and src11
    assert(ids("source: src1") == Seq(1L, 2L))
    // keyword suffix = exact term
    assert(ids("source.keyword: src1") == Seq(1L))
    // whole-value wildcard
    assert(ids("source: src1*") == Seq(1L, 2L))
    assert(ids("text: *slow*") == Seq(1L, 4L))
  }

  test("boolean operators, precedence and parentheses") {
    // and binds tighter than or: de-doc OR (en AND src11-doc)
    assert(ids("lang.keyword: de or lang.keyword: en and source.keyword: src11")
      == Seq(2L, 3L))
    assert(ids("(lang.keyword: de or lang.keyword: en) and source.keyword: src11")
      == Seq(2L))
    assert(ids("not lang.keyword: en") == Seq(3L, 4L))
    assert(ids("not (lang.keyword: en or lang.keyword: de)") == Seq(4L))
  }

  test("typed comparisons on numeric and boolean fields") {
    assert(ids("n_chars >= 900") == Seq(2L, 3L))
    assert(ids("n_chars < 100") == Seq(4L))
    assert(ids("n_chars: 1200") == Seq(3L))
    assert(ids("flag: true") == Seq(1L, 3L))
  }

  test("value groups expand against the same field") {
    assert(ids("source.keyword: (src1 or src2)") == Seq(1L, 3L))
    assert(ids("lang.keyword: (en or fr) and n_chars < 200") == Seq(1L, 4L))
  }

  test("free text: bare words merge into one phrase over default fields") {
    assert(ids("slow fast") == Seq(4L))
    assert(ids("\"slow query\"") == Seq(1L))
    // free text then a field query: the phrase stops at the field
    assert(ids("slow fast and lang.keyword: fr") == Seq(4L))
  }

  test("field: * is the existence query on any field type") {
    val withNulls = Seq(
      (1L, Some("x"), Some(5L)), (2L, None, Some(7L)), (3L, Some("y"), None)
    ).toDF("id", "s", "n")
    def got(k: String) = withNulls.filter(Kuery.predicate(withNulls, k, Nil))
      .select($"id").as[Long].collect().sorted.toSeq
    assert(got("s: *") == Seq(1L, 3L))
    assert(got("n: *") == Seq(1L, 2L))       // works on numeric fields too
    assert(got("not s: *") == Seq(2L))
    // quoted "*" stays a literal phrase, not an existence check
    assert(got("s: \"*\"").isEmpty)
  }

  test("quoted phrases keep wildcards and operators literal") {
    // '*' inside quotes is not magic — matches nothing here
    assert(ids("text: \"*slow*\"").isEmpty)
    // escaped quote inside a phrase parses
    val df = Seq((1L, "say \"hi\" now")).toDF("id", "text")
    val got = df.filter(Kuery.predicate(df, "text: \"say \\\"hi\\\"\"", Nil))
    assert(got.count() == 1)
  }

  test("nested struct paths resolve like level.name") {
    val logs = Seq(("boom", 200L, "ERROR"), ("ok", 400L, "INFO"))
      .toDF("message", "intLevel", "name")
      .select($"message", struct($"intLevel", $"name").as("level"))
    val p = Kuery.predicate(logs, "level.name: ERROR and level.intLevel <= 300", Nil)
    assert(logs.filter(p).count() == 1)
  }

  test("compile-time failures are descriptive, never executor-time") {
    def err(k: String): String =
      intercept[IllegalArgumentException](
        Kuery.predicate(docs, k, Seq("text"))).getMessage
    assert(err("nosuch: 1").contains("unknown field"))
    assert(err("n_chars: abc").contains("not a valid"))
    assert(err("n_chars: ab*").contains("wildcard on non-string"))
    assert(err("lang.keyword:").contains("expected a value"))
    assert(err("(lang.keyword: en").contains("expected"))
    assert(err("text: \"unterminated").contains("unterminated"))
  }

  test("the reference's saved-search string runs verbatim") {
    val logs = Seq(
      ("TPCDS SQL Benchmark 3000 GB", "oom on shuffle"),
      ("other app", "fine")).toDF("appName", "message")
    val p = Kuery.predicate(logs,
      "appName.keyword: \"TPCDS SQL Benchmark 3000 GB\"", Seq("message"))
    assert(logs.filter(p).count() == 1)
  }

  test("empty kuery selects everything") {
    assert(ids("") == Seq(1L, 2L, 3L, 4L))
    assert(ids("   ") == Seq(1L, 2L, 3L, 4L))
  }
}
