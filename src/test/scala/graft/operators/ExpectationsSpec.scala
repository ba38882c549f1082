package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkTestBase {
  import spark.implicits._

  private def df = Seq(
    (1L, Some(10L), "ok"),
    (2L, Some(-5L), "ok"),     // fails nonneg
    (3L, None, "ok"),          // fails nonneg (null → fail)
    (4L, Some(10L), "bad"),    // fails tag
    (5L, Some(-1L), "bad")     // fails both
  ).toDF("id", "v", "tag")

  private def rules = Seq(
    "nonneg" -> (col("v").isNotNull && col("v") >= 0L),
    "known_tag" -> (col("tag") === "ok"))

  test("route: passing rows keep schema, quarantined rows carry the failing rule names") {
    val (good, bad) = Expectations.route(df, rules)
    assert(good.columns.toSeq == Seq("id", "v", "tag"))
    assert(good.select("id").as[Long].collect().toSet == Set(1L))
    val failedBy = bad.select($"id", $"failed_rules").as[(Long, Seq[String])]
      .collect().toMap
    assert(failedBy == Map(
      2L -> Seq("nonneg"), 3L -> Seq("nonneg"),
      4L -> Seq("known_tag"), 5L -> Seq("nonneg", "known_tag")))
  }

  test("report: per-rule violation counts plus total/ok/quarantined in one pass") {
    val rpt = Expectations.report(df, rules)
      .as[(String, Long)].collect().toMap
    assert(rpt == Map("nonneg" -> 3L, "known_tag" -> 2L,
      "__total" -> 5L, "__ok" -> 1L, "__quarantined" -> 4L))
  }

  test("route and report agree with each other") {
    val (good, bad) = Expectations.route(df, rules)
    val rpt = Expectations.report(df, rules).as[(String, Long)].collect().toMap
    assert(good.count() == rpt("__ok") && bad.count() == rpt("__quarantined"))
  }
}
