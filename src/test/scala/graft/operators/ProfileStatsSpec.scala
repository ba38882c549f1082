package graft.operators

import graft.SparkTestBase

class ProfileStatsSpec extends SparkTestBase {
  import spark.implicits._

  test("profiles counts, nulls, distincts, min/max in one pass") {
    val df = Seq(
      (Some(1L), Some(2.5), Some("ab")),
      (Some(1L), None, Some("abcd")),
      (Some(3L), Some(-1.0), None),
      (None, Some(2.5), Some(""))
    ).toDF("k", "v", "s")
    val out = ProfileStats.profile(df, Seq("k", "v", "s"))
      .as[(String, Long, Long, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(out("k") == (("k", 4L, 1L, 2L, Some(1.0), Some(3.0))))
    assert(out("v") == (("v", 4L, 1L, 2L, Some(-1.0), Some(2.5))))
    // string column profiles LENGTH for min/max
    assert(out("s") == (("s", 4L, 1L, 3L, Some(0.0), Some(4.0))))
  }

  test("all-null column yields null min/max and zero distinct") {
    val df = Seq((1L, Option.empty[String]), (2L, None)).toDF("k", "s")
    val out = ProfileStats.profile(df, Seq("s"))
      .as[(String, Long, Long, Long, Option[Double], Option[Double])].head()
    assert(out == (("s", 2L, 2L, 0L, None, None)))
  }
}
