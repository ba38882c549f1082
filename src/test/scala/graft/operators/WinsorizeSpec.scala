package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class WinsorizeSpec extends SparkTestBase {
  import spark.implicits._

  test("clamped values equal the serial rank-based twin") {
    val rng = new scala.util.Random(11)
    val rows = (1L to 500L).map(i => (s"g${i % 3}", i, rng.nextInt(1000).toLong))
    val df = rows.toDF("g", "id", "v")
    val got = Winsorize.clamp(df, "g", "v", "id", 0.1, 0.9)
      .select("g", "id", "clamped").as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // serial twin: same rank definition
    val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._2))
      val n = sorted.length
      val lo = sorted(math.floor(0.1 * (n - 1)).toInt)._3
      val hi = sorted(math.floor(0.9 * (n - 1)).toInt)._3
      rs.map(r => (g, r._2) -> math.max(math.min(r._3, hi), lo))
    }
    assert(got == want.toMap)
  }

  test("degenerate groups: single row and all-equal values clamp to themselves") {
    val df = Seq(("a", 1L, 42L), ("b", 2L, 7L), ("b", 3L, 7L)).toDF("g", "id", "v")
    val out = Winsorize.clamp(df, "g", "v", "id", 0.05, 0.95)
      .select("id", "clamped").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 42L, 2L -> 7L, 3L -> 7L))
  }

  test("row count and group totals are preserved (clamp, not drop)") {
    val df = spark.range(0, 1000)
      .select(($"id" % 5).cast("string").as("g"), $"id", ($"id" * 13 % 997).as("v"))
    val out = Winsorize.clamp(df, "g", "v", "id", 0.25, 0.75)
    assert(out.count() == 1000)
    assert(out.groupBy("g").count().as[(String, Long)].collect().toMap
      .values.forall(_ == 200))
  }
}
