package graft.operators

import java.time.Duration

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class OperatorsSpec extends SparkTestBase {
  import spark.implicits._

  test("TopK.perGroup keeps exactly k rows per group with ranks 1..k") {
    val df = Seq(
      ("a", 10), ("a", 30), ("a", 20), ("a", 40),
      ("b", 5), ("b", 1)
    ).toDF("g", "v")
    val got = TopK.perGroup(df, Seq($"g"), Seq($"v".desc, $"g"), 2)
      .orderBy($"g", $"rk")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    assert(got.toSeq == Seq(("a", 40, 1), ("a", 30, 2), ("b", 5, 1), ("b", 1, 2)))
  }

  test("TopK.global plans TakeOrderedAndProject (no full sort at scale)") {
    val df = spark.range(0, 10000).toDF("id")
    val plan = TopK.global(df, Seq($"id".desc), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("Buckets covers boundaries like the dashboards' range agg") {
    val df = Seq(0.0, 0.05, 0.1, 0.49999, 0.5, 0.79, 0.8, 1.0, 1.5, -0.1).toDF("x")
    val got = df.select(Buckets.skewBuckets($"x").as("b")).as[String].collect()
    assert(got.toSeq == Seq(
      "0.0-0.1", "0.0-0.1", "0.1-0.5", "0.1-0.5", "0.5-0.8",
      "0.5-0.8", "0.8-1.0", "0.8-1.0", "other", "other"))
  }

  test("DateHistogram auto interval picks normalized ladder rungs") {
    assert(DateHistogram.autoIntervalSeconds(Duration.ofMinutes(5), 60) == 5)
    assert(DateHistogram.autoIntervalSeconds(Duration.ofMinutes(5), 50) == 30)
    assert(DateHistogram.autoIntervalSeconds(Duration.ofHours(10), 50) == 1800)
    assert(DateHistogram.autoIntervalSeconds(Duration.ofDays(30), 30) == 86400)
    assert(DateHistogram.autoIntervalSeconds(Duration.ofDays(36500), 10) == 7 * 86400)
  }

  test("DateHistogram.autoInterval escalates to calendar rungs for long spans") {
    assert(DateHistogram.autoInterval(Duration.ofDays(30), 30) == Left(86400L))
    assert(DateHistogram.autoInterval(Duration.ofDays(300), 50) == Left(7 * 86400L))
    assert(DateHistogram.autoInterval(Duration.ofDays(1500), 50) == Right("month"))
    assert(DateHistogram.autoInterval(Duration.ofDays(2404), 50) == Right("quarter"))
    assert(DateHistogram.autoInterval(Duration.ofDays(36500), 50) == Right("year"))
    assert(DateHistogram.autoInterval(Duration.ofDays(365000), 50) == Right("year"))
  }

  test("DateHistogram.bucket floors timestamps to the interval") {
    val df = Seq("2024-01-15 13:47:31").toDF("s")
      .select(to_timestamp($"s").as("ts"))
    val got = df.select(
      date_format(DateHistogram.bucket($"ts", 1800), "yyyy-MM-dd HH:mm:ss").as("b"))
      .as[String].head()
    assert(got == "2024-01-15 13:30:00")
  }
}
