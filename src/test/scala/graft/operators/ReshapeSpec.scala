package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ReshapeSpec extends SparkTestBase {
  import spark.implicits._

  test("melt emits one (variable, value) row per value column, ids carried") {
    val wide = Seq(("a", 1L, 10L, 100L), ("b", 2L, 20L, 200L))
      .toDF("k", "x", "y", "z")
    val got = Reshape.melt(wide, Seq("k"), Seq("x", "y"), "m", "v")
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("a", "x", 1L), ("a", "y", 10L),
      ("b", "x", 2L), ("b", "y", 20L)))
  }

  test("meltAll melts every non-id column") {
    val got = Reshape.meltAll(Seq(("a", 1L, 2L)).toDF("k", "x", "y"), Seq("k"))
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("a", "x", 1L), ("a", "y", 2L)))
  }

  test("melt round-trips through a pivot back to the wide form") {
    val wide = Seq(("a", 1L, 10L), ("b", 2L, 20L)).toDF("k", "x", "y")
    val back = Reshape.melt(wide, Seq("k"), Seq("x", "y"))
      .groupBy($"k").pivot("variable", Seq("x", "y")).agg(first($"value"))
      .as[(String, Long, Long)].collect().toSet
    assert(back == Set(("a", 1L, 10L), ("b", 2L, 20L)))
  }

  test("melt plans map-side Expand — no shuffle before the fan-out") {
    val wide = (1 to 100).map(i => (i.toString, i.toLong, i.toLong * 2))
      .toDF("k", "x", "y")
    val melted = Reshape.melt(wide, Seq("k"), Seq("x", "y"))
    melted.collect()
    val plan = melted.queryExecution.executedPlan.toString()
    assert(plan.contains("Expand"), plan)
    assert(!plan.contains("Exchange"), plan)
  }
}
