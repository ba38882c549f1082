package graft.operators

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def planString(df: org.apache.spark.sql.DataFrame): String = {
    val plan: SparkPlan = df.queryExecution.executedPlan
    plan.toString()
  }

  test("pointInInterval matches the brute-force cross join at several bin widths") {
    val rnd = new scala.util.Random(20260812L)
    val points = (1L to 500L).map(i => (i, rnd.nextInt(10000).toLong)).toSeq
    // interval lengths 0..599 — includes empty, sub-bin and multi-bin spans
    val intervals = (1L to 60L).map { i =>
      val s = rnd.nextInt(10000).toLong
      (i, s, s + rnd.nextInt(600).toLong)
    }.toSeq
    val expected = (for {
      (pid, p) <- points
      (iid, s, e) <- intervals
      if p >= s && p < e
    } yield (pid, iid)).sorted

    val pdf = points.toDF("pid", "p")
    val idf = intervals.toDF("iid", "s", "e")
    for (w <- Seq(1L, 37L, 256L, 1024L, 100000L)) {
      val got = RangeJoin.pointInInterval(pdf, idf, "p", "s", "e", binWidthMs = w)
        .select($"pid", $"iid").as[(Long, Long)].collect().toSeq
      // exactly once per matching pair: compare as sorted sequences
      assert(got.sorted == expected, s"mismatch at binWidth=$w")
    }
  }

  test("negative (pre-epoch) times bin uniformly — floor, not truncate-toward-zero") {
    val rnd = new scala.util.Random(47L)
    val points = (1L to 300L).map(i => (i, rnd.nextInt(4000).toLong - 2000L)).toSeq
    val intervals = (1L to 40L).map { i =>
      val s = rnd.nextInt(4000).toLong - 2000L
      (i, s, s + rnd.nextInt(300).toLong)
    }.toSeq
    val expected = (for {
      (pid, p) <- points
      (iid, s, e) <- intervals
      if p >= s && p < e
    } yield (pid, iid)).sorted
    val got = RangeJoin.pointInInterval(
        points.toDF("pid", "p"), intervals.toDF("iid", "s", "e"),
        "p", "s", "e", binWidthMs = 128L)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSeq
    assert(got.sorted == expected)
  }

  test("points on interval edges: start inclusive, end exclusive; inverted spans match nothing") {
    val pdf = Seq((1L, 100L), (2L, 199L), (3L, 200L), (4L, 99L)).toDF("pid", "p")
    val idf = Seq((10L, 100L, 200L), (11L, 300L, 300L), (12L, 400L, 350L)).toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(pdf, idf, "p", "s", "e", binWidthMs = 100L)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 10L)))
  }

  test("plans as an equi hash join — no nested-loop or cartesian fallback") {
    val pdf = (1L to 100L).map(i => (i, i * 7 % 1000)).toDF("pid", "p")
    val idf = (1L to 20L).map(i => (i, i * 50, i * 50 + 40)).toDF("iid", "s", "e")
    val joined = RangeJoin.pointInInterval(pdf, idf, "p", "s", "e", binWidthMs = 64L)
    joined.collect()
    val plan = planString(joined)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Join"), plan)
  }

  test("intervalOverlap matches brute force exactly once, keyed and unkeyed, across bin widths") {
    val rnd = new scala.util.Random(20260813L)
    // lengths 0..499: empty, sub-bin, multi-bin; starts may be negative
    def mk(n: Int) = (1L to n.toLong).map { i =>
      val s = rnd.nextInt(6000).toLong - 3000L
      (i, i % 5, s, s + rnd.nextInt(500).toLong)
    }.toSeq
    val ls = mk(120)
    val rs = mk(90)
    val expectedKeyed = (for {
      (li, lk, s1, e1) <- ls
      (ri, rk, s2, e2) <- rs
      if lk == rk && s1 < e2 && s2 < e1
    } yield (li, ri)).sorted
    val expectedUnkeyed = (for {
      (li, _, s1, e1) <- ls
      (ri, _, s2, e2) <- rs
      if s1 < e2 && s2 < e1
    } yield (li, ri)).sorted

    val ldf = ls.toDF("id_l", "k_l", "s_l", "e_l")
    val rdf = rs.toDF("id_r", "k_r", "s_r", "e_r")
    for (w <- Seq(1L, 64L, 300L, 100000L)) {
      val keyed = RangeJoin.intervalOverlap(ldf, rdf, "s_l", "e_l", "s_r", "e_r",
          binWidth = w, keys = Seq("k_l" -> "k_r"))
        .select($"id_l", $"id_r").as[(Long, Long)].collect().toSeq
      assert(keyed.sorted == expectedKeyed, s"keyed mismatch at binWidth=$w")
      val unkeyed = RangeJoin.intervalOverlap(ldf, rdf, "s_l", "e_l", "s_r", "e_r",
          binWidth = w)
        .select($"id_l", $"id_r").as[(Long, Long)].collect().toSeq
      assert(unkeyed.sorted == expectedUnkeyed, s"unkeyed mismatch at binWidth=$w")
    }
  }

  test("intervalOverlap half-open semantics: touching spans do not overlap") {
    val ldf = Seq((1L, 100L, 200L)).toDF("id_l", "s_l", "e_l")
    val rdf = Seq((10L, 200L, 300L), (11L, 199L, 200L), (12L, 50L, 101L),
      (13L, 250L, 250L)).toDF("id_r", "s_r", "e_r")
    val got = RangeJoin.intervalOverlap(ldf, rdf, "s_l", "e_l", "s_r", "e_r", 100L)
      .select($"id_l", $"id_r").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 11L), (1L, 12L)))
  }

  test("intervalOverlap plans as an equi hash join — no nested-loop or cartesian fallback") {
    val ldf = (1L to 50L).map(i => (i, i * 37 % 900, i * 37 % 900 + 80)).toDF("id_l", "s_l", "e_l")
    val rdf = (1L to 50L).map(i => (i, i * 53 % 900, i * 53 % 900 + 60)).toDF("id_r", "s_r", "e_r")
    val joined = RangeJoin.intervalOverlap(ldf, rdf, "s_l", "e_l", "s_r", "e_r", 128L)
    joined.collect()
    val plan = planString(joined)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Join"), plan)
  }

  test("reserved/colliding column names are rejected") {
    val pdf = Seq((1L, 1L)).toDF("pid", "p")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(pdf, Seq((1L, 1L, 2L)).toDF("pid", "s", "e"),
        "p", "s", "e", 10L)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(pdf.withColumn("__bin", lit(1)),
        Seq((1L, 1L, 2L)).toDF("iid", "s", "e"), "p", "s", "e", 10L)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(pdf, Seq((1L, 1L, 2L)).toDF("iid", "s", "e"),
        "p", "s", "e", 0L)
    }
  }
}
