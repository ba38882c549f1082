package graft.operators

import graft.SparkTestBase

class GlobalRankSpec extends SparkTestBase {
  import spark.implicits._

  test("distributed rank equals the single-partition window on random data") {
    val rng = new scala.util.Random(11)
    val rows = (1L to 5000L).map(i => (i, s"v${rng.nextInt(800)}"))
    val df = rows.toDF("id", "v").repartition(16)
    val got = GlobalRank.rowNumber(df, Seq("v", "id"), "rn", Some(8))
      .select("id", "rn").as[(Long, Long)].collect().toMap
    val want = rows.sortBy(r => (r._2, r._1)).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    assert(got == want)
  }

  test("rank is dense 1..n and strictly follows the sort order") {
    val df = Seq(("b", 2L), ("a", 1L), ("c", 3L), ("a", 4L))
      .toDF("k", "id")
    val got = GlobalRank.rowNumber(df, Seq("k", "id"), "rn", Some(3))
      .select("k", "id", "rn").as[(String, Long, Long)].collect().sortBy(_._3)
    assert(got.map(_._3).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(got.map(r => (r._1, r._2)).toSeq ==
      Seq(("a", 1L), ("a", 4L), ("b", 2L), ("c", 3L)))
  }

  test("plan has no unpartitioned data-scale window") {
    val df = (1L to 100L).toDF("id")
    val plan = GlobalRank.rowNumber(df, Seq("id"), "rn", Some(4))
      .queryExecution.executedPlan.toString
    // the only global-order window runs over the #partitions-row counts
    // frame; the data-scale window must be partitioned by __pid
    assert(plan.contains("__pid"))
  }
}
