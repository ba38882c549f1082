package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class NoveltySpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, Seq[String])]) =
    Novelty.ngramNovelty(rows.toDF("batch", "sh"), "batch", col("sh"))
      .select("batch", "n_grams", "n_novel", "novelty_ppm")
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> t).toMap

  test("the first batch is 100% novel; a verbatim re-crawl is 0%") {
    val got = run(Seq(
      (0L, Seq("a b c", "b c d")),
      (1L, Seq("a b c", "b c d"))))
    assert(got(0L) == ((0L, 2L, 2L, 1000000L)))
    assert(got(1L) == ((1L, 2L, 0L, 0L)))
  }

  test("novelty counts DISTINCT grams per batch, not occurrences") {
    // gram "x" appears in two docs of batch 0: counted once
    val got = run(Seq((0L, Seq("x", "y")), (0L, Seq("x"))))
    assert(got(0L) == ((0L, 2L, 2L, 1000000L)))
  }

  test("first occurrence is by MIN batch — order of rows is irrelevant") {
    val got = run(Seq(
      (2L, Seq("a", "b")),
      (0L, Seq("a")),
      (1L, Seq("a", "b", "c"))))
    // batch 0: a novel; batch 1: b, c novel of 3; batch 2: none of 2
    assert(got(0L)._3 == 1L)
    assert(got(1L) == ((1L, 3L, 2L, 666666L)))
    assert(got(2L) == ((2L, 2L, 0L, 0L)))
  }

  test("ppm truncates (integer div), never rounds up") {
    val got = run(Seq((0L, Seq("a", "b")), (1L, Seq("a", "b", "c"))))
    assert(got(1L)._4 == 333333L)
  }
}
