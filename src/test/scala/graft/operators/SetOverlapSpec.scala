package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SetOverlapSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(String, Seq[Long])]) =
    SetOverlap.pairwise(rows.toDF("g", "items"), "g", col("items"))
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap

  test("identical sets: full overlap, jaccard 1e6 ppm") {
    val got = run(Seq(("a", Seq(1L, 2L)), ("b", Seq(1L, 2L))))
    assert(got(("a", "b")) == (("a", "b", 2L, 2L, 2L, 1000000L)))
  }

  test("disjoint sets produce no pair row") {
    assert(run(Seq(("a", Seq(1L)), ("b", Seq(2L)))).isEmpty)
  }

  test("partial overlap: truncating ppm of |∩| / |∪|") {
    // ∩ = {2}, ∪ = {1,2,3} → 333333 ppm
    val got = run(Seq(("a", Seq(1L, 2L)), ("b", Seq(2L, 3L))))
    assert(got(("a", "b")) == (("a", "b", 1L, 2L, 2L, 333333L)))
  }

  test("items are distinct per group — duplicates inside or across rows don't inflate") {
    val got = run(Seq(("a", Seq(1L, 1L, 2L)), ("a", Seq(2L)), ("b", Seq(2L))))
    assert(got(("a", "b")) == (("a", "b", 1L, 2L, 1L, 500000L)))
  }

  test("pairs are oriented a < b and every overlapping pair appears once") {
    val got = run(Seq(("c", Seq(1L)), ("a", Seq(1L)), ("b", Seq(1L))))
    assert(got.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
  }
}
