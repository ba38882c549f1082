package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SortedNeighborhoodSpec extends SparkTestBase {
  import spark.implicits._

  test("candidate pairs are exactly the rank-window pairs of the sort order") {
    val rng = new scala.util.Random(5)
    val rows = (1L to 300L).map(i => (i, f"k${rng.nextInt(50)}%03d-$i"))
    val got = SortedNeighborhood.candidatePairs(
        rows.toDF("id", "k").repartition(8), "id", "k", Seq("k"), w = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val order = rows.sortBy(r => (r._2, r._1)).map(_._1)
    val want = (for {
      i <- order.indices; j <- (i + 1) to math.min(i + 3, order.size - 1)
    } yield (order(i), order(j))).toSet
    assert(got == want)
  }

  test("planted prefix near-duplicates are found; distance is exact") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again"),
      (2L, "the quick brown fox jumps over the lazy cat again"),
      (3L, "completely different content with nothing shared at all"),
      (4L, "zzz unrelated tail entry")).toDF("doc_id", "text")
    val pairs = SortedNeighborhood.nearDupPairs(docs, "doc_id", "text",
        t => substring(t, 1, 16), w = 2, verifyPrefix = 60, maxDist = 5)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L, 3L)))
  }

  test("degenerate blocking key stays linear: w*n candidates, not n^2") {
    val docs = (1L to 200L).map(i => (i, "same prefix everywhere " + i))
    val n = SortedNeighborhood.candidatePairs(
      docs.toDF("id", "t"), "id", "t", Seq("t"), w = 4).count()
    // last w rows have truncated windows
    assert(n == 4L * 200L - (1L + 2L + 3L + 4L))
  }
}
