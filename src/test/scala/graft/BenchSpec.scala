package graft

import org.scalatest.funsuite.AnyFunSuite

/** Harness-contract tests that need no SparkSession. */
class BenchSpec extends AnyFunSuite {

  test("SPARK_GRAFT_BENCH_ONLY: unknown names fail fast instead of silently shrinking the sweep") {
    val known = SparkEntry.queries.keys.take(3).toSeq
    // valid lists resolve sorted, tolerate whitespace and empty segments
    assert(Bench.resolveBenchOnly(known.mkString(",")) == known.sorted)
    assert(Bench.resolveBenchOnly(s" ${known.head} ,,") == Seq(known.head))
    // one typo = the whole run is rejected, naming the offender
    val e = intercept[IllegalArgumentException] {
      Bench.resolveBenchOnly(s"${known.head},q19_simhash_paris")
    }
    assert(e.getMessage.contains("q19_simhash_paris"))
  }
}
