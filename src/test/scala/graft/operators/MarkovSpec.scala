package graft.operators

import graft.SparkTestBase

class MarkovSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long, String)]) =
    Markov.transitions(rows.toDF("k", "ms", "tie", "et"), "k", "ms", "tie", "et")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap

  test("counts steps per key in (ts, tie) order; sequences never cross keys") {
    val out = run(Seq(
      (1L, 10L, 0L, "a"), (1L, 20L, 0L, "b"), (1L, 30L, 0L, "a"), (1L, 40L, 0L, "b"),
      (2L, 10L, 0L, "a"), (2L, 20L, 0L, "c"),
      (3L, 10L, 0L, "b") // singleton: no transition
    ))
    assert(out(("a", "b")) == ((2L, 0.666667)))
    assert(out(("a", "c")) == ((1L, 0.333333)))
    assert(out(("b", "a")) == ((1L, 1.0)))
    assert(!out.contains(("b", "c")) && out.size == 3)
  }

  test("same-ms steps are ordered by the tiebreak column") {
    val out = run(Seq((1L, 10L, 2L, "b"), (1L, 10L, 1L, "a")))
    assert(out == Map(("a", "b") -> ((1L, 1.0))))
  }

  test("sequenceCounts counts length-3 runs per key, never across keys") {
    val out = Markov.sequenceCounts(Seq(
        (1L, 10L, 0L, "a"), (1L, 20L, 0L, "b"), (1L, 30L, 0L, "c"), (1L, 40L, 0L, "a"),
        (2L, 10L, 0L, "a"), (2L, 20L, 0L, "b") // too short for a trigram
      ).toDF("k", "ms", "tie", "et"), "k", "ms", "tie", "et", n = 3)
      .as[(String, String, String, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> r._4).toMap
    assert(out == Map(("a", "b", "c") -> 1L, ("b", "c", "a") -> 1L))
  }

  test("per-state probabilities sum to ~1") {
    val out = run(Seq(
      (1L, 1L, 0L, "x"), (1L, 2L, 0L, "y"), (1L, 3L, 0L, "x"),
      (1L, 4L, 0L, "z"), (1L, 5L, 0L, "x"), (1L, 6L, 0L, "y")
    ))
    val byFrom = out.groupBy(_._1._1).view.mapValues(_.values.map(_._2).sum)
    byFrom.foreach { case (_, s) => assert(math.abs(s - 1.0) < 1e-5) }
  }
}
