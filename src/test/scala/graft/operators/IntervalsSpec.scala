package graft.operators

import graft.SparkTestBase

class IntervalsSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long, Long)]) =
    Intervals.merge(rows.toDF("k", "tie", "s", "e"), "k", "s", "e", "tie")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3, r._4)).sortBy(_._1).toSeq)
      .toMap

  test("overlap and touch merge; gaps split; long spans absorb later short ones") {
    val out = run(Seq(
      // k1: [0,10) + [5,15) overlap; [15,20) touches; [25,30) gapped
      (1L, 0L, 0L, 10L), (1L, 1L, 5L, 15L), (1L, 2L, 15L, 20L), (1L, 3L, 25L, 30L),
      // k2: early giant span swallows everything that follows
      (2L, 0L, 0L, 100L), (2L, 1L, 10L, 20L), (2L, 2L, 50L, 60L), (2L, 3L, 99L, 150L)
    ))
    assert(out(1L) == Seq((0L, 20L, 3L), (25L, 30L, 1L)))
    assert(out(2L) == Seq((0L, 150L, 4L)))
  }

  test("identical starts order by the tiebreak; singleton keys pass through") {
    val out = run(Seq(
      (1L, 2L, 0L, 3L), (1L, 1L, 0L, 8L), (1L, 3L, 8L, 9L),
      (9L, 0L, 42L, 43L)
    ))
    assert(out(1L) == Seq((0L, 9L, 3L)))
    assert(out(9L) == Seq((42L, 43L, 1L)))
  }
}
