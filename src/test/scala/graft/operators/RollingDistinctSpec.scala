package graft.operators

import graft.SparkTestBase

class RollingDistinctSpec extends SparkTestBase {
  import spark.implicits._

  test("trailing distinct equals the serial window recount") {
    val rng = new scala.util.Random(47)
    val rows = (1 to 800).map(_ =>
      (rng.nextInt(30).toLong, 10L + rng.nextInt(40)))
    val k = 7
    val got = RollingDistinct.trailingDistinct(rows.toDF("u", "d"), "u", "d", k)
      .as[(Long, Long)].collect().toMap
    val acts = rows.distinct
    val (lo, hi) = (acts.map(_._2).min, acts.map(_._2).max)
    val want = (lo to hi).map { d =>
      d -> acts.filter(a => a._2 <= d && a._2 > d - k).map(_._1).distinct.size.toLong
    }.filter(_._2 > 0).toMap
    assert(got == want)
  }

  test("an entity active on many days in one window counts once") {
    val rows = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 3L))
    val got = RollingDistinct.trailingDistinct(rows.toDF("u", "d"), "u", "d", 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
  }
}
