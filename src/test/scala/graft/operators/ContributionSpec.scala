package graft.operators

import graft.SparkTestBase

class ContributionSpec extends SparkTestBase {
  import spark.implicits._

  test("segment deltas and ppm shares equal the serial twin; shares sum ~1e6") {
    val rng = new scala.util.Random(61)
    val rows = (1 to 500).map(_ =>
      (s"seg${rng.nextInt(6)}", rng.nextInt(100).toLong, rng.nextBoolean()))
    val got = Contribution.deltaShares(rows.toDF("s", "v", "b"), "s", "v", "b")
      .as[(String, Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    val want = rows.groupBy(_._1).map { case (s, rs) =>
      val a = rs.filterNot(_._3).map(_._2).sum
      val b = rs.filter(_._3).map(_._2).sum
      s -> ((a, b, b - a))
    }
    val tot = want.values.map(_._3).sum
    for ((s, (a, b, d)) <- want) {
      val r = got(s)
      assert((r._2, r._3, r._4) == ((a, b, d)))
      assert(r._5.contains(d * 1000000L / tot))
    }
    // truncation means shares sum to 1e6 within one ulp per segment
    val shareSum = got.values.flatMap(_._5).sum
    assert(math.abs(shareSum - 1000000L) <= got.size)
  }

  test("negative deltas and negative totals truncate toward zero (sign-explicit)") {
    // tot = (2 - 10) + (5 - 0) = -3; shares must be trunc(delta*1e6/tot)
    val rows = Seq(("down", 10L, false), ("down", 2L, true),
      ("up", 0L, false), ("up", 5L, true))
    val got = Contribution.deltaShares(rows.toDF("s", "v", "b"), "s", "v", "b")
      .as[(String, Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r._5.get).toMap
    // delta(down) = -8, tot = -3: trunc(-8e6 / -3) = 2666666 (floor would agree)
    assert(got("down") == -8L * 1000000L / -3L)
    // delta(up) = 5, tot = -3: trunc(5e6 / -3) = -1666666; FLOOR would
    // give -1666667 — this is the case where engines with floored
    // integer division silently diverge from the truncating form.
    assert(got("up") == 5L * 1000000L / -3L)
    assert(got("up") == -1666666L)
  }

  test("zero total delta yields null shares, not a division error") {
    val rows = Seq(("x", 10L, false), ("x", 10L, true),
      ("y", 5L, false), ("y", 5L, true))
    val got = Contribution.deltaShares(rows.toDF("s", "v", "b"), "s", "v", "b")
      .select("share_ppm").as[Option[Long]].collect()
    assert(got.forall(_.isEmpty))
  }
}
