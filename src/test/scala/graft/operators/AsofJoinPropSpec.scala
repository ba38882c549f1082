package graft.operators

import java.sql.Timestamp

import scala.util.Random

import graft.SparkTestBase

/** Randomized differential check: the union+window asof join equals the
  * brute-force definition (max right time ≤ left time per key) on seeded
  * random inputs — duplicate left timestamps, keys missing from either
  * side, and boundary ties included.
  */
class AsofJoinPropSpec extends SparkTestBase {
  import spark.implicits._

  test("asofJoin equals the brute-force most-recent-match on random inputs") {
    val rnd = new Random(20260812L)
    for (round <- 1 to 20) {
      val lrows = List.fill(1 + rnd.nextInt(40))(
        (s"k${rnd.nextInt(3)}", rnd.nextInt(50).toLong))
      // right side unique per (key, time) — the operator's documented contract
      val rrows = List.fill(rnd.nextInt(40))(
        (s"k${1 + rnd.nextInt(3)}", rnd.nextInt(50).toLong, 1L + rnd.nextInt(999)))
        .groupBy(r => (r._1, r._2)).map(_._2.head).toList
      val left = lrows.map { case (k, t) => (k, new Timestamp(t)) }.toDF("k", "t")
      val right = rrows.map { case (k, t, v) => (k, new Timestamp(t), v) }.toDF("k", "rt", "v")
      val got = AsofJoin.asofJoin(left, right, Seq("k"), "t", "rt")
        .collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime,
          Option(r.get(2)).map(_.asInstanceOf[Long])))
        .groupBy(identity[(String, Long, Option[Long])]).view.mapValues(_.length).toMap
      val expect = lrows.map { case (k, t) =>
        val m = rrows.filter(r => r._1 == k && r._2 <= t)
        (k, t, if (m.isEmpty) None else Some(m.maxBy(_._2)._3))
      }.groupBy(identity[(String, Long, Option[Long])]).view.mapValues(_.length).toMap
      assert(got == expect, s"round $round: left=$lrows right=$rrows")
    }
  }
}
