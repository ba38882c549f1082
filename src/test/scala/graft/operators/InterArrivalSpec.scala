package graft.operators

import graft.SparkTestBase

class InterArrivalSpec extends SparkTestBase {
  import spark.implicits._

  test("per-type delta stats equal the serial twin") {
    val rng = new scala.util.Random(43)
    val rows = (1L to 600L).map(i =>
      (rng.nextInt(8).toLong, rng.nextInt(100000).toLong, s"t${rng.nextInt(3)}", i))
    val got = InterArrival.stats(
        rows.toDF("u", "ms", "typ", "id"), "u", "ms", "typ", "id")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

    val deltas = rows.groupBy(_._1).values.flatMap { es =>
      val s = es.sortBy(e => (e._2, e._4))
      s.sliding(2).collect { case Seq(a, b) => (b._3, b._2 - a._2, b._4) }
    }.toSeq
    val want = deltas.groupBy(_._1).map { case (t, ds) =>
      val sorted = ds.map(d => (d._2, d._3)).sorted
      t -> ((ds.size.toLong, ds.map(_._2).min, ds.map(_._2).max,
        sorted((sorted.size - 1) / 2)._1))
    }
    assert(got == want)
  }

  test("single-event entities contribute no deltas") {
    val rows = Seq((1L, 100L, "a", 1L), (2L, 200L, "a", 2L), (2L, 260L, "a", 3L))
    val got = InterArrival.stats(
        rows.toDF("u", "ms", "typ", "id"), "u", "ms", "typ", "id")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 1L, 60L, 60L, 60L)))
  }
}
