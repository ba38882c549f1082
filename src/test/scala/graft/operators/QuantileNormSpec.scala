package graft.operators

import graft.SparkTestBase

class QuantileNormSpec extends SparkTestBase {
  import spark.implicits._

  test("normalized values match the serial rank-mapping twin") {
    val rng = new scala.util.Random(133L)
    val rows = (1L to 400L).map(i =>
      ("g" + rng.nextInt(4), rng.nextInt(1000).toLong - 500L, i))
    val df = rows.toDF("grp", "v", "tie")
    val got = QuantileNorm.normalize(df, "grp", "v", "tie")
      .select($"grp", $"v", $"tie", $"norm")
      .as[(String, Long, Long, Long)].collect().toSet

    val globalSorted = rows.map(r => (r._2, r._3)).sortBy(identity).map(_._1)
    val n = globalSorted.size.toLong
    val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._3))
      val cnt = sorted.size.toLong
      sorted.zipWithIndex.map { case ((_, v, tie), i) =>
        val idx = if (cnt == 1) (n + 1) / 2
          else i.toLong * (n - 1) / (cnt - 1) + 1
        (g, v, tie, globalSorted((idx - 1).toInt))
      }
    }.toSet
    assert(got == want)
  }

  test("group extremes map to global extremes; singleton group to the lower median") {
    val df = Seq(("a", 10L, 1L), ("a", 50L, 2L), ("a", 90L, 3L),
      ("b", 40L, 4L), ("b", 41L, 5L), ("s", 7L, 6L)).toDF("grp", "v", "tie")
    val got = QuantileNorm.normalize(df, "grp", "v", "tie")
      .select($"grp", $"tie", $"norm").as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // global sorted: 7,10,40,41,50,90 (N=6)
    assert(got(("a", 1L)) == 7L)   // group min → global min
    assert(got(("a", 3L)) == 90L)  // group max → global max
    assert(got(("a", 2L)) == 40L)  // mid: (2-1)*(5) div 2 + 1 = 3 → 40
    assert(got(("s", 6L)) == 40L)  // singleton → (6+1) div 2 = 3 → 40
  }
}
