package graft.operators

import graft.SparkTestBase

class IslandsSpec extends SparkTestBase {
  import spark.implicits._

  test("maximal runs are found; duplicates collapse; singletons stand alone") {
    val rows = Seq(
      ("a", 1L), ("a", 2L), ("a", 3L), ("a", 3L), // dup inside a run
      ("a", 7L),
      ("b", 10L), ("b", 12L), ("b", 13L))
    val got = Islands.detect(rows.toDF("g", "d"), "g", "d")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("a", 1L, 3L, 3L), ("a", 7L, 7L, 1L),
      ("b", 10L, 10L, 1L), ("b", 12L, 13L, 2L)))
  }

  test("islands equal the serial twin on random sparse sequences") {
    val rng = new scala.util.Random(31)
    val rows = for {
      g <- 1 to 6; _ <- 1 to 60
    } yield (s"g$g", rng.nextInt(100).toLong)
    val got = Islands.detect(rows.toDF("g", "d"), "g", "d")
      .as[(String, Long, Long, Long)].collect().toSet
    val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
      val ds = rs.map(_._2).distinct.sorted
      val runs = ds.foldLeft(List.empty[(Long, Long)]) {
        case ((s, e) :: tail, d) if d == e + 1 => (s, d) :: tail
        case (acc, d) => (d, d) :: acc
      }
      runs.map { case (s, e) => (g, s, e, e - s + 1) }
    }.toSet
    assert(got == want)
  }
}
