package graft.operators

import graft.SparkTestBase

class SequenceGapsSpec extends SparkTestBase {
  import spark.implicits._

  private def run(ids: Seq[Long]): Seq[(Long, Long, Long)] =
    SequenceGaps.gaps(ids.toDF("id"), "id")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq

  test("maximal missing runs between present ids, duplicates collapsed") {
    assert(run(Seq(1L, 2L, 2L, 5L, 6L, 10L)) ==
      Seq((3L, 4L, 2L), (7L, 9L, 3L)))
  }

  test("contiguous sequence has no gaps; single id has no gaps") {
    assert(run(Seq(4L, 5L, 6L)).isEmpty)
    assert(run(Seq(42L)).isEmpty)
  }

  test("random sparse set matches the serial scan") {
    val rng = new scala.util.Random(136L)
    val ids = (1 to 500).map(_ => rng.nextInt(2000).toLong).distinct.sorted
    val want = ids.sliding(2).collect {
      case Seq(a, b) if b > a + 1 => (a + 1, b - 1, b - a - 1)
    }.toSeq
    assert(run(ids) == want)
  }
}
