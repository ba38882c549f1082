package graft.operators

import graft.SparkTestBase

class EquiDepthSpec extends SparkTestBase {
  import spark.implicits._

  private def run(vals: Seq[(Long, Long)], k: Int, parts: Int) =
    EquiDepth.bins(vals.toDF("id", "v"), "v", "id", k, numPartitions = parts)
      .as[(Long, Long, Long, Int)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap // id -> (rank, bin)

  private def serial(vals: Seq[(Long, Long)], k: Int) = {
    val n = vals.size
    vals.sortBy(t => (t._2, t._1)).zipWithIndex.map { case ((id, _), i) =>
      id -> (((i + 1).toLong, (i.toLong * k / n).toInt))
    }.toMap
  }

  // skewed values: constant runs, negatives, a huge outlier
  private val data: Seq[(Long, Long)] =
    (0L until 97L).map(i => i -> (i % 7) * (if (i % 13 == 0) -3L else 2L)) :+ (97L -> 1000000L)

  test("ranks and bins match the serial reference at several partitionings") {
    for (p <- Seq(1, 3, 16)) {
      assert(run(data, 10, p) == serial(data, 10), s"parts=$p")
    }
  }

  test("bin populations differ by at most one") {
    val sizes = run(data, 7, 5).values.groupBy(_._2).view.mapValues(_.size).values.toSeq
    assert(sizes.max - sizes.min <= 1)
    assert(sizes.sum == data.size)
  }

  test("k=1 puts everything in bin 0; k>n gives singleton bins") {
    assert(run(data, 1, 4).values.map(_._2).toSet == Set(0))
    val tiny = Seq((1L, 5L), (2L, 3L), (3L, 9L))
    val out = run(tiny, 30, 2)
    assert(out.values.map(_._2).toSet.size == 3)
  }

  test("ties order by the tiebreak column") {
    val tied = Seq((10L, 5L), (20L, 5L), (30L, 5L))
    val out = run(tied, 3, 2)
    assert(out == Map(10L -> ((1L, 0)), 20L -> ((2L, 1)), 30L -> ((3L, 2))))
  }
}
