package graft.operators

import graft.SparkTestBase

class ClusteringCoefficientSpec extends SparkTestBase {
  import spark.implicits._

  test("K4: every node has coefficient 1 (num == den)") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val got = Triangles.clusteringCoefficient(k4.toDF("s", "d"), "s", "d")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == (1L to 4L).map(v => (v, 3L, 3L, 6L, 6L)).toSet)
  }

  test("path graph: zero triangles everywhere, leaves have den 0") {
    val got = Triangles.clusteringCoefficient(
        Seq((1L, 2L), (2L, 3L)).toDF("s", "d"), "s", "d")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 0L, 0L, 0L), (2L, 2L, 0L, 0L, 2L),
      (3L, 1L, 0L, 0L, 0L)))
  }

  test("per-node counts equal the serial twin on a random hub graph") {
    val rng = new scala.util.Random(7)
    val edges = (1L to 40L).map(v => (0L, v)) ++
      (1 to 200).map(_ => (rng.nextInt(40).toLong + 1, rng.nextInt(40).toLong + 1))
    val canon = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val eset = canon.toSet
    val nodes = canon.flatMap(e => Seq(e._1, e._2)).distinct
    val adj = canon.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    val wantTri = nodes.map { v =>
      val nb = adj(v).toSeq.sorted
      v -> (for {
        i <- nb.indices; j <- (i + 1) until nb.size
        if eset((math.min(nb(i), nb(j)), math.max(nb(i), nb(j))))
      } yield 1).size.toLong
    }.toMap
    val got = Triangles.clusteringCoefficient(edges.toDF("s", "d"), "s", "d")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.length == nodes.size)
    got.foreach { case (v, deg, tri, num, den) =>
      assert(deg == adj(v).size.toLong && tri == wantTri(v) &&
        num == 2 * tri && den == deg * (deg - 1), s"node $v")
    }
  }

  test("count() still matches after the shared-core refactor") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val got = Triangles.count(k4.toDF("s", "d"), "s", "d")
      .as[(Long, Long, Long)].head()
    assert(got == ((4L, 6L, 4L)))
  }
}
