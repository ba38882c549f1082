package graft.operators

import graft.SparkTestBase

class TrianglesSpec extends SparkTestBase {
  import spark.implicits._

  private def tri(edges: Seq[(Long, Long)]): (Long, Long, Long) =
    Triangles.count(edges.toDF("s", "d"), "s", "d")
      .as[(Long, Long, Long)].head()

  test("known graphs: K3, K4, square with diagonal, triangle-free path") {
    assert(tri(Seq((1L, 2L), (2L, 3L), (1L, 3L))) == ((3L, 3L, 1L)))
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(tri(k4) == ((4L, 6L, 4L)))
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))) == ((4L, 5L, 2L)))
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 4L))) == ((4L, 3L, 0L)))
  }

  test("duplicates, reversed direction and self-loops don't change the count") {
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L), (1L, 3L))
    assert(tri(messy) == ((3L, 3L, 1L)))
  }

  test("matches the serial brute force on a pseudo-random graph incl. a hub node") {
    val rng = new scala.util.Random(7)
    // hub 0 connects to everything — exercises the orientation's skew cap
    val edges = (1L to 40L).map(v => (0L, v)) ++
      (1 to 200).map(_ => (rng.nextInt(40).toLong + 1, rng.nextInt(40).toLong + 1))
    val canon = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val adj = canon.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    // yield the triple, not a constant: the inner generator is a Set and
    // a `yield 1` would collapse every edge's matches to a single element
    val want = (for {
      (a, b) <- canon
      c <- adj(a).intersect(adj(b)).toSeq if c > b
    } yield (a, b, c)).size.toLong
    val got = tri(edges)
    info(s"got=$got want=$want canon=${canon.size}")
    assert(got._3 == want && got._2 == canon.size.toLong)
  }
}
