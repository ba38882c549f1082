package graft.similarity

import graft.SparkTestBase

class VectorAggSpec extends SparkTestBase {
  import spark.implicits._

  private val vecs = Seq(
    ("a", Array(1.0f, 0.0f)), ("a", Array(1.0f, 0.0f)),
    ("b", Array(0.0f, 1.0f)), ("b", Array(1.0f, 0.0f))
  ).toDF("label", "embedding")

  test("centroids are exact integer numerators in component order") {
    val got = VectorAgg.centroids(vecs, "label", "embedding")
      .orderBy($"label").as[(String, Long, Seq[Long])].collect().toSeq
    assert(got == Seq(
      ("a", 2L, Seq(20000000L, 0L)),
      ("b", 2L, Seq(10000000L, 10000000L))))
  }

  test("cohesion: identical vectors ~1, mixed labels lower") {
    val got = VectorAgg.intraCosine(vecs, "label", "embedding")
      .orderBy($"label").as[(String, Long, Double)].collect().toSeq
    assert(got.map(_._1) == Seq("a", "b"))
    assert(got(0)._3 > 0.999999 - 1e-9) // floor-scaled 1.0 -> 0.999999+
    // label b: each unit axis vector vs the diagonal centroid: cos = 1/sqrt(2)
    assert(math.abs(got(1)._3 - math.floor(1e6 / math.sqrt(2)) / 1e6) < 1e-9)
  }

  test("zero vectors contribute cos 0, not NaN") {
    val z = Seq(("z", Array(0.0f, 0.0f)), ("z", Array(3.0f, 4.0f)))
      .toDF("label", "embedding")
    val got = VectorAgg.intraCosine(z, "label", "embedding")
      .as[(String, Long, Double)].collect().head
    assert(!got._3.isNaN && math.abs(got._3 - 0.5) < 2e-6)
  }
}
