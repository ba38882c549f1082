package graft.operators

import graft.SparkTestBase

class IncrementalViewSpec extends SparkTestBase {
  import spark.implicits._

  test("maintained view equals a full recompute over base + signed delta") {
    val rng = new scala.util.Random(41)
    val base = (1 to 400).map(_ =>
      (s"k${rng.nextInt(20)}", 1L, rng.nextInt(100).toLong))
    val delta = (1 to 300).map { _ =>
      val k = s"k${rng.nextInt(25)}" // some keys new, some existing
      (k, if (rng.nextInt(3) == 0) -1L else 1L, rng.nextInt(100).toLong)
    }
    val view = IncrementalView.build(
      base.toDF("k", "sign", "v"), Seq("k"), "v", "n", "s")
    val got = IncrementalView.applyDelta(
        view, delta.toDF("k", "sign", "v"), Seq("k"), "n", "s", "sign", "v")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val want = (base ++ delta).groupBy(_._1)
      .map { case (k, rs) =>
        k -> ((rs.map(_._2).sum, rs.map(r => r._2 * r._3).sum))
      }
      .filter(_._2._1 > 0)
    assert(got == want)
  }

  test("retraction to zero count removes the key from the view") {
    val view = IncrementalView.build(
      Seq(("a", 10L), ("a", 20L), ("b", 5L)).toDF("k", "v"),
      Seq("k"), "v", "n", "s")
    val delta = Seq(("a", -1L, 10L), ("a", -1L, 20L)).toDF("k", "sign", "v")
    val got = IncrementalView.applyDelta(view, delta, Seq("k"), "n", "s", "sign", "v")
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("b", 1L, 5L)))
  }

  test("delta-only keys enter the view; untouched keys pass through unchanged") {
    val view = IncrementalView.build(
      Seq(("old", 7L)).toDF("k", "v"), Seq("k"), "v", "n", "s")
    val delta = Seq(("new", 1L, 3L), ("new", 1L, 4L)).toDF("k", "sign", "v")
    val got = IncrementalView.applyDelta(view, delta, Seq("k"), "n", "s", "sign", "v")
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("old", 1L, 7L), ("new", 2L, 7L)))
  }
}
