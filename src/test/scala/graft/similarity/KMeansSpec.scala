package graft.similarity

import graft.SparkTestBase

class KMeansSpec extends SparkTestBase {
  import spark.implicits._

  /** Serial twin of the exact-integer Lloyd iteration. */
  private def serial(vecs: Seq[(Long, Seq[Double])], k: Int, iters: Int): Map[Long, Long] = {
    val iv = vecs.map { case (id, v) =>
      id -> v.map(x => math.floor(x * 1e7).toLong)
    }.sortBy(_._1)
    var cents: Map[Long, Seq[Long]] = iv.take(k).map { case (id, v) => id -> v }.toMap
    def assign(): Map[Long, Long] = iv.map { case (id, v) =>
      id -> cents.toSeq.map { case (c, cv) =>
        (v.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum, c)
      }.min._2
    }.toMap
    var a = assign()
    for (_ <- 1 until iters) {
      val groups = iv.groupBy { case (id, _) => a(id) }
      cents = cents.map { case (c, old) =>
        groups.get(c) match {
          case Some(ms) => c -> old.indices.map { i =>
            Math.floorDiv(ms.map(_._2(i)).sum, ms.size)
          }
          case None => c -> old
        }
      }
      a = assign()
    }
    a
  }

  private def run(vecs: Seq[(Long, Seq[Double])], k: Int, iters: Int): Map[Long, Long] =
    KMeans.assign(vecs.map { case (id, v) => (id, v.map(_.toFloat)) }.toDF("id", "vec"),
        "id", "vec", k, iters)
      .as[(Long, Long)].collect().toMap

  // three planted blobs around (0,0), (5,5), (-5,5), with jitter
  private val blobs: Seq[(Long, Seq[Double])] =
    (0L until 30L).map { i =>
      val (cx, cy) = (i % 3) match {
        case 0 => (0.0, 0.0); case 1 => (5.0, 5.0); case _ => (-5.0, 5.0)
      }
      i -> Seq(cx + (i % 7) * 0.01, cy - (i % 5) * 0.01, (i % 11) * 0.001, 0.5)
    }

  test("matches the serial integer-exact reference across k and iterations") {
    for ((k, it) <- Seq((2, 1), (3, 2), (3, 4), (5, 3))) {
      assert(run(blobs, k, it) == serial(blobs, k, it), s"k=$k it=$it")
    }
  }

  test("planted blobs separate after convergence") {
    val a = run(blobs, 3, 5)
    val byBlob = (0L until 30L).groupBy(_ % 3).view.mapValues(_.map(a).toSet)
    // each planted blob lands wholly in one cluster, all distinct
    assert(byBlob.values.forall(_.size == 1))
    assert(byBlob.values.flatten.toSet.size == 3)
  }

  test("duplicate init vectors empty a cluster; it keeps its centroid (no crash)") {
    val dup = Seq(
      0L -> Seq(0.0, 0.0), 1L -> Seq(0.0, 0.0), // identical inits: ties → cluster 0
      2L -> Seq(9.0, 9.0), 3L -> Seq(9.1, 9.0), 4L -> Seq(0.1, 0.0))
    // cluster 1 empties in round 1 (ties go to 0), keeps its (0,0)
    // centroid, and legitimately re-acquires the origin points once
    // cluster 0's centroid drifts — the serial twin pins all of it
    for (it <- 1 to 4) {
      assert(run(dup, 3, it) == serial(dup, 3, it), s"it=$it")
    }
  }
}
