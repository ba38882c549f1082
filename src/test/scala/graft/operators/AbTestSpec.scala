package graft.operators

import graft.SparkTestBase

class AbTestSpec extends SparkTestBase {
  import spark.implicits._

  private def gate(rows: Seq[(String, Boolean, Long)]) =
    AbTest.welchGate(rows.toDF("g", "b", "v"), "g", "b", "v")
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap

  test("stats match the serial integer recount") {
    val rng = new scala.util.Random(134L)
    val rows = (1 to 1000).map(i =>
      ("m" + i % 3, i % 2 == 1, rng.nextInt(500).toLong + 1L))
    val got = gate(rows)
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val (as, bs) = rs.partition(!_._2)
      def stats(xs: Seq[Long]) = {
        val n = xs.size.toLong; val s = xs.sum; val ss = xs.map(x => x * x).sum
        val mean = s / n
        val v = ((BigInt(n) * ss - BigInt(s) * s) / (BigInt(n) * n)).toLong
        (n, mean, v)
      }
      val (na, ma, va) = stats(as.map(_._3))
      val (nb, mb, vb) = stats(bs.map(_._3))
      val diff = mb - ma
      val sig = if (diff * diff > 4L * (va / na + vb / nb)) 1L else 0L
      assert(got(g) == (g, na, nb, ma, mb, va, vb, diff, sig), g)
    }
  }

  test("a planted large shift flags significant; identical arms do not") {
    // milli-scaled values: the integer gate truncates var/n to 0 at
    // unit scale (same reason q134 integerizes at ×1000)
    val shifted = (1 to 200).map(i => ("s", i % 2 == 1,
      (if (i % 2 == 1) 1000000L else 100000L) + (i % 7) * 1000L))
    val flat = (1 to 200).map(i => ("f", i % 2 == 1, 50000L + (i % 7) * 1000L))
    val got = gate(shifted ++ flat)
    assert(got("s")._9 == 1L && got("f")._9 == 0L)
  }

  test("an empty arm yields null means and an insignificant flag") {
    val rows = Seq(("g", false, 10L), ("g", false, 20L))
    val got = AbTest.welchGate(rows.toDF("g", "b", "v"), "g", "b", "v")
      .select("n_b", "mean_b", "significant")
      .collect().head
    assert(got.getLong(0) == 0L && got.isNullAt(1) && got.getLong(2) == 0L)
  }
}
