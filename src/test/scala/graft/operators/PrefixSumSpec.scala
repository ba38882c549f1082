package graft.operators

import scala.util.Random

import graft.SparkTestBase

/** Direct gates for the two-phase running sums (previously covered
  * only through the query oracles that use them): randomized
  * differentials against the trivial sequential definition, keyed and
  * unkeyed, plus the edge shapes the bucketing must survive —
  * single-value domains (zero width), negative values, a domain span
  * far above the bucket count, and weights of zero.
  */
class PrefixSumSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new Random(281L)

  test("valueDomainCumsum (unkeyed): 30 random domains == sequential scan") {
    (1 to 30).foreach { trial =>
      // distinct values with random gaps (clustered and sparse spans)
      val span = Seq(10L, 1000L, 3_000_000L)(rnd.nextInt(3))
      val vals = Seq.fill(1 + rnd.nextInt(40))(rnd.nextLong(span) - span / 3)
        .distinct
      val rows = vals.map(v => (v, rnd.nextLong(50))) // weight may be 0
      val got = PrefixSum.valueDomainCumsum(
          rows.toDF("v", "w"), "v", "w", "cum", "tot", buckets = 16)
        .as[(Long, Long, Long, Long)].collect()
        .map { case (v, w, tot, cum) => (v, w, cum, tot) }.sortBy(_._1)
      // NB output column order is (v, w, tot, cum): totalCol is selected
      // inside the offsets frame, outCol appended last
      val total = rows.map(_._2).sum
      var acc = 0L
      val want = rows.sortBy(_._1).map { case (v, w) =>
        acc += w; (v, w, acc, total)
      }
      assert(got.toSeq == want, s"trial $trial span=$span")
    }
  }

  test("valueDomainCumsum (keyed): 30 random keyed domains == per-key sequential scan") {
    (1 to 30).foreach { trial =>
      val keys = Seq("a", "b", "c", "dd").take(1 + rnd.nextInt(4))
      val rows = keys.flatMap { k =>
        Seq.fill(1 + rnd.nextInt(25))(rnd.nextLong(5000) - 1000).distinct
          .map(v => (k, v, rnd.nextLong(40)))
      }
      val got = PrefixSum.valueDomainCumsum(
          rows.toDF("k", "v", "w"), "v", "w", "cum", "tot",
          buckets = 8, keyCols = Seq("k"))
        .as[(String, Long, Long, Long, Long)].collect()
        .map { case (k, v, w, tot, cum) => (k, v, w, cum, tot) }
        .sortBy(r => (r._1, r._2))
      val want = rows.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
        case (k, group) =>
          val total = group.map(_._3).sum
          var acc = 0L
          group.sortBy(_._2).map { case (_, v, w) =>
            acc += w; (k, v, w, acc, total)
          }
      }
      assert(got.toSeq == want, s"trial $trial keys=$keys")
    }
  }

  test("keyed cumsum with broadcastOffsets=false (unbounded-keys fallback) is result-identical") {
    val rows = Seq("a", "b", "c").flatMap { k =>
      (1 to 20).map(i => (k, i * 7L - 40L, (i % 5).toLong))
    }
    def run(bcast: Boolean) = PrefixSum.valueDomainCumsum(
        rows.toDF("k", "v", "w"), "v", "w", "cum", "tot",
        buckets = 8, keyCols = Seq("k"), broadcastOffsets = bcast)
      .as[(String, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(run(bcast = false) == run(bcast = true))
  }

  test("valueDomainCumsum edges: single distinct value, reserved-name collision rejected") {
    val one = PrefixSum.valueDomainCumsum(
        Seq((7L, 3L)).toDF("v", "w"), "v", "w", "cum", "tot")
      .as[(Long, Long, Long, Long)].collect()
    assert(one.toSeq == Seq((7L, 3L, 3L, 3L))) // zero-width domain
    assertThrows[IllegalArgumentException] {
      PrefixSum.valueDomainCumsum(
        Seq((1L, 1L)).toDF("__bk", "w"), "__bk", "w", "cum", "tot")
    }
    assertThrows[IllegalArgumentException] {
      PrefixSum.valueDomainCumsum(
        Seq((1L, 1L)).toDF("v", "w"), "v", "w", "__off", "tot")
    }
  }

  test("runningSum: 20 random frames == sequential scan over the total order") {
    (1 to 20).foreach { trial =>
      val rows = Seq.tabulate(1 + rnd.nextInt(200))(i =>
        (rnd.nextLong(1000), i.toLong, rnd.nextLong(30) - 5))
      val got = PrefixSum.runningSum(
          rows.toDF("s", "id", "x"), Seq("s", "id"), "x", "cum",
          numPartitions = Some(1 + rnd.nextInt(7)))
        .as[(Long, Long, Long, Long)].collect()
        .sortBy(r => (r._1, r._2))
      var acc = 0L
      val want = rows.sortBy(r => (r._1, r._2)).map { case (s, id, x) =>
        acc += x; (s, id, x, acc)
      }
      assert(got.toSeq == want, s"trial $trial")
    }
  }
}
