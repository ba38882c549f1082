package graft.operators

import graft.SparkTestBase

class AssociationRulesSpec extends SparkTestBase {
  import spark.implicits._

  test("pair supports, confidence and lift equal the serial twin") {
    val rng = new scala.util.Random(13)
    val rows = (1L to 150L).flatMap { tx =>
      val k = 2 + rng.nextInt(4)
      Seq.fill(k)((tx, rng.nextInt(12).toLong))
    }
    val got = AssociationRules.frequentPairs(
        rows.toDF("tx", "item"), "tx", "item", minSupItem = 2L, minSupPair = 2L)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap

    val baskets = rows.distinct.groupBy(_._1).map { case (t, rs) => t -> rs.map(_._2).toSet }
    val itemSup = baskets.values.flatten.groupBy(identity).map { case (i, o) => i -> o.size.toLong }
      .filter(_._2 >= 2L)
    val nTx = baskets.size.toLong
    val pairSup = baskets.values.toSeq.flatMap { b =>
      val kept = b.filter(itemSup.contains).toSeq.sorted
      for (i <- kept.indices; j <- (i + 1) until kept.size) yield (kept(i), kept(j))
    }.groupBy(identity).map { case (p, o) => p -> o.size.toLong }.filter(_._2 >= 2L)

    assert(got.keySet == pairSup.keySet)
    for (((a, b), sup) <- pairSup) {
      val r = got((a, b))
      assert(r._3 == sup && r._4 == itemSup(a) && r._5 == itemSup(b) && r._6 == nTx)
      assert(r._7 == 100L * sup / itemSup(a))
      assert(r._8 == (if (sup * nTx > itemSup(a) * itemSup(b)) 1L else 0L))
    }
  }

  test("duplicate (tx, item) rows count once; infrequent items never form pairs") {
    val rows = Seq(
      (1L, 10L), (1L, 10L), (1L, 20L), (1L, 99L), // 99 appears once overall
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L))
    val got = AssociationRules.frequentPairs(
        rows.toDF("tx", "item"), "tx", "item", minSupItem = 2L, minSupPair = 2L)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq((10L, 20L, 3L, 3L, 3L, 3L, 100L, 0L)))
  }
}
