package graft.text

import graft.SparkTestBase

class CollocationsSpec extends SparkTestBase {
  import spark.implicits._

  test("pmi lift matches the serial recount on a planted corpus") {
    // "big data" always adjacent (high PMI); "the the" frequent but
    // independent (low PMI)
    val docs = Seq(
      "big data big data big data",
      "the cat the dog the fish big data",
      "the the the big data")
      .toDF("text")
    val toks = docs.as[String].collect().map(_.trim.split("\\s+").toSeq)
    val uni = toks.flatten
    val bi = toks.flatMap(t => t.sliding(2).filter(_.size == 2).map(w => (w(0), w(1))))
    def lift(w1: String, w2: String): Long = {
      val cab = BigInt(bi.count(_ == (w1, w2)))
      val nu = BigInt(uni.size)
      (cab * nu * nu * 1000000 /
        (BigInt(bi.size) * uni.count(_ == w1) * uni.count(_ == w2))).toLong
    }
    val got = Collocations.pmiBigrams(docs, "text", minCount = 2L, k = 10)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (w1, w2, cab, ca, cb, ppm) =>
      assert(cab >= 2L)
      assert(ca == uni.count(_ == w1).toLong && cb == uni.count(_ == w2).toLong)
      assert(ppm == lift(w1, w2), s"($w1,$w2)")
    }
    // ordering: lift desc with (w1, w2) tiebreak
    val key = got.map { case (w1, w2, _, _, _, ppm) => (-ppm, w1, w2) }
    assert(key.sortBy(identity).toSeq == key.toSeq)
    // the planted collocation outranks the independent pair
    val byPair = got.map(g => (g._1, g._2) -> g._6).toMap
    assert(byPair(("big", "data")) > byPair.getOrElse(("the", "the"), 0L))
  }

  test("single-token and empty docs contribute no bigrams") {
    val docs = Seq("solo", "a b a b a b a b a b").toDF("text")
    val got = Collocations.pmiBigrams(docs, "text", minCount = 1L, k = 10)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(got.forall(g => g._1 != "solo" && g._2 != "solo"))
    assert(got.map(g => (g._1, g._2)).toSet == Set(("a", "b"), ("b", "a")))
  }
}
