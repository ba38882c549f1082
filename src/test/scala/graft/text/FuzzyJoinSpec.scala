package graft.text

import graft.SparkTestBase

class FuzzyJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("finds exactly the substitution/insert/delete/equal pairs, never distance ≥ 2") {
    val rows = Seq(
      (1L, "cat"), (2L, "cut"),   // substitution
      (3L, "cart"),               // insert vs cat
      (4L, "ca"),                 // delete vs cat
      (5L, "dog"),                // far from everything
      (6L, "cat"),                // exact duplicate of 1
      (7L, "")                    // empty: distance 1 to nothing here but "a"?
    ).toDF("id", "s")
    val got = FuzzyJoin.editDistance1Pairs(rows, "id", "s")
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val strs = Map(1L -> "cat", 2L -> "cut", 3L -> "cart", 4L -> "ca",
      5L -> "dog", 6L -> "cat", 7L -> "")
    val want = (for {
      a <- strs.keys; b <- strs.keys if a < b
      d = lev(strs(a), strs(b)) if d <= 1
    } yield (a, b) -> d).toMap
    assert(got == want)
    assert(got((1L, 6L)) == 0)   // equal strings under distinct ids
    assert(!got.contains((1L, 5L)))
  }

  test("two-sided join finds every cross-side ed≤1 pair, never more") {
    val qs = Seq("spak", "cta", "zzz", "beta").toDF("q")
    val vocab = Seq("spark", "cat", "beta", "betas", "delta").toDF("v")
    val got = FuzzyJoin.editDistance1Join(qs, "q", vocab, "v")
      .as[(String, String, Int)].collect().toSet
    val want = (for {
      q <- Seq("spak", "cta", "zzz", "beta"); v <- Seq("spark", "cat", "beta", "betas", "delta")
      d = lev(q, v) if d <= 1
    } yield (q, v, d)).toSet
    assert(got == want && want.contains(("spak", "spark", 1))
      && want.contains(("beta", "beta", 0)))
    assert(!got.exists(_._1 == "zzz"))
  }

  test("brute-force equivalence on a generated corpus") {
    val base = Seq("alpha", "alphb", "alph", "alphaa", "beta", "betaa",
      "gamma", "gamm", "gama", "delta")
    val rows = base.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val got = FuzzyJoin.editDistance1Pairs(rows, "id", "s")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val want = (for {
      i <- base.indices; j <- base.indices if i < j
      if lev(base(i), base(j)) <= 1
    } yield (i.toLong, j.toLong)).toSet
    assert(got == want && want.nonEmpty)
  }
}
