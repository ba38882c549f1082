package graft.dedup

import graft.SparkTestBase

class SetSimJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def brute(sets: Seq[(Long, Seq[String])], tNum: Int, tDen: Int) = {
    val m = sets.map { case (id, s) => id -> s.distinct.toSet }.filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- m; (ib, sb) <- m if ia < ib
      shared = (sa & sb).size.toLong
      un = (sa | sb).size.toLong
      if tDen * shared >= tNum * un
    } yield (ia, ib, shared, un)).toSet
  }

  private def run(sets: Seq[(Long, Seq[String])], tNum: Int, tDen: Int) =
    SetSimJoin.jaccardJoin(sets.toDF("id", "set"), "id", "set", tNum, tDen)
      .as[(Long, Long, Long, Long)].collect().toSet

  // deterministic pseudo-random corpus: overlapping windows over a
  // 40-token vocabulary, so pair similarities sweep the whole range
  private val corpus: Seq[(Long, Seq[String])] = {
    val vocab = (0 until 40).map(i => s"w$i")
    (0 until 60).map { i =>
      val start = (i * 7) % 30
      val len = 5 + (i * 13) % 9
      i.toLong -> (start until start + len).map(j => vocab(j % 40))
    }
  }

  test("matches brute force across thresholds") {
    for ((tn, td) <- Seq((1, 2), (6, 10), (8, 10), (1, 1))) {
      assert(run(corpus, tn, td) == brute(corpus, tn, td), s"t=$tn/$td")
    }
  }

  test("threshold is inclusive: jaccard exactly t is kept") {
    // |A∩B|=3, |A∪B|=5 → jaccard = 0.6 exactly
    val sets = Seq(
      1L -> Seq("a", "b", "c", "d"),
      2L -> Seq("a", "b", "c", "e"))
    assert(run(sets, 6, 10) == Set((1L, 2L, 3L, 5L)))
    assert(run(sets, 61, 100).isEmpty)
  }

  test("identical, disjoint, duplicate-element and empty sets") {
    val sets = Seq(
      1L -> Seq("x", "y"), 2L -> Seq("x", "y"),   // identical → jac 1
      3L -> Seq("p", "q"),                         // disjoint from all
      4L -> Seq("x", "x", "y"),                    // duplicates collapse
      5L -> Seq.empty[String])                     // empty never matches
    val out = run(sets, 1, 1)
    assert(out == Set((1L, 2L, 2L, 2L), (1L, 4L, 2L, 2L), (2L, 4L, 2L, 2L)))
  }

  test("deterministic across input partitioning") {
    val a = SetSimJoin.jaccardJoin(corpus.toDF("id", "set").repartition(1), "id", "set", 6, 10)
      .as[(Long, Long, Long, Long)].collect().toSet
    val b = SetSimJoin.jaccardJoin(corpus.toDF("id", "set").repartition(16), "id", "set", 6, 10)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(a == b && a == brute(corpus, 6, 10))
  }

  // ---- containmentJoin ----

  private def bruteCont(sets: Seq[(Long, Seq[String])], tNum: Int, tDen: Int) = {
    val m = sets.map { case (id, s) => id -> s.distinct.toSet }.filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- m; (ib, sb) <- m if ia < ib
      shared = (sa & sb).size.toLong
      if tDen * shared >= tNum * math.min(sa.size, sb.size)
    } yield (ia, ib, shared, sa.size.toLong, sb.size.toLong)).toSet
  }

  private def runCont(sets: Seq[(Long, Seq[String])], tNum: Int, tDen: Int) =
    SetSimJoin.containmentJoin(sets.toDF("id", "set"), "id", "set", tNum, tDen)
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  test("containment matches brute force across thresholds") {
    for ((tn, td) <- Seq((1, 2), (8, 10), (9, 10), (1, 1))) {
      assert(runCont(corpus, tn, td) == bruteCont(corpus, tn, td), s"t=$tn/$td")
    }
  }

  test("containment finds the excerpt pair Jaccard misses") {
    // small ⊂ big: containment 1.0, jaccard 3/20 — jaccardJoin at 0.8
    // must NOT report it, containmentJoin at 0.8 must
    val sets = Seq(
      1L -> (0 until 20).map(i => s"w$i"),
      2L -> Seq("w3", "w4", "w5"))
    assert(run(sets, 8, 10).isEmpty)
    assert(runCont(sets, 8, 10) == Set((1L, 2L, 3L, 20L, 3L)))
  }

  test("containment threshold is inclusive and uses the smaller set") {
    // shared 4, min 5 → containment 0.8 exactly
    val sets = Seq(
      1L -> Seq("a", "b", "c", "d", "e"),
      2L -> Seq("a", "b", "c", "d", "z", "y", "x"))
    assert(runCont(sets, 8, 10) == Set((1L, 2L, 4L, 5L, 7L)))
    assert(runCont(sets, 81, 100).isEmpty)
  }

  test("equal-size sets pair exactly once; empties never match") {
    val sets = Seq(
      1L -> Seq("x", "y"), 2L -> Seq("x", "y"), 3L -> Seq.empty[String])
    assert(runCont(sets, 1, 1) == Set((1L, 2L, 2L, 2L, 2L)))
  }
}
