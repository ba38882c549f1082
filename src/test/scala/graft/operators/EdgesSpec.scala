package graft.operators

import graft.SparkTestBase

class EdgesSpec extends SparkTestBase {
  import spark.implicits._

  // order 1: {10, 20, 30} (+ duplicate 20 line), order 2: {20, 30},
  // order 3: {40} (no pairs), order 4: {50, 50} (self only — no pair)
  private val rows = Seq(
    (1L, 10L), (1L, 20L), (1L, 20L), (1L, 30L),
    (2L, 20L), (2L, 30L),
    (3L, 40L),
    (4L, 50L), (4L, 50L)).toDF("k", "v")

  test("coOccurrence equals the distinct self-join form, duplicates collapsed") {
    val got = Edges.coOccurrence(rows, "k", "v")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 20L), (10L, 30L), (20L, 30L)))
  }

  test("coOccurrenceCounts counts co-occurring GROUPS, not line pairs") {
    val got = Edges.coOccurrenceCounts(rows, "k", "v")
      .as[(Long, Long, Long)].collect().toSet
    // (20,30) co-occurs in orders 1 and 2; the duplicate 20 line in
    // order 1 must not inflate any count
    assert(got == Set((10L, 20L, 1L), (10L, 30L, 1L), (20L, 30L, 2L)))
  }

  test("single-member and empty groups emit nothing (no sequence underflow)") {
    val df = Seq((1L, 7L)).toDF("k", "v")
    assert(Edges.coOccurrence(df, "k", "v").count() == 0L)
  }

  test("linePairs preserves multiplicity like the self-join it replaces") {
    val got = Edges.linePairs(rows, "k", "v")
      .groupBy("a", "b").count()
      .as[(Long, Long, Long)].collect().toSet
    // order 1's duplicate 20 line doubles its pairs; (20,30) adds one
    // more from order 2; order 4's equal-value lines pair with nothing
    assert(got == Set((10L, 20L, 2L), (10L, 30L, 1L), (20L, 30L, 3L)))
  }

  test("weightedPairs is multiset-identical to the weighted self-join") {
    val w = Seq(
      (1L, 10L, 5L), (1L, 20L, 7L), (1L, 20L, 2L), (1L, 30L, 1L),
      (2L, 20L, 4L), (2L, 30L, 6L),
      (4L, 50L, 9L), (4L, 50L, 3L)).toDF("k", "v", "q")
    val got = Edges.weightedPairs(w, "k", "v", "q")
      .as[(Long, Long, Long)].collect().toList.sorted
    val want = w.as("x").join(w.as("y"),
        $"x.k" === $"y.k" && $"x.v" < $"y.v")
      .select($"x.v", $"y.v", ($"x.q" + $"y.q"))
      .as[(Long, Long, Long)].collect().toList.sorted
    assert(got == want && got.nonEmpty)
    // the duplicate 20 lines yield two (10,20) pairs with distinct sums
    assert(got.count(p => p._1 == 10L && p._2 == 20L) == 2)
  }

  test("maxGroupSize guard: a hot group fails loudly with its key; under the cap results are unchanged") {
    // one synthetic hot group (9 members) among normal ones
    val hot = (1 to 9).map(v => (99L, v.toLong)) ++ Seq((1L, 10L), (1L, 20L))
    val df = hot.toDF("k", "v")
    val e = intercept[Exception] {
      Edges.coOccurrence(df, "k", "v", maxGroupSize = Some(8)).count()
    }
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(e).exists(c =>
        Option(c.getMessage).exists(m =>
          m.contains("maxGroupSize=8") && m.contains("group 99"))),
      s"expected the offending key in the failure, got $e")
    // a cap that admits every group is a no-op on results
    assert(Edges.coOccurrence(df, "k", "v", maxGroupSize = Some(9))
      .as[(Long, Long)].collect().toSet ==
      Edges.coOccurrence(df, "k", "v").as[(Long, Long)].collect().toSet)
    // linePairs/weightedPairs carry the same guard
    assertThrows[Exception] {
      Edges.linePairs(df, "k", "v", maxGroupSize = Some(8)).count()
    }
    val w = hot.map { case (k, v) => (k, v, 1L) }.toDF("k", "v", "q")
    assertThrows[Exception] {
      Edges.weightedPairs(w, "k", "v", "q", maxGroupSize = Some(8)).count()
    }
  }

  test("production cap end-to-end: a planted corrupt hot order fails the q166 pipeline with its key") {
    // the graph queries pass Edges.orderGroupCap in production — prove
    // the promise holds END-TO-END through the query registry, not just
    // at the operator: a 10_001-part order (corruption; TPC-H orders
    // cap at 7 lines) must fail the job with the offending key BEFORE
    // C(10001,2) pairs explode inside one task
    val tmp = java.nio.file.Files.createTempDirectory("graft-hotgroup").toString
    val sane = (1L to 50L).flatMap(o => (1 to 3).map(i => (o, o * 7 + i)))
    val corrupt = (1L to 10001L).map(p => (777L, p))
    (sane ++ corrupt).toDF("l_orderkey", "l_partkey")
      .write.parquet(s"$tmp/lineitem.parquet")
    val e = intercept[Exception] {
      graft.SparkEntry.queries("q166_label_communities")(spark, tmp).collect()
    }
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(e).exists(c => Option(c.getMessage).exists(m =>
        m.contains("maxGroupSize=10000") && m.contains("group 777"))),
      s"expected the planted key in the failure, got $e")
  }

  test("randomized differential: equals the brute-force self-join semantics") {
    val rnd = new scala.util.Random(20260814L)
    for (_ <- 1 to 10) {
      val rows = List.fill(1 + rnd.nextInt(80))(
        (rnd.nextInt(8).toLong, rnd.nextInt(12).toLong))
      val df = rows.toDF("k", "v")
      val gotPairs = Edges.coOccurrence(df, "k", "v")
        .as[(Long, Long)].collect().toSet
      val gotCounts = Edges.coOccurrenceCounts(df, "k", "v")
        .as[(Long, Long, Long)].collect().toSet
      val byGroup = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      val wantCounts = byGroup.values.toList
        .flatMap(vs => for (a <- vs; b <- vs if a < b) yield (a, b))
        .groupBy(identity).map { case (p, xs) => (p._1, p._2, xs.length.toLong) }
        .toSet
      assert(gotPairs == wantCounts.map(t => (t._1, t._2)))
      assert(gotCounts == wantCounts)
    }
  }
}
