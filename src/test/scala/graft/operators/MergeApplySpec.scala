package graft.operators

import graft.SparkTestBase

class MergeApplySpec extends SparkTestBase {
  import spark.implicits._

  private def snap = Seq(
    (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L)
  ).toDF("k", "typ", "vm")

  test("latest change per key wins; I/U upsert, D deletes, untouched rows pass") {
    val changes = Seq(
      (2L, 100L, "U", "b2", 21L),  // update
      (3L, 100L, "D", "x", 0L),    // delete
      (5L, 100L, "I", "e", 50L),   // insert of a new key
      (2L, 90L, "U", "stale", 99L) // superseded by seq=100
    ).toDF("k", "seq", "op", "typ", "vm")
    val out = MergeApply(snap, changes, "k", "seq", "op", Seq("typ", "vm"))
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(
      1L -> (("a", 10L)),   // untouched
      2L -> (("b2", 21L)),  // latest update applied
      4L -> (("d", 40L)),   // untouched
      5L -> (("e", 50L))))  // inserted; 3 deleted
  }

  test("delete then later re-insert of the same key keeps the re-insert") {
    val changes = Seq(
      (1L, 10L, "D", "x", 0L),
      (1L, 20L, "I", "a2", 11L)
    ).toDF("k", "seq", "op", "typ", "vm")
    val out = MergeApply(snap, changes, "k", "seq", "op", Seq("typ", "vm"))
      .filter($"k" === 1L).as[(Long, String, Long)].collect()
    assert(out.toSeq == Seq((1L, "a2", 11L)))
  }

  test("an equal-seq tie resolves deterministically by op order (U > I > D)") {
    val changes = Seq(
      (1L, 10L, "D", "x", 0L),
      (1L, 10L, "U", "win", 7L)
    ).toDF("k", "seq", "op", "typ", "vm")
    val out = MergeApply(snap, changes, "k", "seq", "op", Seq("typ", "vm"))
      .filter($"k" === 1L).as[(Long, String, Long)].collect()
    assert(out.toSeq == Seq((1L, "win", 7L)))
  }

  test("empty changelog is the identity") {
    val changes = Seq.empty[(Long, Long, String, String, Long)]
      .toDF("k", "seq", "op", "typ", "vm")
    val out = MergeApply(snap, changes, "k", "seq", "op", Seq("typ", "vm"))
    assert(out.orderBy("k").as[(Long, String, Long)].collect().toSeq ==
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L)))
  }
}
