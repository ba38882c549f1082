package graft.operators

import graft.SparkTestBase

class SnapshotDiffSpec extends SparkTestBase {
  import spark.implicits._

  test("labels added/removed/changed/unchanged; nulls compare null-safely") {
    val old = Seq(
      (1L, Some("a"), Some(10L)), (2L, Some("b"), Some(20L)),
      (3L, None, Some(30L)), (4L, Some("d"), None)
    ).toDF("k", "s", "v")
    val neu = Seq(
      (1L, Some("a"), Some(10L)),  // unchanged
      (2L, Some("B"), Some(20L)),  // changed (value edit)
      (3L, None, Some(30L)),       // unchanged (null == null)
      (5L, Some("e"), Some(50L))   // added; 4 removed
    ).toDF("k", "s", "v")
    val out = SnapshotDiff.diff(old, neu, Seq("k"), Seq("s", "v"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed", 3L -> "unchanged",
      4L -> "removed", 5L -> "added"))
  }

  test("composite keys and a null→value flip counts as changed") {
    val old = Seq((1L, "x", Option.empty[Long]), (1L, "y", Some(2L))).toDF("k1", "k2", "v")
    val neu = Seq((1L, "x", Some(9L)), (1L, "y", Some(2L))).toDF("k1", "k2", "v")
    val out = SnapshotDiff.diff(old, neu, Seq("k1", "k2"), Seq("v"))
      .as[(Long, String, String)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out == Map((1L, "x") -> "changed", (1L, "y") -> "unchanged"))
  }

  test("no compare columns → presence-only diff") {
    val out = SnapshotDiff.diff(Seq(Tuple1(1L), Tuple1(2L)).toDF("k"),
        Seq(Tuple1(2L), Tuple1(3L)).toDF("k"), Seq("k"), Seq.empty)
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "removed", 2L -> "unchanged", 3L -> "added"))
  }
}
