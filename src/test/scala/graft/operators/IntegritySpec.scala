package graft.operators

import graft.SparkTestBase

class IntegritySpec extends SparkTestBase {
  import spark.implicits._

  test("orphans counted per relationship; null FKs pass; duplicate parents don't multiply") {
    val child = Seq((1L, Some(10L)), (2L, Some(10L)), (3L, Some(99L)),
      (4L, None), (5L, Some(98L)), (6L, Some(99L))).toDF("id", "fk")
    val parent = Seq(10L, 10L, 11L).toDF("pk")
    val got = Integrity.audit(Seq(
        Integrity.RefRule("child->parent", child, "fk", parent, "pk")))
      .as[(String, Long, Long, Long)].collect().toSeq
    // 6 child rows; orphans: 99 (×2) and 98 (×1) → 3 rows, 2 distinct keys
    assert(got == Seq(("child->parent", 6L, 3L, 2L)))
  }

  test("multiple rules keep declaration order and independent counts") {
    val a = Seq(1L, 2L).toDF("k")
    val b = Seq(2L, 3L).toDF("k2")
    val got = Integrity.audit(Seq(
        Integrity.RefRule("a->b", a, "k", b, "k2"),
        Integrity.RefRule("b->a", b, "k2", a, "k")))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("a->b", 2L, 1L, 1L), ("b->a", 2L, 1L, 1L)))
  }
}
