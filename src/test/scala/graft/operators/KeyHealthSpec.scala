package graft.operators

import graft.SparkTestBase
import graft.operators.KeyHealth.KeySpec

class KeyHealthSpec extends SparkTestBase {
  import spark.implicits._

  test("keyHealth: unique key reports zero dup_ppm and max_mult 1") {
    val df = Seq(1L, 2L, 3L).toDF("k")
    val got = KeyHealth.keyHealth(spark, Seq(KeySpec(df, "t", "k")))
      .as[(String, String, Long, Long, Long, Long, Long)].collect().head
    assert(got == (("t", "k", 3L, 0L, 3L, 1L, 0L)))
  }

  test("keyHealth: nulls are counted apart and excluded from dup stats") {
    val df = Seq(Some(1L), None, Some(1L), None).toDF("k")
    val got = KeyHealth.keyHealth(spark, Seq(KeySpec(df, "t", "k")))
      .as[(String, String, Long, Long, Long, Long, Long)].collect().head
    // 4 rows, 2 null; non-null: two copies of 1 → 1 extra of 2 → 500000
    assert(got == (("t", "k", 4L, 2L, 1L, 2L, 500000L)))
  }

  test("keyHealth: dup_ppm counts rows beyond the first per value") {
    val df = Seq(1L, 1L, 1L, 2L).toDF("k")
    val got = KeyHealth.keyHealth(spark, Seq(KeySpec(df, "t", "k")))
      .as[(String, String, Long, Long, Long, Long, Long)].collect().head
    assert(got._5 == 2L && got._6 == 3L && got._7 == 500000L)
  }

  test("keyHealth: an all-null key yields zero dup_ppm, not a div-by-zero") {
    val df = Seq[Option[Long]](None, None).toDF("k")
    val got = KeyHealth.keyHealth(spark, Seq(KeySpec(df, "t", "k")))
      .as[(String, String, Long, Long, Long, Long, Long)].collect().head
    assert(got == (("t", "k", 2L, 2L, 0L, 0L, 0L)))
  }

  test("keyHealth: one row per audited key, in input order semantics") {
    val a = Seq(1L).toDF("k"); val b = Seq(2L, 2L).toDF("j")
    val got = KeyHealth.keyHealth(spark,
        Seq(KeySpec(a, "ta", "k"), KeySpec(b, "tb", "j")))
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> t).toMap
    assert(got.size == 2 && got(("tb", "j"))._6 == 2L)
  }

  test("joinFanout: per-key product, ordered by fanout desc then key") {
    val l = Seq(1L, 1L, 1L, 2L, 3L).toDF("k")
    val r = Seq(1L, 2L, 2L, 2L, 4L).toDF("k")
    val got = KeyHealth.joinFanout(l, "k", r, "k", 10)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // key 1: 3×1=3; key 2: 1×3=3 (tie → key order); 3 and 4 don't match
    assert(got == Seq((1L, 3L, 1L, 3L), (2L, 1L, 3L, 3L)))
  }

  test("joinFanout: topK truncates after the deterministic sort") {
    val l = (1L to 5L).flatMap(k => Seq.fill(k.toInt)(k)).toDF("k")
    val got = KeyHealth.joinFanout(l, "k", l, "k", 2)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((5L, 5L, 5L, 25L), (4L, 4L, 4L, 16L)))
  }

  test("joinFanout: null keys never match and are excluded") {
    val l = Seq(Some(1L), None).toDF("k")
    val got = KeyHealth.joinFanout(l, "k", l, "k", 10)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L, 1L, 1L)))
  }
}
