package graft.operators

import graft.SparkTestBase

class RecordLinkageSpec extends SparkTestBase {
  import spark.implicits._

  test("scores equal the serial twin; blocking bounds the pair set") {
    val rng = new scala.util.Random(29)
    val rows = (1L to 200L).map(i =>
      (i, rng.nextInt(5).toLong, s"s${rng.nextInt(3)}", rng.nextInt(4).toLong))
    val df = rows.toDF("id", "blk", "f1", "f2")
    val got = RecordLinkage.scorePairs(df, "id", Seq("blk"),
        Seq(("f1", 60L), ("f2", 40L)), minScore = 60L)
      .select("id_a", "id_b", "score").as[(Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    val byId = rows.map(r => r._1 -> r).toMap
    val want = (for {
      a <- rows; b <- rows if a._1 < b._1 && a._2 == b._2
      s = (if (a._3 == b._3) 60L else 0L) + (if (a._4 == b._4) 40L else 0L)
      if s >= 60L
    } yield (a._1, b._1) -> s).toMap
    assert(got == want)
    // no cross-block pair can appear no matter the field agreement
    assert(got.keys.forall { case (x, y) => byId(x)._2 == byId(y)._2 })
  }

  test("union blocking is result-preserving when minScore mandates a field disjunction") {
    // weights (f1 60, f2 40, f3 40), minScore 80: f1 alone is 60 < 80,
    // so every qualifying combination (f1+f2, f1+f3, f2+f3, all three)
    // agrees on f2 OR f3 — the mandated disjunction. Union-blocking on
    // (blk, f2) ∪ (blk, f3) must therefore reproduce the base (blk)
    // blocking's output exactly, agreement bits included.
    val rng = new scala.util.Random(47)
    val rows = (1L to 300L).map(i =>
      (i, rng.nextInt(3).toLong, s"a${rng.nextInt(4)}",
        s"b${rng.nextInt(5)}", rng.nextInt(4).toLong))
    val df = rows.toDF("id", "blk", "f1", "f2", "f3")
    val fields = Seq(("f1", 60L), ("f2", 40L), ("f3", 40L))
    def toMap(d: org.apache.spark.sql.DataFrame) =
      d.select("id_a", "id_b", "agree_f1", "agree_f2", "agree_f3", "score")
        .as[(Long, Long, Long, Long, Long, Long)]
        .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    val base = toMap(RecordLinkage.scorePairs(
      df, "id", Seq("blk"), fields, minScore = 80L))
    val union = toMap(RecordLinkage.scorePairsUnionBlocked(
      df, "id", Seq(Seq("blk", "f2"), Seq("blk", "f3")), fields,
      minScore = 80L))
    assert(union == base && base.nonEmpty,
      s"union ${union.size} vs base ${base.size}")
  }

  test("null comparison fields never agree") {
    val df = Seq(
      (1L, 1L, Option.empty[String], 7L),
      (2L, 1L, Option.empty[String], 7L),
      (3L, 1L, Some("x"), 7L)).toDF("id", "blk", "f1", "f2")
    val got = RecordLinkage.scorePairs(df, "id", Seq("blk"),
        Seq(("f1", 50L), ("f2", 50L)), minScore = 50L)
      .select("id_a", "id_b", "score").as[(Long, Long, Long)].collect().toSet
    // nulls: f1 never agrees, so every pair scores only f2's 50
    assert(got == Set((1L, 2L, 50L), (1L, 3L, 50L), (2L, 3L, 50L)))
  }
}
