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
