package graft.operators

import graft.SparkTestBase

class SurvivorshipSpec extends SparkTestBase {
  import spark.implicits._

  test("latest non-null wins per field; gaps don't erase") {
    val rows = Seq(
      // user 1: latest row has null v — the older good value survives
      (1L, 1L, 10L, Some("a"), Some(100L)),
      (1L, 2L, 20L, Some("b"), Some(200L)),
      (1L, 3L, 30L, Some("c"), None),
      // user 2: v never known
      (2L, 4L, 5L, Some("x"), None)
    ).toDF("k", "tie", "ms", "et", "v")
    val out = Survivorship.goldenRecord(rows, "k", "ms", "tie", Seq("et", "v"))
      .as[(Long, Option[String], Option[Long], Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, Some("c"), Some(200L), 10L, 30L, 3L)))
    assert(out(2L) == ((2L, Some("x"), None, 5L, 5L, 1L)))
  }

  test("same-ts updates resolve by the tiebreak column") {
    val rows = Seq(
      (1L, 1L, 10L, Some("first"), Option.empty[Long]),
      (1L, 2L, 10L, Some("second"), Option.empty[Long])
    ).toDF("k", "tie", "ms", "et", "v")
    val out = Survivorship.goldenRecord(rows, "k", "ms", "tie", Seq("et", "v"))
      .as[(Long, Option[String], Option[Long], Long, Long, Long)].head()
    assert(out._2.contains("second") && out._3.isEmpty)
  }
}
