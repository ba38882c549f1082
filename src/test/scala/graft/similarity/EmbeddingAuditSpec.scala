package graft.similarity

import graft.SparkTestBase

class EmbeddingAuditSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(String, Seq[Float])], dim: Int, minSq: Long) =
    EmbeddingAudit.audit(rows.toDF("g", "vec"), "g", "vec", dim, minSq)
      .select("g", "n_vecs", "n_bad_dim", "n_nonfinite", "n_near_zero",
        "min_sq_norm", "max_sq_norm")
      .as[(String, Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().map(t => t._1 -> t).toMap

  test("clean vectors: exact integerized squared norms") {
    // (1.0, 0.5) → (1000² + 500²) = 1_250_000
    val got = run(Seq(("a", Seq(1.0f, 0.5f)), ("a", Seq(0.1f, 0.0f))),
      dim = 2, minSq = 50000L)
    val a = got("a")
    assert((a._2, a._3, a._4) == ((2L, 0L, 0L)))
    // floor(0.1*1000)=100 → 10000 < 50000 → near-zero
    assert(a._5 == 1L && a._6.contains(10000L) && a._7.contains(1250000L))
  }

  test("wrong dimensionality is counted and excluded from norm stats") {
    val got = run(Seq(("a", Seq(1.0f)), ("a", Seq(1.0f, 1.0f))),
      dim = 2, minSq = 1L)
    assert(got("a")._3 == 1L && got("a")._7.contains(2000000L))
  }

  test("NaN and infinite components are flagged, not crashed on") {
    val got = run(Seq(
      ("a", Seq(Float.NaN, 1.0f)),
      ("a", Seq(Float.PositiveInfinity, 0.0f)),
      ("a", Seq(1.0f, 1.0f))), dim = 2, minSq = 1L)
    assert(got("a")._4 == 2L && got("a")._6.contains(2000000L))
  }

  test("a group of only bad vectors yields null norm bounds") {
    val got = run(Seq(("a", Seq(Float.NaN))), dim = 1, minSq = 1L)
    assert(got("a")._4 == 1L && got("a")._6.isEmpty && got("a")._7.isEmpty)
  }

  test("negative components square positive") {
    val got = run(Seq(("a", Seq(-1.0f, -0.5f))), dim = 2, minSq = 1L)
    assert(got("a")._7.contains(1250000L))
  }
}
