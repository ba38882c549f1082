package graft.operators

import graft.SparkTestBase

class IndependenceSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(String, String)]) =
    Independence.crosstab(rows.toDF("r", "c"), "r", "c")
      .select("r", "c", "obs", "row_total", "col_total", "grand_total",
        "expected", "lift")
      .as[(String, String, Long, Long, Long, Long, Double, Double)]
      .collect().map(t => (t._1, t._2) -> t).toMap

  test("cells, marginals, and expected counts are exact") {
    // 2×2: (a,x)=3 (a,y)=1 (b,x)=1 (b,y)=5 → N=10
    val rows = Seq.fill(3)(("a", "x")) ++ Seq(("a", "y")) ++
      Seq(("b", "x")) ++ Seq.fill(5)(("b", "y"))
    val got = run(rows)
    val ax = got(("a", "x"))
    assert((ax._3, ax._4, ax._5, ax._6) == ((3L, 4L, 4L, 10L)))
    assert(ax._7 == 4.0 * 4 / 10 && ax._8 == 3.0 / 1.6)
    val by = got(("b", "y"))
    assert((by._3, by._4, by._5, by._6) == ((5L, 6L, 6L, 10L)))
  }

  test("an independent table has lift exactly 1 everywhere") {
    // uniform 2×2 with equal counts: obs = expected in every cell
    val rows = for (r <- Seq("a", "b"); c <- Seq("x", "y"); _ <- 1 to 4)
      yield (r, c)
    assert(run(rows).values.forall(t => t._8 == 1.0))
  }

  test("unobserved combinations produce no row (sparse cells)") {
    val got = run(Seq(("a", "x"), ("b", "y")))
    assert(got.size == 2 && !got.contains(("a", "y")))
    // marginals still count only observed rows
    assert(got(("a", "x"))._4 == 1L && got(("a", "x"))._5 == 1L)
  }
}
