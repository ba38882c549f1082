package graft.operators

import graft.SparkTestBase

class KAnonymitySpec extends SparkTestBase {
  import spark.implicits._

  private def df = Seq(
    ("US", "A"), ("US", "A"), ("US", "A"),   // class of 3
    ("US", "B"), ("US", "B"),                // class of 2
    ("DE", "A")                              // class of 1
  ).toDF("country", "seg")

  test("audit counts classes and rows below k") {
    val out = KAnonymity.audit(df, Seq("country", "seg"), k = 3L)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    // (n_rows, n_classes, classes_at_risk, rows_at_risk, min, max)
    assert(out == ((6L, 3L, 2L, 3L, 1L, 3L)))
  }

  test("k=1 always passes; k above the max class flags everything") {
    val pass = KAnonymity.audit(df, Seq("country", "seg"), k = 1L)
      .select("rows_at_risk").as[Long].head()
    assert(pass == 0L)
    val fail = KAnonymity.audit(df, Seq("country", "seg"), k = 10L)
      .select("rows_at_risk").as[Long].head()
    assert(fail == 6L)
  }

  test("classSizes is one row per distinct QI tuple") {
    val sizes = KAnonymity.classSizes(df, Seq("country", "seg"))
      .as[(String, String, Long)].collect().toSet
    assert(sizes == Set(("US", "A", 3L), ("US", "B", 2L), ("DE", "A", 1L)))
  }
}
