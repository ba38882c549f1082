package graft.text

import graft.SparkTestBase

class TfidfSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (0L, "spark spark spark join"),
    (1L, "spark join window"),
    (2L, "window window window"),
    (3L, "")
  ).toDF("doc_id", "text")

  test("ranks by summed tf*idf, drops zero-score docs") {
    val got = Tfidf.searchTopK(docs, "doc_id", "text", Seq("spark", "join"), 10)
      .as[(Long, Double)].collect().toSeq
    // idf = ln(5/df+1…): spark df=2, join df=2 -> same idf; doc0 tf=3+1, doc1 tf=1+1
    assert(got.map(_._1) == Seq(0L, 1L))
    val idf = math.log(5.0 / 3.0) + 1.0
    assert(math.abs(got(0)._2 - BigDecimal(4 * idf).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(got(1)._2 < got(0)._2)
  }

  test("absent term contributes zero tf but max idf; k caps output") {
    val got = Tfidf.searchTopK(docs, "doc_id", "text", Seq("window", "nosuchterm"), 1)
      .as[(Long, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(2L))
  }

  test("plan: single-row stats broadcast + TakeOrderedAndProject, no global sort") {
    val parquetDocs = graft.sources.Tables.documents(spark, sfSmoke)
    val plan = Tfidf.searchTopK(parquetDocs, "doc_id", "text", Seq("spark"), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("Broadcast"), plan)
    assert(!plan.contains("Exchange rangepartitioning"), s"no global sort expected:\n$plan")
  }
}
