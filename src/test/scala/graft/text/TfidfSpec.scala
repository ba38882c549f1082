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

  test("bm25: saturating tf and length normalization beat raw tf*idf biases") {
    val corpus = Seq(
      // tf=10 in a LONG doc: raw tf*idf loves it, bm25 saturates + length-penalizes
      (0L, ("spark " * 10) + ("filler " * 90)),
      // tf=3 in a short doc: bm25's winner
      (1L, "spark spark spark join"),
      (2L, "join window window"),
      (3L, "")
    ).toDF("doc_id", "text")
    val bm = Tfidf.bm25TopK(corpus, "doc_id", "text", Seq("spark"), 10)
      .as[(Long, Double)].collect().toSeq
    val tf = Tfidf.searchTopK(corpus, "doc_id", "text", Seq("spark"), 10)
      .as[(Long, Double)].collect().toSeq
    assert(tf.map(_._1) == Seq(0L, 1L))  // raw tf ranks the stuffed doc first
    assert(bm.map(_._1) == Seq(1L, 0L))  // bm25 prefers the concentrated short doc
    // zero-score docs drop in both
    assert(!bm.map(_._1).contains(2L) && !bm.map(_._1).contains(3L))
  }

  test("bm25 matches a serial reference computation") {
    val got = Tfidf.bm25TopK(docs, "doc_id", "text", Seq("spark", "join"), 10)
      .as[(Long, Double)].collect().toMap
    // serial: N=4, dl = (4,3,3,1) ("" splits to one empty token), avgdl=11/4
    val dls = Map(0L -> 4.0, 1L -> 3.0, 2L -> 3.0, 3L -> 1.0)
    val tfs = Map(0L -> Map("spark" -> 3.0, "join" -> 1.0), 1L -> Map("spark" -> 1.0, "join" -> 1.0))
    def score(id: Long): Double = {
      val (k1, b) = (1.2, 0.75)
      val avgdl = 11.0 / 4.0
      val s = Seq("spark" -> 2.0, "join" -> 2.0).map { case (t, df) =>
        val tf = tfs(id).getOrElse(t, 0.0)
        val idf = math.log(1.0 + (4.0 - df + 0.5) / (df + 0.5))
        idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dls(id) / avgdl))
      }.reduceLeft(_ + _)
      BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(math.abs(got(0L) - score(0L)) < 1e-9)
    assert(math.abs(got(1L) - score(1L)) < 1e-9)
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
