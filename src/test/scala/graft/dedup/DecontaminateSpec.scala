package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DecontaminateSpec extends SparkTestBase {
  import spark.implicits._

  // 10-token texts → three distinct 8-grams each; overlap is controllable
  // by sharing token runs
  private val run = (a: Int, n: Int) => (a until a + n).map(i => s"w$i").mkString(" ")

  test("flags a corpus doc containing an eval doc's 8-gram run, counts shared grams") {
    val corpus = Seq(
      (1L, run(0, 12)),      // contains eval run(2,10) as a sub-run
      (2L, run(100, 12)),    // disjoint vocabulary
      (3L, run(200, 8))      // exactly one 8-gram, disjoint
    ).toDF("doc_id", "text")
    val evalSet = Seq(
      (900L, run(2, 10)),    // 3 distinct 8-grams, all inside corpus doc 1
      (901L, run(300, 9))
    ).toDF("doc_id", "text")
    val pairs = Decontaminate.contaminationPairs(corpus, evalSet, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    // run(2,10)'s grams start at offsets 2,3,4 of run(0,12): 3 shared
    assert(pairs == Set((1L, 900L, 3L)))
    val report = Decontaminate.contaminationReport(corpus, evalSet, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(report == Set((1L, 1L, 3L, 3L)))
  }

  test("maxDf drops boilerplate grams shared by too many corpus docs") {
    // the same license-header run appears in every corpus doc AND the
    // eval doc; with maxDf below the df it stops being signal
    val boiler = run(0, 8)
    val corpus = (1L to 5L).map(i => (i, boiler + " " + run(100 * i.toInt, 4)))
      .toDF("doc_id", "text")
    val evalSet = Seq((900L, boiler)).toDF("doc_id", "text")
    assert(Decontaminate.contaminationPairs(
      corpus, evalSet, "doc_id", "text", maxDf = 4).count() == 0)
    assert(Decontaminate.contaminationPairs(
        corpus, evalSet, "doc_id", "text", maxDf = 5)
      .agg(count(lit(1))).as[Long].head() == 5L)
  }

  test("minShared thresholds the pair list") {
    val corpus = Seq((1L, run(0, 12))).toDF("doc_id", "text") // 5 grams
    val evalSet = Seq((900L, run(1, 10))).toDF("doc_id", "text") // grams at 1,2,3
    assert(Decontaminate.contaminationPairs(
      corpus, evalSet, "doc_id", "text", minShared = 4).count() == 0)
    assert(Decontaminate.contaminationPairs(
        corpus, evalSet, "doc_id", "text", minShared = 3)
      .select($"shared").as[Long].collect().toSeq == Seq(3L))
  }

  test("randomized corpora match a serial brute-force reference") {
    val rnd = new scala.util.Random(59L)
    // small vocab + 12-token docs → organic cross-set 8-gram overlaps
    def doc() = Seq.fill(12)(s"t${rnd.nextInt(6)}").mkString(" ")
    val corpus = (1L to 60L).map(i => (i, doc()))
    val evalSet = (900L to 915L).map(i => (i, doc()))
    def gramsOf(t: String): Set[String] = {
      val tk = t.trim.split("\\s+").toSeq
      (1 to math.max(tk.size - 7, 1)).map(i => tk.slice(i - 1, i - 1 + 8).mkString(" ")).toSet
    }
    val maxDf = 8
    val df = corpus.flatMap { case (_, t) => gramsOf(t) }
      .groupBy(identity).view.mapValues(_.size).toMap
    val expected = (for {
      (cid, ct) <- corpus
      (eid, et) <- evalSet
      shared = (gramsOf(ct).filter(df(_) <= maxDf) & gramsOf(et)).size
      if shared >= 1
    } yield (cid, eid, shared.toLong)).toSet
    val got = Decontaminate.contaminationPairs(
        corpus.toDF("doc_id", "text"), evalSet.toDF("doc_id", "text"),
        "doc_id", "text", maxDf = maxDf)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("gram join stays an equi join — no nested-loop or cartesian fallback") {
    val corpus = (1L to 50L).map(i => (i, run(i.toInt * 3, 10))).toDF("doc_id", "text")
    val evalSet = Seq((900L, run(30, 10))).toDF("doc_id", "text")
    val out = Decontaminate.contaminationPairs(corpus, evalSet, "doc_id", "text")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString()
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
