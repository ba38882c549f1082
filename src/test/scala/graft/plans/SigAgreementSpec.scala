package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.dedup.Dedup
import graft.sources.Tables

class SigAgreementSpec extends SparkTestBase {
  import spark.implicits._

  test("native agreement is bit-identical to the HOF on real signature pairs") {
    val sigs = Tables.documents(spark, sfSmoke)
      .select($"doc_id",
        Dedup.minhashSignature(Dedup.shingles($"text", 3), 64).as("sig"))
    val a = sigs.select($"doc_id".as("id_a"), $"sig".as("sa"))
    val b = sigs.select($"doc_id".as("id_b"), $"sig".as("sb"))
    val pairs = a.crossJoin(b).filter($"id_a" < $"id_b").limit(5000)
      .select(
        Dedup.signatureAgreement($"sa", $"sb").as("native"),
        Dedup.signatureAgreementHof($"sa", $"sb").as("hof"))
    assert(pairs.filter($"native" =!= $"hof").count() == 0)
    assert(pairs.count() > 0)
  }

  test("edge semantics: empty left array → null (where ANSI HOF throws), null array → null") {
    val df = Seq(
      (1L, Some(Seq(1L, 2L)), Some(Seq(1L, 3L))),   // 0.5
      (2L, Some(Seq.empty[Long]), Some(Seq(1L))),   // null (HOF: ANSI 0/0 error)
      (3L, Option.empty[Seq[Long]], Some(Seq(1L)))  // null input
    ).toDF("id", "a", "b")
    val got = df.select($"id", Dedup.signatureAgreement($"a", $"b").as("native"))
      .orderBy($"id").collect()
    assert(got(0).getDouble(1) == 0.5)
    assert(got(1).isNullAt(1) && got(2).isNullAt(1))
    // and the HOF agrees wherever it is defined (non-empty, non-null)
    val hof = df.filter($"id" === 1L)
      .select(Dedup.signatureAgreementHof($"a", $"b")).head().getDouble(0)
    assert(hof == 0.5)
  }

  test("graft_sig_agreement registers for SQL") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT graft_sig_agreement(array(1L, 2L, 3L, 4L), array(1L, 9L, 3L, 9L)) AS a")
      .head().getDouble(0)
    assert(got == 0.5)
  }

  test("the expression participates in whole-stage codegen") {
    val e = spark.range(0, 100)
      .select(array($"id", $"id" * 2).as("a"), array($"id", $"id" * 3).as("b"))
    val q = e.select(ArraySigAgreement.sigAgreement($"a", $"b").as("agree"))
    assert(q.queryExecution.executedPlan.toString.contains("*(1) Project [graft_sig_agreement"))
    assert(q.agg(avg($"agree")).head().getDouble(0) > 0)
  }
}
