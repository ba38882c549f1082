package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.similarity.Similarity
import graft.sources.Tables

class ArrayDotSpec extends SparkTestBase {
  import spark.implicits._

  test("native dot is bit-identical to the HOF fold on real embeddings") {
    val e = Tables.embeddings(spark, sfSmoke)
      .select($"vec_id", Similarity.toDoubleVec($"embedding").as("v"))
    val q = e.limit(1).select($"v".as("qv"))
    val both = e.crossJoin(broadcast(q))
      .select(
        Similarity.dot($"v", $"qv").as("native"),
        Similarity.dotHof($"v", $"qv").as("hof"))
    assert(both.filter($"native" =!= $"hof" ||
      $"native".isNull =!= $"hof".isNull).count() == 0)
    assert(both.count() > 0)
  }

  test("null semantics: null array, length mismatch, null element → null") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),   // 11.0
      (None, Some(Seq(1.0))),                        // null input
      (Some(Seq(1.0)), Some(Seq(1.0, 2.0)))          // length mismatch
    ).toDF("a", "b")
    val got = df.select(GraftFunctions.dot($"a", $"b")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == Seq(Some(11.0), None, None))
  }

  test("graft_dot registers for SQL via GraftFunctions/extensions") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .as[Double].head()
    assert(got == 11.0)
  }

  test("the expression participates in whole-stage codegen") {
    // array() of doubles is codegen'd end-to-end; a HOF (transform/cast)
    // in the same projection would knock the stage out of codegen.
    val e = spark.range(0, 1000)
      .select(array($"id".cast("double"), ($"id" * 2).cast("double")).as("v"))
    val q = e.select(GraftFunctions.dot($"v", $"v").as("d"))
    // the `*(n)` prefix marks operators inside a WholeStageCodegen stage
    assert(q.queryExecution.executedPlan.toString.contains("*(1) Project [graft_dot"))
    assert(q.agg(sum($"d")).head().getDouble(0) > 0)
  }
}
