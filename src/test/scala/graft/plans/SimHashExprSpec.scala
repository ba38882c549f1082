package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.dedup.Dedup
import graft.sources.Tables

class SimHashExprSpec extends SparkTestBase {
  import spark.implicits._

  test("native simhash is bit-identical to the HOF fold on real documents") {
    // both forms over the q19 shape: 3-shingles, md5-based 60-bit hash
    val both = Tables.documents(spark, sfSmoke)
      .select(
        Dedup.simhashOf(Dedup.shingles($"text", 3), Dedup.md5Hash60, 60).as("native"),
        Dedup.simhashOfHof(Dedup.shingles($"text", 3), Dedup.md5Hash60, 60).as("hof"))
    assert(both.filter($"native" =!= $"hof" ||
      $"native".isNull =!= $"hof".isNull).count() == 0)
    assert(both.count() > 0)
    // and over the default 64-bit xxhash64 form
    val b64 = Tables.documents(spark, sfSmoke)
      .select(
        Dedup.simhashOf(array_distinct(split(trim($"text"), "\\s+")), xxhash64(_), 64).as("n"),
        Dedup.simhashOfHof(array_distinct(split(trim($"text"), "\\s+")), xxhash64(_), 64).as("h"))
    assert(b64.filter($"n" =!= $"h").count() == 0)
  }

  test("edge semantics match the HOF: empty array, null element, null array") {
    val df = Seq(
      (1L, Some(Seq(Some(5L), Some(9L)))),
      (2L, Some(Seq.empty[Option[Long]])),      // empty → 0L
      (3L, Some(Seq(Some(7L), None))),          // null element votes -1 everywhere
      (4L, Option.empty[Seq[Option[Long]]])     // null array → null
    ).toDF("id", "hs")
    val idf = (c: org.apache.spark.sql.Column) => c // pre-hashed input
    val got = df
      .select($"id",
        GraftFunctions.simhash($"hs", 8).as("native"),
        Dedup.simhashOfHof($"hs", idf, 8).as("hof"))
      .orderBy($"id").collect()
    got.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"null mismatch for id=${r.getLong(0)}")
      if (!r.isNullAt(1))
        assert(r.getLong(1) == r.getLong(2), s"value mismatch for id=${r.getLong(0)}")
    }
    val byId = got.map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(byId(2L).contains(0L))
    assert(byId(4L).isEmpty)
  }

  test("graft_simhash registers for SQL and demands a literal bits arg") {
    GraftFunctions.register(spark)
    // h=5 (101b): bits 0,2 vote +1, others -1 → sig = 5
    val got = spark.sql("SELECT graft_simhash(array(5L), 8) AS s").as[Long].head()
    assert(got == 5L)
  }

  test("the expression participates in whole-stage codegen") {
    val e = spark.range(0, 1000).select(array($"id", $"id" * 3).as("hs"))
    val q = e.select(GraftFunctions.simhash($"hs", 16).as("s"))
    assert(q.queryExecution.executedPlan.toString.contains("*(1) Project [graft_simhash"))
    assert(q.agg(sum($"s")).head().getLong(0) > 0)
  }
}
