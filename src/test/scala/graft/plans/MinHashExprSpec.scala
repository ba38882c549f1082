package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.dedup.Dedup
import graft.sources.Tables

class MinHashExprSpec extends SparkTestBase {
  import spark.implicits._

  test("native minhash is bit-identical to the HOF fold on real documents") {
    val both = Tables.documents(spark, sfSmoke)
      .select(
        Dedup.minhashSignature(Dedup.shingles($"text", 3), 64).as("native"),
        Dedup.minhashSignatureHof(Dedup.shingles($"text", 3), 64).as("hof"))
    assert(both.filter($"native" =!= $"hof" ||
      $"native".isNull =!= $"hof".isNull).count() == 0)
    assert(both.count() > 0)
  }

  test("edge semantics match the HOF: empty array, null element, null array") {
    val df = Seq(
      (1L, Some(Seq(Some("a"), Some("b")))),
      (2L, Some(Seq.empty[Option[String]])),    // empty → all-MaxValue init
      (3L, Some(Seq(Some("a"), None))),         // null hash → slot seeds vote
      (4L, Option.empty[Seq[Option[String]]])   // null array → null
    ).toDF("id", "sh")
    val got = df.select($"id",
        Dedup.minhashSignature($"sh", 8).as("native"),
        Dedup.minhashSignatureHof($"sh", 8).as("hof"))
      .orderBy($"id").collect()
    got.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"null mismatch id=${r.getLong(0)}")
      if (!r.isNullAt(1))
        assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"value mismatch id=${r.getLong(0)}")
    }
    val byId = got.map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getSeq[Long](1)))).toMap
    assert(byId(2L).contains(Seq.fill(8)(Long.MaxValue)))
    assert(byId(4L).isEmpty)
  }

  test("graft_minhash registers for SQL and participates in whole-stage codegen") {
    GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT graft_minhash(array(xxhash64('a')), 4) AS s")
      .head().getSeq[Long](0)
    val viaHof = spark.range(1)
      .select(Dedup.minhashSignatureHof(typedlit(Seq("a")), 4).as("s"))
      .head().getSeq[Long](0)
    assert(viaSql == viaHof)
    val e = spark.range(0, 1000).select(array($"id", $"id" * 3).as("hs"))
    val q = e.select(GraftFunctions.minhash($"hs", 16).as("s"))
    assert(q.queryExecution.executedPlan.toString.contains("*(1) Project [graft_minhash"))
    assert(q.agg(min(element_at($"s", 1))).head().getLong(0) < Long.MaxValue)
  }
}
