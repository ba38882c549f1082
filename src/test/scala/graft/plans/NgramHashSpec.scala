package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.dedup.Dedup
import graft.sources.Tables

class NgramHashSpec extends SparkTestBase {
  import spark.implicits._

  private def hofHashes(c: org.apache.spark.sql.Column, n: Int) =
    transform(Dedup.charShingles(c, n), s => xxhash64(s))

  test("byte-level gram hashes are set-equal to xxhash64 over charShingles on real docs") {
    // native keeps duplicates (multiset), the string path is distinct —
    // compare as sorted sets; equal sets ⇒ identical minhash signatures
    val both = Tables.documents(spark, sfSmoke)
      .select(
        array_sort(array_distinct(GraftFunctions.ngramHashes($"text", 5))).as("native"),
        array_sort(array_distinct(hofHashes($"text", 5))).as("hof"))
    assert(both.filter($"native" =!= $"hof").count() == 0)
    assert(both.count() > 0)
  }

  test("minhash signatures from the native hasher are bit-equal to the string path") {
    val both = Tables.documents(spark, sfSmoke)
      .select(
        GraftFunctions.minhash(GraftFunctions.ngramHashes($"text", 5), 64).as("native"),
        GraftFunctions.minhash(hofHashes($"text", 5), 64).as("hof"))
    assert(both.filter($"native" =!= $"hof").count() == 0)
  }

  test("multibyte chars, short and empty strings follow the charShingles clamp") {
    val df = Seq("héllo wörld", "ab", "", "日本語のテキスト").toDF("t")
    val got = df.select(
      array_sort(array_distinct(GraftFunctions.ngramHashes($"t", 3))).as("native"),
      array_sort(array_distinct(hofHashes($"t", 3))).as("hof")).collect()
    got.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString))
  }

  test("graft_ngram_hashes registers for SQL") {
    GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT graft_ngram_hashes('abcd', 3) AS hs")
      .head().getSeq[Long](0)
    val viaCol = Seq("abcd").toDF("t")
      .select(GraftFunctions.ngramHashes($"t", 3)).head().getSeq[Long](0)
    assert(viaSql == viaCol && viaSql.length == 2)
  }

  test("the expression participates in whole-stage codegen") {
    val q = spark.range(0, 100)
      .select(concat(lit("doc "), $"id").as("t"))
      .select(GraftFunctions.ngramHashes($"t", 4).as("hs"))
    assert(q.queryExecution.executedPlan.toString.contains("*(1) Project [graft_ngram_hashes"))
    assert(q.agg(max(size($"hs"))).head().getInt(0) > 0)
  }
}
