package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class WordShingleHashSpec extends SparkTestBase {
  import spark.implicits._

  /** The interpreted twin: hashes of the HOF shingle strings
    * (array_distinct'd — the native path keeps duplicates, so we
    * compare SETS; values must be bit-identical).
    */
  private def hofHashSets(texts: Seq[String], k: Int): Seq[Set[Long]] =
    texts.toDF("text")
      .select(transform(graft.dedup.Dedup.shingles($"text", k), s => xxhash64(s)).as("h"))
      .as[Seq[Long]].collect().toSeq.map(_.toSet)

  private def nativeHashSets(texts: Seq[String], k: Int): Seq[Set[Long]] =
    texts.toDF("text")
      .select(GraftFunctions.wordShingleHashes($"text", k).as("h"))
      .as[Seq[Long]].collect().toSeq.map(_.toSet)

  private val tricky = Seq(
    "plain single spaced words here",
    "multi  space\tand\ttabs",
    "\t leading whitespace",
    "trailing whitespace \t",
    "   ",                       // all spaces → trim → empty
    "",
    "one",
    "two words",
    "newline\nseparated\ntokens and  mixed \t separators",
    "unicode café naïve 中文 tokens",
    "dup dup dup dup dup",       // duplicate shingles (multiset vs set)
    "a b c d e f g h i j"
  )

  test("hash values are bit-identical to the HOF string path (as sets)") {
    for (k <- Seq(1, 2, 3, 5)) {
      assert(nativeHashSets(tricky, k) == hofHashSets(tricky, k), s"k=$k")
    }
  }

  test("participates in whole-stage codegen") {
    val df = spark.range(0, 100)
      .select(concat_ws(" ", lit("tok"), $"id".cast("string"), lit("x y z")).as("text"))
      .select(GraftFunctions.wordShingleHashes($"text", 3).as("h"))
    // the `*(n)` prefix marks operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("*(1) Project [graft_word_shingle_hashes"), plan)
    assert(df.select(explode($"h")).distinct().count() > 100)
  }

  test("SQL registration works") {
    GraftFunctions.register(spark)
    val out = spark.sql(
      "SELECT graft_word_shingle_hashes('a b c d', 3) AS h")
      .as[Seq[Long]].head()
    assert(out.size == 2)
  }

  test("minhash signatures over native hashes equal the HOF-hash signatures") {
    val df = tricky.toDF("text")
    val a = df.select(GraftFunctions.minhash(
        transform(graft.dedup.Dedup.shingles($"text", 3), s => xxhash64(s)), 64).as("s"))
      .as[Seq[Long]].collect().toSeq
    val b = df.select(GraftFunctions.minhash(
        GraftFunctions.wordShingleHashes($"text", 3), 64).as("s"))
      .as[Seq[Long]].collect().toSeq
    assert(a == b)
  }
}
