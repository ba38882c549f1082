package graft.text

import java.nio.file.Files

import graft.SparkTestBase

class InvertedIndexSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (0L, "spark join spark"),
    (1L, "spark window"),
    (2L, "join window join"),
    (3L, "")
  ).toDF("doc_id", "text")

  private lazy val idxPath = {
    val p = Files.createTempDirectory("graft-invidx").resolve("idx").toString
    InvertedIndex.writeIndex(docs, "doc_id", "text", p, buckets = 8)
    p
  }

  test("searchAnd returns docs containing ALL terms with summed tf") {
    val got = InvertedIndex.searchAnd(spark, idxPath, "doc_id", Seq("spark", "join"), 8)
      .orderBy($"doc_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 3L))) // only doc 0 has both; tf 2+1
  }

  test("single-term search hits every containing doc") {
    val got = InvertedIndex.searchAnd(spark, idxPath, "doc_id", Seq("window"), 8)
      .orderBy($"doc_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L), (2L, 1L)))
  }

  test("probe prunes partitions at file listing") {
    val plan = InvertedIndex.searchAnd(spark, idxPath, "doc_id", Seq("spark"), 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("tok_bucket"), plan)
  }
}
