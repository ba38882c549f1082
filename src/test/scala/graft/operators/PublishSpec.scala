package graft.operators

import graft.SparkTestBase
import java.nio.file.Files
import org.apache.spark.sql.functions._

class PublishSpec extends SparkTestBase {
  import spark.implicits._

  private def freshPath() =
    Files.createTempDirectory("publish-spec").resolve("tbl").toString

  private val nonEmpty = "non_empty" -> ((d: org.apache.spark.sql.DataFrame) => d.count() > 0)
  private def noNulls(c: String) =
    s"no_null_$c" -> ((d: org.apache.spark.sql.DataFrame) => d.filter(col(c).isNull).count() == 0)

  test("clean audit publishes; consumers read the staged content") {
    val path = freshPath()
    val rpt = Publish.writeAuditPublish(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), path, Seq(nonEmpty, noNulls("v")))
    assert(rpt.published && rpt.failed.isEmpty && rpt.rows == 2L)
    assert(spark.read.parquet(path).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
    assert(!new java.io.File(path + ".staging").exists())
  }

  test("failing audit keeps the previous version live and names the checks") {
    val path = freshPath()
    Publish.writeAuditPublish(spark,
      Seq((1L, "good")).toDF("id", "v"), path, Seq(nonEmpty))
    // second drop has a null v → audit fails → v1 stays published
    val rpt = Publish.writeAuditPublish(spark,
      Seq((9L, null.asInstanceOf[String])).toDF("id", "v"), path,
      Seq(nonEmpty, noNulls("v")))
    assert(!rpt.published && rpt.failed == Seq("no_null_v"))
    assert(spark.read.parquet(path).as[(Long, String)].collect().toSeq ==
      Seq((1L, "good")))
    // the bad drop stays in staging for inspection
    assert(new java.io.File(path + ".staging").exists())
  }

  test("republish replaces the prior version completely") {
    val path = freshPath()
    Publish.writeAuditPublish(spark, Seq((1L, "old")).toDF("id", "v"), path, Seq(nonEmpty))
    Publish.writeAuditPublish(spark, Seq((2L, "new")).toDF("id", "v"), path, Seq(nonEmpty))
    assert(spark.read.parquet(path).as[(Long, String)].collect().toSeq == Seq((2L, "new")))
    assert(!new java.io.File(path + ".retired").exists())
  }
}
