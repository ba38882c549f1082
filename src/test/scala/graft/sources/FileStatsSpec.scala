package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class FileStatsSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp() = java.nio.file.Files.createTempDirectory("graft-fstats")
    .resolve("t").toString

  test("stats index matches the landed files; pruned read skips files but loses no rows") {
    val path = tmp()
    val df = spark.range(0, 10000).select($"id", ($"id" % 7).as("tag"))
    FileStats.writeWithStats(df.withColumnRenamed("id", "v"), path, "v", numFiles = 10)

    val stats = spark.read.parquet(s"${path}_stats")
    assert(stats.count() == 10)
    assert(stats.agg(sum($"n_rows")).as[Long].head() == 10000L)
    // range partitioning → disjoint envelopes covering the domain
    val envs = stats.select("min_v", "max_v").as[(Long, Long)].collect().sortBy(_._1)
    envs.sliding(2).foreach { case Array(a, b) => assert(a._2 < b._1); case _ => () }

    val (pruned, nSel, nTot) = FileStats.prunedRead(spark, path, 2000L, 3000L)
    assert(nTot == 10 && nSel < nTot, s"expected skipping, got $nSel/$nTot")
    val got = pruned.filter($"v" >= 2000L && $"v" <= 3000L)
      .agg(count(lit(1)), sum($"v")).as[(Long, Long)].head()
    val want = df.filter($"id" >= 2000L && $"id" <= 3000L)
      .agg(count(lit(1)), sum($"id")).as[(Long, Long)].head()
    assert(got == want)
  }

  test("a range outside every envelope selects zero files and returns empty") {
    val path = tmp()
    FileStats.writeWithStats(spark.range(0, 100).toDF("v"), path, "v", numFiles = 4)
    val (pruned, nSel, _) = FileStats.prunedRead(spark, path, 5000L, 6000L)
    assert(nSel == 0 && pruned.count() == 0)
  }
}
