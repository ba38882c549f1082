package graft.operators

import graft.SparkTestBase
import java.nio.file.Files

class CompactionSpec extends SparkTestBase {
  import spark.implicits._

  private def parquetFiles(dir: String): Array[String] =
    new java.io.File(dir).listFiles()
      .map(_.getName).filter(n => n.endsWith(".parquet") && !n.startsWith("."))

  test("merges a shattered directory into one file, content intact") {
    val tmp = Files.createTempDirectory("compact-spec").toString
    val src = s"$tmp/src"; val dst = s"$tmp/dst"
    val data = (1L to 500L).map(i => (i, s"v$i"))
    data.toDF("id", "v").repartition(20).write.parquet(src)
    assert(parquetFiles(src).length == 20)

    val rpt = Compaction.compact(spark, src, dst, targetBytes = 1L << 30)
    assert(rpt.filesIn == 20 && rpt.filesOut == 1 && rpt.bytesIn > 0)
    assert(parquetFiles(dst).length == 1)
    assert(Compaction.read(spark, dst).as[(Long, String)].collect().toSet ==
      data.toSet)
  }

  test("tiny target splits into multiple files matching the report") {
    val tmp = Files.createTempDirectory("compact-spec2").toString
    val src = s"$tmp/src"; val dst = s"$tmp/dst"
    (1L to 2000L).map(i => (i, "x" * 100)).toDF("id", "v")
      .repartition(4).write.parquet(src)
    val bytes = new java.io.File(src).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.length).sum
    val rpt = Compaction.compact(spark, src, dst, targetBytes = bytes / 3)
    assert(rpt.filesOut >= 3)
    assert(parquetFiles(dst).length == rpt.filesOut)
    assert(Compaction.read(spark, dst).count() == 2000L)
  }
}
