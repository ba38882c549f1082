package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query profiler: runMain graft.tools.Profile <sfDir> <q>... */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val cnt = graft.SparkEntry.queries(n)(spark, sfDir).count()
      println(f"[profile] $n: ${(System.nanoTime() - t0) / 1e9}%.1f s, $cnt rows")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
