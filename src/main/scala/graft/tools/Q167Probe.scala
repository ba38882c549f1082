package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-timer for the q167 cold regression: times the edge
  * build, the adjacency materialization, and each Bellman-Ford round
  * separately, plus truncate-cadence variants.
  */
object Q167Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_partkey",
        floor($"l_quantity").cast("long").as("q"))
    val edges = graft.operators.Edges.weightedPairs(
      li, "l_orderkey", "l_partkey", "q")

    val fwd = edges.select(col("src").as("u"), col("dst").as("v"),
        col("w").cast("long").as("w"))
      .filter(col("u") =!= col("v"))
    val canon = fwd
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"), col("w"))
      .groupBy(col("u"), col("v")).agg(min(col("w")).as("w"))
    val adj = canon
      .union(canon.select(col("v").as("u"), col("u").as("v"), col("w")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("adj materialize")(println("  adj=" + adj.count()))

    val seeds = graft.sources.Tables.part(spark, sfDir).filter($"p_partkey" <= 5)
    var dist = seeds.select(col("p_partkey").as("node")).distinct()
      .withColumn("dist", lit(0L)).localCheckpoint(true)
    for (r <- 1 to 3) {
      dist = t(s"round $r") {
        val relaxed = dist.withColumnRenamed("node", "u")
          .join(adj, "u")
          .select(col("v").as("node"), (col("dist") + col("w")).as("dist"))
        val next = dist.union(relaxed)
          .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        val d = next.localCheckpoint(true)
        println("  dist=" + d.count())
        d
      }
    }
    t("final orderBy collect")(dist.orderBy("node").count())
    // the real query, twice, in the now-warm JVM
    for (pass <- 1 to 2) {
      t(s"full q167 pass $pass") {
        graft.SparkEntry.queries("q167_shortest_path")(spark, sfDir).count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
