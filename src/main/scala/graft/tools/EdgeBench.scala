package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B microbench for the co-occurrence edge build:
  * self-join vs aggregate+pair-explosion (operators/Edges).
  * runMain graft.tools.EdgeBench <sfDir>
  */
object EdgeBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val li = graft.sources.Tables.lineitem(spark, args(0))
      .select($"l_orderkey", $"l_partkey")
    def time(label: String)(f: => Long): Unit = {
      for (r <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"[edgebench] $label r$r: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
      }
    }
    time("selfjoin_distinct") {
      li.as("x").join(li.as("y"), $"x.l_orderkey" === $"y.l_orderkey")
        .filter($"x.l_partkey" < $"y.l_partkey")
        .select($"x.l_partkey".cast("long").as("a"), $"y.l_partkey".cast("long").as("b"))
        .distinct().count()
    }
    time("explode_distinct") {
      graft.operators.Edges.coOccurrence(li, "l_orderkey", "l_partkey").count()
    }
    time("selfjoin_counts") {
      li.as("x").join(li.as("y"), $"x.l_orderkey" === $"y.l_orderkey")
        .filter($"x.l_partkey" < $"y.l_partkey")
        .groupBy($"x.l_partkey".as("a"), $"y.l_partkey".as("b"))
        .agg(count(lit(1))).count()
    }
    time("explode_counts") {
      graft.operators.Edges.coOccurrenceCounts(li, "l_orderkey", "l_partkey").count()
    }
    spark.stop()
  }
}
