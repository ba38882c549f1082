package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-level profiler for the triangle pipeline — matches
  * q107's CURRENT shape (Edges.coOccurrence + Triangles adjacency
  * intersection) so a fresh-JVM run attributes the cold cost per stage.
  */
object TriProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    // harness warmup like a Bench child (scheduler + parquet + exchange)
    t("warmup") {
      spark.read.parquet(s"$sfDir/region.parquet").count()
      spark.range(1000).repartition(4).selectExpr("sum(id)").collect()
    }
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_partkey")
    val co = graft.operators.Edges.coOccurrence(li, "l_orderkey", "l_partkey")
      .persist()
    t("coOccurrence edges (collect_set + explode)")(co.count())
    val e = co.select(least($"a", $"b").as("a"), greatest($"a", $"b").as("b"))
      .filter($"a" =!= $"b").distinct().persist()
    t("canonical distinct e")(e.count())
    val deg = e.select(explode(array($"a", $"b")).as("v")).groupBy($"v")
      .agg(count(lit(1)).as("d")).persist()
    t("deg")(deg.count())
    val ord = deg.select($"v", ($"d" * lit(4294967296L) + $"v").as("k"))
    val dir = e
      .join(broadcast(ord.withColumnRenamed("v", "a").withColumnRenamed("k", "ka")), "a")
      .join(broadcast(ord.withColumnRenamed("v", "b").withColumnRenamed("k", "kb")), "b")
      .select(
        when($"ka" < $"kb", $"a").otherwise($"b").as("u"),
        when($"ka" < $"kb", $"b").otherwise($"a").as("v"))
      .persist()
    t("oriented dir")(dir.count())
    val adjRaw = dir.groupBy($"u").agg(collect_list($"v").as("nbrs")).persist()
    t("adjacency arrays")(adjRaw.count())
    val closed = dir.select($"u".as("a"), $"v".as("b"))
      .join(broadcast(adjRaw).select($"u".as("a"), $"nbrs".as("na")), "a")
      .join(broadcast(adjRaw).select($"u".as("b"), $"nbrs".as("nb")), "b")
      .select(explode(array_intersect($"na", $"nb")).as("z"))
    t("closing intersection")(closed.count())
    t("second full q107 (warm)") {
      graft.SparkEntry.queries("q107_triangles")(spark, sfDir).count()
    }
    spark.stop()
  }
}
