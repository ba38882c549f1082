package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-level profiler for the triangle pipeline. */
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
    val li = graft.sources.Tables.lineitem(spark, sfDir).select($"l_orderkey", $"l_partkey")
    val edges = li.as("x").join(li.as("y"), $"x.l_orderkey" === $"y.l_orderkey")
      .filter($"x.l_partkey" < $"y.l_partkey")
      .select($"x.l_partkey".as("src"), $"y.l_partkey".as("dst"))
    val e = edges.select(least($"src", $"dst").as("a"), greatest($"src", $"dst").as("b"))
      .filter($"a" =!= $"b").distinct().persist()
    t("e.count")(e.count())
    val deg = e.select(explode(array($"a", $"b")).as("v")).groupBy($"v")
      .agg(count(lit(1)).as("d")).persist()
    t("deg.count")(deg.count())
    val ord = deg.select($"v", ($"d" * lit(4294967296L) + $"v").as("k"))
    val dir = e
      .join(broadcast(ord.withColumnRenamed("v", "a").withColumnRenamed("k", "ka")), "a")
      .join(broadcast(ord.withColumnRenamed("v", "b").withColumnRenamed("k", "kb")), "b")
      .select(
        when($"ka" < $"kb", $"a").otherwise($"b").as("u"),
        when($"ka" < $"kb", $"kb").otherwise($"ka").as("kv"),
        when($"ka" < $"kb", $"b").otherwise($"a").as("v"))
      .persist()
    t("dir.count")(dir.count())
    val w1 = dir.select($"u", $"v".as("x"), $"kv".as("kx"))
    val w2 = dir.select($"u", $"v".as("y"), $"kv".as("ky"))
    val wedges = w1.join(w2, Seq("u")).filter($"kx" < $"ky")
      .select($"u", $"x", $"y")
    t("wedges.count")(wedges.count())
    val closing = dir.select($"u".as("x"), $"v".as("y"))
    val closed = wedges.join(broadcast(closing), Seq("x", "y")).select($"u", $"x", $"y")
    t("closed.count (broadcast)")(closed.count())
    // variant: adjacency-array intersection
    val adj = dir.groupBy($"u").agg(sort_array(collect_list($"v")).as("nbrs")).persist()
    t("adj.count")(adj.count())
    val withA = dir.select($"u".as("a"), $"v".as("b"))
      .join(adj.select($"u".as("a"), $"nbrs".as("na")), "a")
      .join(adj.select($"u".as("b"), $"nbrs".as("nb")), "b")
      .select(explode(array_intersect($"na", $"nb")).as("z"))
    t("intersect closed.count")(withA.count())
    spark.stop()
  }
}
