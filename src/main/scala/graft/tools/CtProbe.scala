package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scratch stage-level profiler for the containment-join pipeline. */
object CtProbe {
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
    val (tNum, tDen) = (8, 10)
    val sets = graft.sources.Tables.documents(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism)
      .select($"doc_id", graft.dedup.Dedup.shingles($"text", 3).as("sh"))
    val base = sets
      .select($"doc_id".cast("long").as("__id"), array_distinct($"sh").as("__set"))
      .filter(size($"__set") > 0)
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("base.count")(base.count())
    val ex = base.select($"__id", explode($"__set").as("__el"))
      .withColumn("__eh", xxhash64($"__el"))
    val dfreq = ex.groupBy("__eh").agg(count(lit(1)).as("__df"))
    val ordered = ex.join(dfreq, "__eh")
      .groupBy("__id")
      .agg(transform(
        array_sort(collect_list(struct($"__df", $"__eh", $"__el"))),
        x => x("__eh")).as("__ord"))
      .withColumn("__n", size($"__ord"))
      .withColumn("__L",
        $"__n" - expr(s"(($tNum * __n + $tDen - 1) div $tDen)") + 1)
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("ordered.count")(ordered.count())
    val probe = ordered
      .select($"__id".as("__pid"), $"__n".as("__pn"),
        explode(slice($"__ord", lit(1), $"__L")).as("__eh"))
    val index = ordered
      .select($"__id".as("__iid"), $"__n".as("__in"), explode($"__ord").as("__eh"))
    val cands = probe.join(index,
        probe("__eh") === index("__eh") && col("__pid") =!= col("__iid") &&
          (col("__pn") < col("__in") ||
            (col("__pn") === col("__in") && col("__pid") < col("__iid"))))
      .select(least($"__pid", $"__iid").as("id_a"), greatest($"__pid", $"__iid").as("id_b"))
      .distinct().persist()
    t("cands.count")(println("cands=" + cands.count()))
    val sa = base.select($"__id".as("id_a"), $"__set".as("__sa"))
    val sb = base.select($"__id".as("id_b"), $"__set".as("__sb"))
    val out = cands.join(sa, "id_a").join(sb, "id_b")
      .withColumn("shared", size(array_intersect($"__sa", $"__sb")).cast("long"))
      .withColumn("n_a", size($"__sa").cast("long"))
      .withColumn("n_b", size($"__sb").cast("long"))
      .filter(lit(tDen.toLong) * $"shared" >= lit(tNum.toLong) * least($"n_a", $"n_b"))
    t("verify.count")(out.count())
    spark.stop()
  }
}
