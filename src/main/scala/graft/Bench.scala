package graft
import org.apache.spark.sql.SparkSession

/** Bench main: one JSON line with per-query wall time. Failures are
  * REPORTED (per-query "err" map + failed count), never silently timed —
  * a broken query must not read as a fast query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var errors = Map.empty[String, String]
    def runAll(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count()
        catch {
          case e: Throwable =>
            errors += name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(120)
        }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache() // release per-query persisted sig tables
        name -> dt
      }
    // cold pass warms JVM/codegen/file listing; report steady-state (the
    // cluster-representative number) plus the cold total for honesty
    val cold = runAll()
    val coldTotal = cold.map(_._2).sum
    errors = Map.empty
    val results = runAll()
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\x00-\\x1f]", " ") + "\""
    val qs = results.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"cold_total":$coldTotal,"failed":${errors.size},"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
