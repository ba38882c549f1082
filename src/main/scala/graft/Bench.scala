package graft
import org.apache.spark.sql.SparkSession

/** Bench main: one JSON line with per-query wall time. Failures are
  * REPORTED (per-query "err" map + failed count), never silently timed —
  * a broken query must not read as a fast query.
  *
  * Measurement design (round-3 fix): the round-2 harness ran two full
  * sequential passes and reported the SECOND — but JVM state accumulated
  * across 66 query executions (codegen classes/metaspace, q25's streaming
  * replays, persist churn) inflated the later pass up to 40× per query,
  * so "warm" read slower than cold and neither matched a fresh-session
  * run. Now:
  *  - headline `value`/`queries` = the COLD pass (fresh JVM, first
  *    execution — the number a fresh-session Profile run reproduces);
  *  - `steady_state`/`queries_warm` = per-query MIN over the warm
  *    passes (min-of-N absorbs accumulated-state noise: any single
  *    clean execution bounds the query's true steady-state cost);
  *  - warm passes run in ROTATED query order so accumulation from a
  *    heavy query doesn't always tax the same successors.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val warmPasses = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARM", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var errors = Map.empty[String, String]
    def runOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch {
        case e: Throwable =>
          errors += name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(120)
      }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // release per-query persisted sig tables
      dt
    }
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val cold = ordered.map { case (n, fn) => n -> runOne(n, fn) }
    val coldErrors = errors
    // warm passes: rotate the start offset so pass-order position doesn't
    // systematically couple a query to its predecessors' leftover state.
    // Warm-pass failures are REPORTED separately (warm_failed/errors_warm)
    // — a query that only breaks on re-execution must not read as a
    // healthy steady state with its cold time substituted in.
    val warm = scala.collection.mutable.Map.empty[String, Double]
    val warmErrors = scala.collection.mutable.Map.empty[String, String]
    for (p <- 1 to warmPasses) {
      errors = Map.empty
      val off = (p * ordered.size / (warmPasses + 1)) % math.max(ordered.size, 1)
      val rotated = ordered.drop(off) ++ ordered.take(off)
      rotated.foreach { case (n, fn) =>
        val dt = runOne(n, fn)
        if (!errors.contains(n)) warm(n) = math.min(warm.getOrElse(n, Double.MaxValue), dt)
        else warmErrors.getOrElseUpdate(n, errors(n))
      }
    }
    // a query that never completed a warm pass has no steady-state claim
    val warmFailed = warmErrors.keySet diff warm.keySet
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\x00-\\x1f]", " ") + "\""
    def r3(v: Double) = math.rint(v * 1000) / 1000 // ms precision keeps the line short
    def jmap(m: Seq[(String, Double)]) =
      m.map { case (k, v) => jstr(k) + ":" + r3(v) }.mkString("{", ",", "}")
    def jsmap(m: Iterable[(String, String)]) =
      m.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val qs = jmap(cold)
    val qsWarm = jmap(cold.map { case (n, c) => n -> warm.getOrElse(n, c) })
    val errJson = jsmap(coldErrors)
    val warmErrJson = jsmap(warmErrors)
    val total = r3(cold.map(_._2).sum)
    val steady = r3(cold.map { case (n, c) => warm.getOrElse(n, c) }.sum)
    // The harness that collects stdout keeps only a bounded TAIL of it —
    // round-3's single ~3.5 KB line (two full-precision per-query maps)
    // got its head cut off by that window and parsed as nothing. Keep the
    // contract line SHORT (one rounded cold map + scalars) and put the
    // full per-query detail (warm map, error maps) in a sidecar file.
    val detail =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""steady_state":$steady,"queries_warm":$qsWarm,""" +
        s""""failed":${coldErrors.size},"errors":$errJson,""" +
        s""""warm_failed":${warmFailed.size},"errors_warm":$warmErrJson,"sf":"$sfDir"}"""
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", "bench_detail.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(detailPath), detail + "\n")
    catch { case _: Throwable => () }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"steady_state":$steady,"failed":${coldErrors.size},"warm_failed":${warmFailed.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
