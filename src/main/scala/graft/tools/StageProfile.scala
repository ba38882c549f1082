package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Where does a query's wall time actually go? Per-query breakdown of
  * Spark jobs, stages, tasks, task time, shuffle bytes and spill —
  * the guide-§1 "empirical" loop without the (disabled) UI. Each query
  * runs twice: the second pass is the one to read (first pass pays
  * codegen/JIT).
  *
  *   runMain graft.tools.StageProfile <sfDir> <q>...
  */
object StageProfile {
  final case class StageRow(jobId: Int, stageId: Int, name: String,
      tasks: Int, taskTimeMs: Long, shufWriteB: Long, shufReadB: Long,
      spillB: Long, outRows: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_PLANDUMP=<dir>: write every action's EXECUTED plan
    // (post-AQE, ReusedExchange visible) to <dir>/<query>_planN.txt —
    // eager/iterative operators' real plans never show in the
    // top-level explain, so this is the auditable evidence for
    // internal plan-shape claims.
    val planDump = sys.env.get("SPARK_GRAFT_PLANDUMP")
    planDump.foreach(d => java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d)))
    val planBuf = new ConcurrentLinkedQueue[String]()
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String, qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        if (planDump.isDefined) { planBuf.add(s"== action: $funcName (${durationNs / 1000000} ms) ==\n" + qe.executedPlan.toString); () }
      override def onFailure(funcName: String, qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    })

    val stages = new ConcurrentLinkedQueue[StageRow]()
    var jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages.add(StageRow(0, si.stageId, si.name.takeWhile(_ != '\n').take(60),
          si.numTasks, m.executorRunTime,
          m.shuffleWriteMetrics.bytesWritten, m.shuffleReadMetrics.totalBytesRead,
          m.memoryBytesSpilled, m.outputMetrics.recordsWritten))
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { n =>
      for (pass <- 1 to 2) {
        stages.clear(); jobs.set(0); planBuf.clear()
        val t0 = System.nanoTime()
        val cnt = graft.SparkEntry.queries(n)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        // drain the async listener bus so late stage events are counted
        graft.operators.GuardMetrics.drainListenerBus(spark, 10000)
        import scala.jdk.CollectionConverters._
        val rows = stages.asScala.toSeq
        val taskTime = rows.map(_.taskTimeMs).sum / 1e3
        val nTasks = rows.map(_.tasks).sum
        val shufW = rows.map(_.shufWriteB).sum / 1e6
        val spill = rows.map(_.spillB).sum / 1e6
        println(f"[stageprofile] $n pass$pass: wall=$wall%.2f s jobs=${jobs.get} " +
          f"stages=${rows.size} tasks=$nTasks tasktime=$taskTime%.1f s " +
          f"shufW=$shufW%.1f MB spill=$spill%.1f MB rows=$cnt")
        if (pass == 2) {
          planDump.foreach { d =>
            import scala.jdk.CollectionConverters._
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(d, s"${n}_actions.txt"),
              planBuf.asScala.mkString("\n\n"))
          }
          rows.sortBy(-_.taskTimeMs).take(12).foreach { r =>
            println(f"[stageprofile]   stage ${r.stageId}%5d tasks=${r.tasks}%4d " +
              f"time=${r.taskTimeMs / 1e3}%6.2f s shufW=${r.shufWriteB / 1e6}%8.2f MB " +
              f"shufR=${r.shufReadB / 1e6}%8.2f MB ${r.name}")
          }
        }
      }
    }
    spark.stop()
  }
}
