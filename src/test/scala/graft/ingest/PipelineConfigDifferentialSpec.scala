package graft.ingest

import scala.util.Random

import graft.SparkTestBase

/** Randomized differential for the Data Prepper routing semantics:
  * whole random configs (route conditions over nullable string/numeric
  * columns, sinks with random route subsets incl. unrouted catch-alls)
  * executed by [[PipelineConfig]]'s compiled Column predicates must
  * match an independent row-level interpreter of the declared
  * semantics — `==` is null-rejecting equality, `!=` matches differing
  * OR ABSENT keys, a sink ORs its routes, no routes means everything.
  * Same pattern as the SavedObjects/PanelSpec randomized differentials:
  * hand-picked cases pin the format, the differential pins the algebra.
  */
class PipelineConfigDifferentialSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new Random(20260815L)

  private val strPool = Seq("alpha", "beta", "gamma", "delta")
  private val numPool = Seq(0.0, 1.0, 2.5, -3.0)

  private type Row2 = (Option[String], Option[Double])

  private def randomRows(n: Int): Seq[Row2] = Seq.fill(n)((
    if (rnd.nextInt(5) == 0) None else Some(strPool(rnd.nextInt(strPool.size))),
    if (rnd.nextInt(5) == 0) None else Some(numPool(rnd.nextInt(numPool.size)))))

  /** The independent interpreter: one route condition over one row. */
  private def matches(r: PipelineConfig.Route, row: Row2): Boolean = {
    val cell: Option[Any] = r.field match {
      case "k" => row._1
      case "v" => row._2
    }
    val want: Any = r.value.fold(identity, identity)
    r.op match {
      case "==" => cell.contains(want)
      case "!=" => !cell.contains(want) // absent key matches, like Data Prepper
    }
  }

  test("300 random configs: compiled routing == independent row interpreter") {
    (1 to 300).foreach { trial =>
      val nRoutes = 1 + rnd.nextInt(4)
      val routes = (0 until nRoutes).map { i =>
        val onK = rnd.nextBoolean()
        val op = if (rnd.nextBoolean()) "==" else "!="
        if (onK)
          PipelineConfig.parseCondition(s"r$i",
            s"""/k $op "${strPool(rnd.nextInt(strPool.size))}"""")
        else
          PipelineConfig.parseCondition(s"r$i",
            s"/v $op ${numPool(rnd.nextInt(numPool.size))}")
      }
      val nSinks = 1 + rnd.nextInt(3)
      val sinks = (0 until nSinks).map { j =>
        val subset = routes.map(_.name).filter(_ => rnd.nextBoolean())
        PipelineConfig.Sink(s"sink$j", subset) // empty subset = catch-all
      }
      val cfg = PipelineConfig.Config(None, routes, sinks)

      val rows = randomRows(1 + rnd.nextInt(30))
      val df = rows.toDF("k", "v")

      val got = cfg.routedFrames(df).map { case (idx, f) =>
        idx -> f.as[Row2].collect().groupBy(identity).view.mapValues(_.length).toMap
      }.toMap

      val routeByName = routes.map(r => r.name -> r).toMap
      val want = sinks.map { s =>
        val kept =
          if (s.routes.isEmpty) rows
          else rows.filter(row => s.routes.exists(n => matches(routeByName(n), row)))
        s.index -> kept.groupBy(identity).view.mapValues(_.length).toMap
      }.toMap

      assert(got == want,
        s"trial $trial diverged\nroutes=$routes\nsinks=$sinks\nrows=$rows")
    }
  }
}
