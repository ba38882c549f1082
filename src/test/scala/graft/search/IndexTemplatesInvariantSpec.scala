package graft.search

import java.nio.file.{Files, Paths}

import scala.util.Random

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.search.IndexTemplates._

/** Structural invariants of the template↔schema bridge, checked over
  * the REAL templates plus seeded random single-field mutations:
  *
  *  - self-consistency: a template's own derived [[IndexTemplate.schema]]
  *    conforms to the template with every finding Ok and every declared
  *    path covered — the two directions of the bridge agree;
  *  - locality: mutating exactly one leaf of a conformant frame
  *    (incompatible type / dropped / added) flags exactly that path
  *    with exactly that status and leaves every other finding Ok.
  */
class IndexTemplatesInvariantSpec extends AnyFunSuite {

  private val tplDir = "/root/reference/deployment/infra/resources/" +
    "lambda/opensearch-bootstrap/resources/templates"
  private val names =
    Seq("spark-logs", "spark-task-metrics", "spark-stage-agg-metrics")

  private def load(name: String): IndexTemplate = {
    assume(Files.exists(Paths.get(s"$tplDir/$name.json")),
      "reference templates not present")
    IndexTemplates.parse(
      new String(Files.readAllBytes(Paths.get(s"$tplDir/$name.json"))))
  }

  test("self-consistency: each real template's derived schema conforms all-Ok and covers every declared path") {
    names.foreach { n =>
      val t = load(n)
      val report = conformance(t.schema, t)
      val notOk = report.filterNot(_.status == Ok)
      assert(notOk.isEmpty, s"$n: ${notOk.take(5)}")
      assert(report.map(_.path).toSet == t.fields.map(_.path).toSet,
        s"$n: report paths != declared paths")
    }
  }

  /** Replace one dotted-path leaf's type inside a (possibly nested)
    * struct; None drops the leaf instead.
    */
  private def rewrite(st: StructType, path: List[String],
      to: Option[DataType]): StructType = path match {
    case name :: Nil => StructType(st.fields.flatMap { f =>
      if (f.name != name) Some(f)
      else to.map(dt => f.copy(dataType = dt))
    })
    case name :: rest => StructType(st.fields.map { f =>
      if (f.name != name) f
      else f.copy(dataType =
        rewrite(f.dataType.asInstanceOf[StructType], rest, to))
    })
    case Nil => st
  }

  test("locality: a single-leaf mutation flags exactly that path") {
    val rnd = new Random(42L)
    names.foreach { n =>
      val t = load(n)
      val base = t.schema
      // struct-typed leaves of the derived schema, as dotted paths —
      // unmapped (enabled:false) leaves are compatible with anything
      // by design, so they cannot be TypeMismatch victims
      val leaves = t.fields.filter(_.esType != "unmapped").map(_.path)
      (1 to 20).foreach { _ =>
        val victim = leaves(rnd.nextInt(leaves.size))
        val esType = t.fields.find(_.path == victim).get.esType
        // pick a type guaranteed incompatible with the victim's mapping
        val bad = esType match {
          case "boolean" => StringType
          case _ => BooleanType
        }
        val parts = victim.split('.').toList

        val mismatched = conformance(rewrite(base, parts, Some(bad)), t)
        assert(mismatched.filter(_.status == TypeMismatch).map(_.path) ==
          Seq(victim), s"$n/$victim: expected one TypeMismatch")
        assert(mismatched.count(_.status != Ok) == 1)

        val dropped = conformance(rewrite(base, parts, None), t)
        // dropping an intermediate object's LAST leaf also drops the
        // parent from the frame — missing set is exactly the declared
        // paths no longer present
        assert(dropped.filter(_.status == MissingInFrame).map(_.path) ==
          Seq(victim), s"$n/$victim: expected one MissingInFrame")
        assert(dropped.count(_.status != Ok) == 1)
      }

      val added = conformance(
        StructType(base.fields :+ StructField("graft_extra", LongType)), t)
      assert(added.filter(_.status == Undeclared).map(_.path) ==
        Seq("graft_extra"))
      assert(added.count(_.status != Ok) == 1)
    }
  }
}
