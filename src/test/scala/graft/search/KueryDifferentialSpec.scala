package graft.search

import scala.util.Random

import graft.SparkTestBase

/** Randomized differential for the Kuery compiler: random expressions
  * from the supported grammar (contains / .keyword exact / wildcard
  * LIKE / existence / numeric ranges / quoted phrases, composed with
  * parenthesized and/or/not) compiled to a Catalyst predicate must
  * keep exactly the rows an independent three-valued interpreter
  * keeps. SQL's NULL logic is part of the contract — `not txt: a`
  * DROPS a null-txt row (NOT(null) = null), unlike a boolean-complete
  * evaluator — so the interpreter works in Option[Boolean].
  */
class KueryDifferentialSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new Random(8152026L)

  // -------------------------------------------------------------- data
  private val txtPool = Seq("alpha beta", "beta", "gamma alpha",
    "delta gamma", "beta delta")
  private val numPool = Seq(1L, 5L, 10L, 42L)

  private type Row2 = (Option[String], Option[Long])
  private def randomRows(n: Int): Seq[Row2] = Seq.fill(n)((
    if (rnd.nextInt(5) == 0) None else Some(txtPool(rnd.nextInt(txtPool.size))),
    if (rnd.nextInt(5) == 0) None else Some(numPool(rnd.nextInt(numPool.size)))))

  // ------------------------------------------- expression AST + source
  private sealed trait E { def kql: String }
  private case class TxtContains(v: String) extends E {
    def kql = s"txt: $v"
  }
  private case class TxtPhrase(v: String) extends E {
    def kql = s"""txt: "$v""""
  }
  private case class KwExact(v: String) extends E {
    def kql = s"""txt.keyword: "$v""""
  }
  private case class Wild(p: String) extends E {
    def kql = s"txt: $p"
  }
  private case object Exists extends E { def kql = "txt: *" }
  private case class NumCmp(op: String, v: Long) extends E {
    def kql = if (op == ":") s"num: $v" else s"num $op $v"
  }
  private case class Not(e: E) extends E { def kql = s"not (${e.kql})" }
  private case class And(l: E, r: E) extends E {
    def kql = s"(${l.kql}) and (${r.kql})"
  }
  private case class Or(l: E, r: E) extends E {
    def kql = s"(${l.kql}) or (${r.kql})"
  }

  private def randomAtom(): E = rnd.nextInt(6) match {
    case 0 => TxtContains(Seq("alpha", "beta", "gam", "zzz")(rnd.nextInt(4)))
    case 1 => TxtPhrase(txtPool(rnd.nextInt(txtPool.size)))
    case 2 => KwExact(txtPool(rnd.nextInt(txtPool.size)))
    case 3 => Wild(Seq("*eta*", "alpha*", "*gamma", "*elta*")(rnd.nextInt(4)))
    case 4 => Exists
    case _ => NumCmp(Seq(":", "<", "<=", ">", ">=")(rnd.nextInt(5)),
      numPool(rnd.nextInt(numPool.size)))
  }

  private def randomExpr(depth: Int): E =
    if (depth == 0 || rnd.nextInt(3) == 0) randomAtom()
    else rnd.nextInt(3) match {
      case 0 => Not(randomExpr(depth - 1))
      case 1 => And(randomExpr(depth - 1), randomExpr(depth - 1))
      case _ => Or(randomExpr(depth - 1), randomExpr(depth - 1))
    }

  // --------------------------------- independent three-valued evaluator
  private def wildMatch(p: String, s: String): Boolean =
    s.matches(p.split("\\*", -1).map(java.util.regex.Pattern.quote)
      .mkString(".*"))

  private def eval(e: E, row: Row2): Option[Boolean] = e match {
    case TxtContains(v) => row._1.map(_.contains(v))
    case TxtPhrase(v) => row._1.map(_.contains(v))
    case KwExact(v) => row._1.map(_ == v)
    case Wild(p) => row._1.map(wildMatch(p, _))
    case Exists => Some(row._1.isDefined) // isNotNull is never null
    case NumCmp(op, v) => row._2.map { n =>
      op match {
        case ":" => n == v
        case "<" => n < v
        case "<=" => n <= v
        case ">" => n > v
        case ">=" => n >= v
      }
    }
    case Not(x) => eval(x, row).map(!_)
    case And(l, r) => (eval(l, row), eval(r, row)) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true)) => Some(true)
      case _ => None
    }
    case Or(l, r) => (eval(l, row), eval(r, row)) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false)) => Some(false)
      case _ => None
    }
  }

  test("400 random kuery expressions: compiled predicate == three-valued interpreter") {
    val rows = randomRows(60)
    val df = rows.toDF("txt", "num")
    (1 to 400).foreach { trial =>
      val e = randomExpr(3)
      val got = df.filter(Kuery.predicate(df, e.kql))
        .as[Row2].collect().groupBy(identity).view.mapValues(_.length).toMap
      val want = rows.filter(r => eval(e, r).contains(true))
        .groupBy(identity).view.mapValues(_.length).toMap
      assert(got == want, s"trial $trial diverged on: ${e.kql}")
    }
  }
}
